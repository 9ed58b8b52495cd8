from .schedule import (
    DiffusionSchedule,
    betas_for_alpha_bar,
    ddim_steps,
    ddim_xt_dir_coeff,
    extract,
    make_beta_schedule,
    make_schedule,
)
from .points import (
    assign_anchor,
    ball_query,
    fps,
    furthest_point_sample,
    gather_points,
    gather_points_nd,
    group_points,
    square_distance,
    three_interpolate,
    three_nn,
)
from .chamfer import (
    chamfer_l1,
    chamfer_l2,
    chamfer_split,
    chamfer_split_tiled,
    pairwise_chamfer,
)
from .emd import emd, emd_cost
