from .axes import allmax_points, fold_points, point_axis, points_sharded, psum_points, sp_size
from .mesh import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    pmean_metrics,
    replicate,
    replicated,
    shard_batch,
)
from .optim import build_optimizer_from_cfg, make_optimizer

# .train imports the model layer, and model modules import .axes from this
# package — so the train symbols load lazily (PEP 562) to keep the package
# import acyclic.
_TRAIN_SYMBOLS = ("TrainState", "init_train_state", "make_train_step", "parse_losses")


def __getattr__(name):
    if name in _TRAIN_SYMBOLS:
        from . import train

        return getattr(train, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
