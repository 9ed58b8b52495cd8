# Stage 1: train encoder/flow/diffusion with ground-truth part params
# (reference configs/train_chair_stage1.py): no aligner, kl_weight 5e-4,
# use_gt_params, 8000 epochs, 'ae' eval.
_base_ = ["_base_/anchordiff.py"]

cimle = False
cimle_cache_interval = None

model = dict(
    encoder=dict(
        part_aligner=None,  # no aligner in stage 1
        kl_weight=5e-4,
        use_gt_params=True,
        min_kl_weight=1e-7,
        kl_weight_annealing_end_epoch=4000,
    ),
    cimle=False,
    ret_traj=False,
    ret_interval=10,
)

dataset = dict(
    train=dict(eval_mode="ae"),
    val=dict(batch_size=64, eval_mode="ae", save_only=False),
)

max_epoch = 8000
eval_interval = 500
save_num_batch = 1000
train_aligner = False
resume_path = None
