# Mid-scale TPU benchmark of the FULL generation protocol on synthetic data:
# the real gen_chair model (via _base_) at 2048 points, but a procedural
# 4-part dataset so the end-to-end `--task val_gen` pipeline (flow prior ->
# CIMLE aligner -> T=100 reverse diffusion -> FPS -> bbox-normalize ->
# MMD/COV/1-NNA over CD+EMD) runs without ShapeNet on disk.
#
#   python tools/run_net.py --config-file configs/bench_gen_tpu.py \
#       --task val_gen --gen_num 64
#
# Reference protocol: tools/run_net.py:59-63, runner/runner.py:399-468.

_base_ = ["./_base_/anchordiff.py"]

name = "bench_gen_tpu"
work_dir = "work_dirs/bench_gen_tpu"

model = dict(cimle_sample_num=1, ret_traj=False)

dataset = dict(
    _cover_=True,
    train=dict(
        type="SyntheticPart", batch_size=32, size=64, npoints=2048,
        split="train", eval_mode="gen",
    ),
    val=dict(
        type="SyntheticPart", batch_size=32, size=64, npoints=2048,
        split="test", shuffle=False, eval_mode="gen",
    ),
)

optimizer = dict(type="Adam", lr=2e-3, weight_decay=0.0)
scheduler = dict(type="LinearLR", start_lr=2e-3, end_lr=1e-4, start_epoch=4000, end_epoch=8000)
logger = dict(type="RunLogger")

save_num_batch = 1
max_epoch = 1
eval_interval = None
checkpoint_interval = None
log_interval = 10
max_norm = 10
train_aligner = False
resume_path = None
