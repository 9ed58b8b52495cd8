# Reference-scale synthetic convergence run (round-2 evidence): 512 training
# shapes at the reference's batch 128 for 4000 epochs — the reference's
# stage-2 epoch budget (configs/train_chair_stage2.py max_epoch, README.md:56)
# — with checkpoints every 400 epochs so the epochs-vs-1-NNA curve can be
# evaluated per checkpoint, and a 400-shape val split so the best checkpoint
# can be scored with the FULL reference protocol (400 gen vs 400 ref).
#
#   python tools/run_net.py --config-file configs/bench_train_xl_tpu.py --task train
#   python tools/eval_ckpt_curve.py --config-file configs/bench_train_xl_tpu.py --gen_num 64
#   python tools/run_net.py --config-file configs/bench_train_xl_tpu.py \
#       --task val_gen --gen_num 400 --resume-path <best ckpt>

_base_ = ["./bench_train_tpu.py"]

name = "bench_train_xl_tpu"
work_dir = "work_dirs/bench_train_xl_tpu"

dataset = dict(
    train=dict(size=512, batch_size=128),
    val=dict(size=400, batch_size=32),
)

max_epoch = 4000
checkpoint_interval = 400
log_interval = 200
cimle_cache_interval = 60
