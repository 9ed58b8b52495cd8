# Long convergence run on synthetic data (round-2 evidence): 1000 epochs of
# the real gen_chair-size model, checkpoint every 100 epochs so the
# epochs-vs-1-NNA curve can be evaluated per checkpoint afterwards.
#
#   python tools/run_net.py --config-file configs/bench_train_long_tpu.py --task train
#   # then for each work_dirs/bench_train_long_tpu/checkpoints/ckpt_N.msgpack:
#   python tools/run_net.py --config-file configs/bench_train_long_tpu.py \
#       --task val_gen --gen_num 64 --resume-path <ckpt>

_base_ = ["./bench_train_tpu.py"]

name = "bench_train_long_tpu"
work_dir = "work_dirs/bench_train_long_tpu"

max_epoch = 1000
checkpoint_interval = 100
log_interval = 120
