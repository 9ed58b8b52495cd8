# Convergence demo on synthetic data: train the real gen_chair-size model,
# then run the full generation protocol. Measured on 1x v5e (2026-08):
# 150 epochs in ~4 min take 1-NNA from 1.0 (untrained, trivially
# distinguishable) to 0.72 (CD) / 0.79 (EMD), COV-CD 0.47.
#
#   python tools/run_net.py --config-file configs/bench_train_tpu.py --task train
#   python tools/run_net.py --config-file configs/bench_train_tpu.py \
#       --task val_gen --gen_num 64
#
# Unlike the gen configs (which resume pretrained weights and set
# kl_weight=0), training from scratch needs the flow-prior loss on
# (kl_weight=5e-4, as in train_chair_stage1/2) or generation samples from an
# untrained prior and diverges.

_base_ = ["./bench_gen_tpu.py"]

name = "bench_train_tpu"
work_dir = "work_dirs/bench_train_tpu"

model = dict(encoder=dict(kl_weight=5e-4))
max_epoch = 150
log_interval = 60
cimle_cache_interval = 60
