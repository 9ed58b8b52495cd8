# Reference-scale synthetic convergence, STAGE 2 (round-2 evidence): the
# reference's stage-2 protocol (configs/train_chair_stage2.py) — resume the
# stage-1 model (model_only), train ONLY the CIMLE part aligner
# (train_aligner=True param group), noise_scale 50, CIMLE noise cache.
# 1000 epochs on the same 512-shape split; checkpoints every 100 epochs so
# the epochs-vs-1-NNA curve can be evaluated per checkpoint:
#
#   python tools/run_net.py --config-file configs/bench_train_xl_stage2.py --task train
#   python tools/eval_ckpt_curve.py --config-file configs/bench_train_xl_stage2.py --gen_num 64
#   python tools/run_net.py --config-file configs/bench_train_xl_stage2.py \
#       --task val_gen --gen_num 400 --resume-path <best ckpt>

_base_ = ["./bench_train_tpu.py"]

name = "bench_train_xl_stage2"
work_dir = "work_dirs/bench_train_xl_stage2"

model = dict(
    encoder=dict(part_aligner=dict(noise_scale=50)),
    # Reference default (anchor_gen.py:44): 10 CIMLE hypotheses, cache keeps
    # the best-fit one. A first run with cimle_sample_num=1 (inherited from
    # the gen config) never converged: with no best-of-k selection the
    # aligner chases arbitrary noise_scale=50 draws (fit_loss oscillated
    # 150-320 for 350 epochs, grad norms ~1e11).
    cimle_sample_num=10,
)

dataset = dict(
    train=dict(size=512, batch_size=128),
    val=dict(size=400, batch_size=32),
)

model_only = True
train_aligner = True
# ckpt_1600, not ckpt_2000: stage 1 spiked at ~ep 1880 and its last 120
# epochs are degraded (see stage-1 config note); 1600 is the best healthy
# checkpoint (mse 0.765, grad_norm 0.06).
resume_path = "work_dirs/bench_train_xl_stage1/checkpoints/ckpt_1600"

max_epoch = 1000
checkpoint_interval = 100
log_interval = 200
cimle_cache_interval = 60

skip_grad_norm = 1e4
