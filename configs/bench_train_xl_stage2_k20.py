# Stage-2 variant: best-of-20 CIMLE hypotheses (reference default is 10,
# anchor_gen.py:44). Experiment (r5): best-of-1 never converges and best-of-10
# works (see bench_train_xl_stage2.py) — does doubling the hypothesis pool
# tighten the aligner fit further?
#
# MEASURED: NO. Full 1000-epoch run + 10-ckpt 64-gen curve (2026-08-20):
# best 1-NN-CD 0.8254 @ ep 900 (per-ckpt: 100:0.884 200:0.841 300:0.864
# 400:0.830 500:0.838 600:0.860 700:0.845 800:0.834 900:0.825 1000:0.830)
# vs the k=10 run's 0.8039 @ ep 500 — consistently WORSE across the curve.
# The reference's k=10 stands; don't retry larger pools.
_base_ = ["./bench_train_xl_stage2.py"]

name = "bench_train_xl_stage2_k20"
work_dir = "work_dirs/bench_train_xl_stage2_k20"

model = dict(cimle_sample_num=20)
