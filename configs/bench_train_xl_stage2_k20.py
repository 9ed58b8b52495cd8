# Stage-2 variant: best-of-20 CIMLE hypotheses (reference default is 10,
# anchor_gen.py:44). Experiment (r5): best-of-1 never converges and best-of-10
# works (see bench_train_xl_stage2.py) — does doubling the hypothesis pool
# tighten the aligner fit further? Judged by the 64-gen checkpoint curve
# (tools/eval_ckpt_curve.py) against the k=10 run's best (ckpt_500, 0.804).
_base_ = ["./bench_train_xl_stage2.py"]

name = "bench_train_xl_stage2_k20"
work_dir = "work_dirs/bench_train_xl_stage2_k20"

model = dict(cimle_sample_num=20)
