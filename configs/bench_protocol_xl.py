# Full 400-vs-400 generation protocol on the two-stage XL synthetic model
# (round-2 quality evidence at reference protocol scale,
# reference tools/run_net.py:59-63 + runner.py:399-468):
#
#   python tools/run_net.py --config-file configs/bench_protocol_xl.py \
#       --task val_gen --gen_num 400
#
# The checkpoint is the stage-2 curve's best region (epoch 700; see
# BASELINE.md "two-stage XL convergence curve" row).

_base_ = ["./bench_train_xl_stage2.py"]

name = "bench_protocol_xl"
work_dir = "work_dirs/bench_protocol_xl"

model_only = True
# best checkpoint by the 64-gen 1-NN-CD curve (tools/eval_ckpt_curve.py):
# r3/r4 runs bottomed at ckpt_700 (0.808); the r5 retrain (reference-faithful
# full-norm clip for the aligner group — inactive here, grad norms ~0.3 vs
# max_norm 10) bottomed at ckpt_500 (0.804).
resume_path = "work_dirs/bench_train_xl_stage2/checkpoints/ckpt_500"
