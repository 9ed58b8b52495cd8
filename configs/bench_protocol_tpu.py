# Full 400-shape generation protocol at reference scale on synthetic data:
# 400 generated samples vs 400 reference shapes, 2048 points, T=100 —
# exercising the complete val_gen path (flow prior -> CIMLE aligner ->
# reverse diffusion -> FPS -> bbox-normalize -> MMD/COV/1-NNA over CD+EMD)
# with the same S*R pair counts as the reference protocol
# (reference tools/run_net.py:59-63, runner/runner.py:399-468).
#
#   python tools/run_net.py --config-file configs/bench_protocol_tpu.py \
#       --task val_gen --gen_num 400

_base_ = ["./bench_train_long_tpu.py"]

name = "bench_protocol_tpu"
work_dir = "work_dirs/bench_protocol_tpu"

dataset = dict(
    val=dict(size=400),
)

# evaluate the long-trained synthetic model at its best combined 1-NNA
# (epoch 800: 0.664 CD / 0.742 EMD on the 64-shape curve eval)
resume_path = "work_dirs/bench_train_long_tpu/checkpoints/ckpt_800.msgpack"
