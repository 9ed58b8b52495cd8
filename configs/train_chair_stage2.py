# Stage 2: train the CIMLE part aligner on top of the stage-1 model
# (reference configs/train_chair_stage2.py): noise_scale 50, aligner-only
# param group, resumes the stage-1 checkpoint with model_only.
_base_ = ["_base_/anchordiff.py"]

model = dict(
    encoder=dict(part_aligner=dict(noise_scale=50)),
    cimle_sample_num=10,
    ret_interval=1,
)

dataset = dict(
    train=dict(eval_mode="gen"),
    val=dict(batch_size=32, eval_mode="gen"),
)

save_num_batch = 1000
model_only = True
train_aligner = True
resume_path = "work_dirs/train_chair_stage1/checkpoints/ckpt_8000"
