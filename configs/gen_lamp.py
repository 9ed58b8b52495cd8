# Lamp generation (reference configs/gen_lamp.py): noise_scale 10.
_base_ = ["_base_/anchordiff.py"]

model = dict(
    encoder=dict(part_aligner=dict(noise_scale=10)),
)

dataset = dict(
    train=dict(class_choice="Lamp"),
    val=dict(class_choice="Lamp", eval_mode="gen"),
)

resume_path = "pretrained/lamp.pth"
