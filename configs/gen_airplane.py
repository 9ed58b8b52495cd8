# Airplane generation (reference configs/gen_airplane.py): noise_scale 50,
# Adamax optimizer, plain 'gen' eval, Airplane category.
_base_ = ["_base_/anchordiff.py"]

model = dict(
    encoder=dict(part_aligner=dict(noise_scale=50)),
)

dataset = dict(
    train=dict(class_choice="Airplane"),
    val=dict(class_choice="Airplane", eval_mode="gen"),
)

optimizer = dict(type="Adamax", lr=0.002, weight_decay=0.0)
log_interval = 150
resume_path = "pretrained/airplane.pth"
