# Car generation (reference configs/gen_car.py): 8192 points, noise_scale 50,
# no trajectory dumps, plain 'gen' eval.
_base_ = ["_base_/anchordiff.py"]

model = dict(
    encoder=dict(part_aligner=dict(noise_scale=50)),
    npoints=8192,
    ret_traj=False,
)

dataset = dict(
    train=dict(class_choice="Car", npoints=8192, clip=True),
    val=dict(class_choice="Car", npoints=8192, eval_mode="gen", clip=True),
)

resume_path = "pretrained/car.pth"
