# Chair generation with pretrained weights (reference configs/gen_chair.py).
_base_ = ["_base_/anchordiff.py"]
