# Full gen_chair model at a CPU-runnable point count, used by the
# checkpoint-ingestion rehearsal (tests/test_full_ingest.py). Parameter
# shapes are identical to configs/gen_chair.py — only npoints differs.
_base_ = ["../../configs/gen_chair.py"]

name = "ingest_gen_chair"
work_dir = "work_dirs/ingest_gen_chair"

model = dict(npoints=64, ret_traj=False)
resume_path = None
