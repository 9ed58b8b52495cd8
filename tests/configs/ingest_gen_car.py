# Full gen_car model at a CPU-runnable point count, used by the checkpoint-
# ingestion rehearsal (tests/test_full_ingest.py). Parameter shapes match
# configs/gen_car.py (identical to chair); the car-specific deltas exercised
# here are noise_scale=50 in the aligner (reference configs/gen_car.py:90)
# and the converter CLI running against a second category config.
_base_ = ["../../configs/gen_car.py"]

name = "ingest_gen_car"
work_dir = "work_dirs/ingest_gen_car"

model = dict(npoints=64, ret_traj=False)
resume_path = None
