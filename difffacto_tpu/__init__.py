"""DiffFacto-TPU: a TPU-native JAX/Flax/Pallas re-implementation of
DiffFacto (controllable part-based 3D point-cloud generation, ICCV 2023).

Brand-new architecture targeting TPU: one jitted program per phase, the full
reverse diffusion chain as a ``lax.scan``, Pallas/XLA kernels in place of the
reference's CUDA extensions, and ``jax.sharding`` data parallelism in place of
DDP/NCCL.
"""

__version__ = "0.1.0"
