from .mesh import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    pmean_metrics,
    replicate,
    replicated,
    shard_batch,
)
from .optim import build_optimizer_from_cfg, make_optimizer
from .train import TrainState, init_train_state, make_train_step, parse_losses
