from .attention import BasicTransformerBlock, CrossAttention
from .layers import (
    ConvBNReLUStack,
    FeedForward,
    GEGLU,
    MLP,
    TorchBatchNorm,
    ZeroDense,
    timestep_embedding,
)
