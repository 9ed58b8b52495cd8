from .aligner import PartAligner, PartAlignerTransformer
from .anchor_diff import (
    AnchorDiffAE,
    build_diffusion,
    decode,
    reconstruct,
    sample_generation,
    select_best_noise,
)
from .denoiser import PointwiseNet, TransformerNet
from .diffusion import AnchoredDiffusion
from .flow import CouplingLayer, PerPartFlow, SequentialFlow
from .part_encoder import PartEncoder, PartEncoderForTransformerDecoder, gather_per_point
from .pointnet import PointNet, PointNetV2, PointNetVAEBase
from .samplers import Uniform
