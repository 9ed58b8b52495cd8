from .aligner import PartAligner, PartAlignerTransformer
from .anchor_diff import (
    AnchorDiffAE,
    build_diffusion,
    decode,
    reconstruct,
    sample_generation,
    select_best_noise,
)
from .completion import PCN, CoarsePCN, DiffuCompletion, PCNEncoder
from .decomposers import ComponentMixer, ComponentMixerV2, PartCodeTransformer
from .editors import (
    AnchorDiffGenSuperSegments,
    LatentDiffEdit,
    ParameterTrainer,
    PartLatentEditor,
    PartglotClassifier,
    PartglotFinetune,
)
from .denoiser import LDMNet, PointwiseNet, PointwiseNet2, TransformerNet, UNet
from .diffusion import AnchoredDiffusion
from .diffusion_extra import LDM, LatentDiffusionDrift, PointDiffusion
from .gan import (
    Discriminator,
    DiscriminatorcGan,
    Generator,
    dis_loss,
    gen_loss,
    gradient_penalty,
)
from .language import (
    LSTM,
    LatentLanguageFuser,
    MultiHeadCrossAttention,
    PartLanguageSelector,
    Vocabulary,
    ZeroMLP,
    clip_style_loss,
    tokenizing,
    triplet_loss,
)
from .orchestrators_extra import PDM, AnchorDiffGenPartglot, AnchoredGeneration
from .supseg_encoders import (
    MeanVarianceRegressor,
    PartglotSupSegsEncoderWithCBN,
    PCNPartEncoder,
    Pnet2Stage,
    SupSegsEncoder,
)
from .pointnet2 import PointNet2MSG, PointNet2SSG, PointnetFPModule, PointnetSAModule
from .segmentor import ConditionalBatchNorm1d, PointNetDenseCls
from .flow import CouplingLayer, PerPartFlow, SequentialFlow
from .part_encoder import PartEncoder, PartEncoderForTransformerDecoder, gather_per_point
from .part_encoder_variants import (
    PartAlignerCIMLE,
    PartEncoderCIMLE,
    PartEncoderForPartnet,
    PartEncoderForPartnetAndTransformerDecoder,
    PartEncoderForTransformerDecoderCIMLE,
    PartEncoderForTransformerDecoderKLLoss,
    PartEncoderForTransformerDecoderKLLossCIMLE,
    PartEncoderNoMixer,
    PartEncoderVAE,
    PartEncoderWithKLLoss,
    PartEncodercVAE,
    PartEncodercVAE2,
)
from .pointflow import CNF, ConcatSquashODE, PointFlow
from .pointnet import (
    PointNet,
    PointNetV2,
    PointNetV2VAE,
    PointNetV2Variant,
    PointNetV3,
    PointNetVAE,
    PointNetVAEBase,
)
from .samplers import Uniform
