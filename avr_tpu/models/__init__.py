from avr_tpu.models.code import PositionalEncoding  # noqa: F401
from avr_tpu.models.mlp import ResnetBlockFC, ResnetFC  # noqa: F401
from avr_tpu.models.resnet import ResNetTrunk  # noqa: F401
from avr_tpu.models.encoder import SpatialEncoder, ImageEncoder, ConvEncoder  # noqa: F401
from avr_tpu.models.pixelnerf import (  # noqa: F401
    Conditioning,
    PixelNeRFNet,
    ModelConfig,
    make_model,
)
