from .backbone import (
    MobileNetV2Pyramid,
    ResNetPyramid,
    VGGPyramid,
    build_backbone,
    FEATURE_INPLANES,
)
from .srfnet import SRFNet
from .stblock import SpConv, TeConvSub, STBlock, STBlockS2T, STBlockT2S, STBlockSS2T, STC3D, STC23D
from .recurrent import ConvTWA, ConvLSTM, ConvSimGRU, ConvTWADW
from .uavsal import (
    UAVSal,
    UAVSalSpConv,
    UAVSalTeConv,
    UAVSalSTBlocks,
    UAVSalSTBlocksType,
    UAVSalSTC3D,
    UAVSalSTC23D,
    UAVSalMP,
    UAVSalLSTM,
    build_model,
    init_variables,
    MODEL_ZOO,
)
from .srfnet_image import SRFNetImage, is_image_stage_variables, transfer_sfnet
from .adapters import ZooModelAdapter, build_adapted_model
