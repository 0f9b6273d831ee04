from .fold import fold_batchnorm, looks_folded
from .initializers import INIT_REGISTRY, kaiming_normal, xavier_uniform
from .layers import ConvBNAct, DWBlock, ConvBNAct3D
from .resize import (
    resize_bilinear_align_corners,
    resize_bilinear_half_pixel,
    interp_matrix_align_corners,
    interp_matrix_half_pixel,
)
from .stats import param_count, param_bytes, model_size_report
