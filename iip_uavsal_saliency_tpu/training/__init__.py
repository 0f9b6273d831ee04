from .losses import (
    EPS,
    loss_fu,
    loss_kl,
    loss_ml,
    metric_cc,
    metric_kl,
    metric_nss,
    metric_sim,
)
from .optim import make_optimizer, make_frozen_mask
