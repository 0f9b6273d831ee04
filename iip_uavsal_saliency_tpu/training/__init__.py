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
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .trainer import TrainConfig, Trainer
from .image_trainer import ImageTrainConfig, train_salicon
