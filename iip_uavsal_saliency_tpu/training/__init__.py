from .losses import (
    EPS,
    loss_fu,
    loss_fu_dy,
    loss_kl,
    loss_ml,
    metric_cc,
    metric_kl,
    metric_nss,
    metric_sim,
)
from .optim import make_optimizer, make_frozen_mask
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint


def __getattr__(name):
    # lazy: trainer modules import parallel.steps, which imports
    # training.losses — eager imports here would be circular
    if name in ("TrainConfig", "Trainer"):
        from . import trainer

        return getattr(trainer, name)
    if name in ("ImageTrainConfig", "train_salicon"):
        from . import image_trainer

        return getattr(image_trainer, name)
    raise AttributeError(name)
