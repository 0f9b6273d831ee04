from .mesh import make_mesh, data_sharding, replicated, param_sharding_rules
from .steps import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    make_infer_step,
    make_baked_infer_step,
    train_state_shardings,
)
