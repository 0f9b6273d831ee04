from .metrics_np import (
    auc_borji_np,
    auc_judd_np,
    auc_shuffled_np,
    cc_np,
    kld_np,
    nss_np,
    sim_np,
    METRICS_NP,
)
from .metrics_jax import (
    eval_kl,
    eval_cc,
    eval_nss,
    eval_sim,
    eval_auc_judd,
    KEYS_ORDER,
)
