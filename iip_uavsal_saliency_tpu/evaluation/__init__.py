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
from .scorer import (
    KEYS_ORDER as SCORER_KEYS_ORDER,
    build_shuffle_map,
    build_shuffle_map_img,
    collect_all_fixations,
    collect_all_fixations_img,
    evalscores_img,
    evalscores_img_sum,
    evalscores_vid,
    evalscores_vid_sum,
    mean_scores,
    mean_scores_img,
    sample_shufmap,
)
