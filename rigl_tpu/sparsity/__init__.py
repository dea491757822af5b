"""Sparsity core: distributions, masks, schedules, and the drop/grow kernel."""

from rigl_tpu.sparsity.distributions import (
    DEFAULT_ERK_SCALE,
    get_n_zeros,
    get_sparsities,
    sparsities_erdos_renyi,
    sparsities_str,
    sparsities_uniform,
    total_density,
)
from rigl_tpu.sparsity.layer_sparsity import (
    SparsityMap,
    achieved_block_sparsity,
    make_sparsity_map,
    resolve_sparsity,
    spec_for_model,
)
from rigl_tpu.sparsity.masks import (
    apply_masks,
    calculate_sparsity,
    default_mask_rule,
    make_mask_dict,
    mask_grads,
    mask_shapes,
    per_layer_sparsity,
    random_mask,
    random_mask_numpy,
    select_masked,
    update_masked,
)
from rigl_tpu.sparsity.schedules import (
    UpdateSchedule,
    constant_schedule,
    cosine_schedule,
    extract_number,
    lr_schedule,
)
from rigl_tpu.sparsity.update import (
    DropGrowResult,
    drop_grow_update,
    grow_init_tensor,
    prune_to_sparsity,
    topk_mask_from_scores,
)
