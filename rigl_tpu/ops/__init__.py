"""TPU compute kernels: block-granular masks and Pallas kernels."""

from rigl_tpu.ops.block_mask import (
    block_shape_for,
    blockwise_drop_grow,
    expand_from_blocks,
    pool_to_blocks,
    random_block_mask,
)
