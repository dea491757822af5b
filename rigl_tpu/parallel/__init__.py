"""Device mesh + sharding utilities (jax.sharding over ICI)."""

from rigl_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    replicated,
    shard_batch,
)
