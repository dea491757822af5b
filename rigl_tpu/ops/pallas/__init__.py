"""Pallas TPU kernels."""

from rigl_tpu.ops.pallas.block_sparse import block_sparse_matmul
from rigl_tpu.ops.pallas.block_sparse_v2 import (
    block_sparse_matmul_gather,
    pack_block_indices,
)
from rigl_tpu.ops.pallas.block_sparse_v3 import (
    block_sparse_matmul_v3,
    pallas_dense_matmul,
)
