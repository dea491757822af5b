"""Pallas TPU kernels."""

from rigl_tpu.ops.pallas.block_sparse import block_sparse_matmul
