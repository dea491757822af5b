"""Pallas TPU kernels — the block-sparse engine and its evolution chain.

PRODUCT kernels (load-bearing in model/training paths):

- `block_sparse_packed.py` — THE packed engine: weights/grads/optimizer
  slots stored as (n_active, bk, bn) blocks, O(density) memory;
  prefetched-entry-list matmul grid (panel/slice x-feed variants,
  dummy/actives-only row modes), packed dw (per-block + column-panel),
  repack permutation for drop/grow.  Used by every Packed* layer/model
  and the packed trainers.
- `block_sparse_conv.py` — spatial-conv kernels for the block-mask dense
  path and the 'tap' engine behind PackedConv (shift-and-matmul with
  per-tap block skipping).
- `block_sparse_v4.py` — block-skipping matmul on DENSE-storage masked
  layers (the premask path in transforms/sparse_training.py and
  ops/block_mask.py routing): dense (K,N) weights, inactive blocks'
  DMA/MXU work skipped via the mask-derived entry list.
- `block_sparse_v6.py` — v4 with fused bias/activation epilogues; the
  routing table (scripts/bench_layer_routing.py) picks v4/v6/dense per
  layer shape.

HISTORY (superseded but kept runnable — each was the measured stepping
stone to the next, PERF.md rounds 1-2; tests pin their semantics so the
chain stays an executable record rather than dead code):

- `block_sparse.py` — v1: dense-grid matmul with in-kernel mask test.
- `block_sparse_v2.py` — gather-based entry list, host-packed indices.
- `block_sparse_v3.py` — scalar-prefetch entry list + the plain pallas
  dense matmul baseline.

New work goes in `block_sparse_packed.py` (packed storage) or v6 (dense
storage); the v1-v3 files are frozen.
"""

from rigl_tpu.ops.pallas.block_sparse import block_sparse_matmul
from rigl_tpu.ops.pallas.block_sparse_v2 import (
    block_sparse_matmul_gather,
    pack_block_indices,
)
from rigl_tpu.ops.pallas.block_sparse_v3 import (
    block_sparse_matmul_v3,
    pallas_dense_matmul,
)
