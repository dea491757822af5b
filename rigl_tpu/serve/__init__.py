"""Serving: autoregressive KV-cache decoding for the transformer family.

Packed block-sparse storage is at its strongest here: a small-batch decode
step is weight-HBM-bound, so reading (1 - sparsity) of the bytes converts
directly to step time (PERF.md round-3 serving section).
"""

from rigl_tpu.serve.decode import (decode_twin, init_cache,  # noqa: F401
                                   make_generate_fn, generate)
