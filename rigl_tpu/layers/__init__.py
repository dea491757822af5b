"""Flax layers with explicit mask collections."""

from rigl_tpu.layers.masked import (
    MaskedConv,
    MaskedDense,
    dict_to_masks,
    masks_to_dict,
)
from rigl_tpu.layers.block_sparse_dense import BlockSparseDense
from rigl_tpu.layers.packed_dense import PackedDense
from rigl_tpu.layers.packed_conv import (DenseConvTwin, PackedConv,
                                         PackedConv1x1)
