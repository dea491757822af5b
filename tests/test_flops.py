"""FLOPs/size counting validated against the reference's published numbers
(README tables via the counting colabs; BASELINE.md):
  ResNet-50 dense: 8.2e9 inference FLOPs, 102.1MB
  ResNet-50 @80% ERK: 0.42x FLOPs, 23.68MB
  MobileNet-v1 dense: 1.14e9 FLOPs"""

import jax.numpy as jnp
import pytest

from rigl_tpu.models import registry
from rigl_tpu.utils import flops as flops_lib


@pytest.fixture(scope='module')
def resnet50_stats_dense():
  model = registry.create_model('resnet', depth=50, num_classes=1000)
  return flops_lib.count_model(model, (1, 224, 224, 3))


def test_resnet50_dense_flops(resnet50_stats_dense):
  # Published: 8.2e9 (README.md:33). Counting conventions differ by a few
  # percent (bias/BN handling); accept 10%.
  assert resnet50_stats_dense['dense_flops'] == pytest.approx(8.2e9,
                                                              rel=0.10)


def test_resnet50_dense_size(resnet50_stats_dense):
  # 25.5M params * 4B = 102.1MB.
  assert resnet50_stats_dense['total_params'] == pytest.approx(25.5e6,
                                                               rel=0.02)


def test_resnet50_erk80_flops_ratio():
  from rigl_tpu.sparsity import distributions, masks as masks_lib
  import jax
  model = registry.create_model('resnet', depth=50, num_classes=1000)
  variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                         train=False)
  shapes = masks_lib.mask_shapes(variables['params'])
  sparsities = distributions.get_sparsities(shapes, 'erdos_renyi_kernel',
                                            0.8, {})
  stats = flops_lib.count_model(model, (1, 224, 224, 3), sparsities)
  # Published 0.42x (README.md:65). ERK leaves early (high-FLOP) conv layers
  # denser, so the ratio is far above 0.2.
  assert stats['flops_ratio'] == pytest.approx(0.42, abs=0.05)
  # Published size 23.68MB (nnz * 4B + bitmask overhead).
  assert stats['param_bytes'] / 1e6 == pytest.approx(23.68, rel=0.05)


def test_mobilenet_v1_dense_flops():
  model = registry.create_model('mobilenet_v1', num_classes=1000)
  stats = flops_lib.count_model(model, (1, 224, 224, 3))
  # Published 1.14e9 (README.md:53).
  assert stats['dense_flops'] == pytest.approx(1.14e9, rel=0.10)


def test_get_stats_reference_api():
  model = registry.create_model('mnist_mlp')
  total_flops, param_bits, sparsity = flops_lib.get_stats(
      model, (1, 28, 28, 1), method='random', default_sparsity=0.9)
  dense_flops, dense_bits, s0 = flops_lib.get_stats(
      model, (1, 28, 28, 1), method='random', default_sparsity=0.0)
  assert sparsity == pytest.approx(0.9, abs=0.01)
  assert s0 == 0.0
  assert total_flops < dense_flops * 0.2
  assert param_bits < dense_bits
