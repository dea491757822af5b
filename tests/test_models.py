"""Model zoo shape/structure tests (parity contract: depth tables, masked
kernel discovery, dense-depthwise convention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.models import registry
from rigl_tpu.sparsity import masks as masks_lib


def _init_and_apply(model, shape, train=False):
  x = jnp.zeros(shape, jnp.float32)
  variables = model.init(jax.random.key(0), x, train=False)
  out = model.apply(variables, x, train=train,
                    mutable=['batch_stats'] if train else False,
                    rngs={'dropout': jax.random.key(1)} if train else None)
  logits = out[0] if isinstance(out, tuple) else out
  return variables, logits


def test_mnist_mlp():
  model = registry.create_model('mnist_mlp')
  variables, logits = _init_and_apply(model, (2, 28, 28, 1))
  assert logits.shape == (2, 10)
  shapes = masks_lib.mask_shapes(variables['params'])
  assert shapes == {
      'layer1/kernel': (784, 300),
      'layer2/kernel': (300, 100),
      'layer3/kernel': (100, 10),
  }


def test_budget_mlp_width_solver():
  from rigl_tpu.models.mlp import width_for_param_budget
  # depth=2 at the 300-100 budget: in 784, classes 10 -> width ~317.
  w = width_for_param_budget(266200, 2)
  params = 784 * w + w + (w * w + w) + w * 10 + 10
  assert abs(params - 266200) / 266200 < 0.05


def test_lenet5():
  model = registry.create_model('lenet5')
  _, logits = _init_and_apply(model, (2, 28, 28, 1))
  assert logits.shape == (2, 10)


def test_wide_resnet_depth_check():
  with pytest.raises(ValueError, match='Depth'):
    m = registry.create_model('wide_resnet', depth=23)
    _init_and_apply(m, (1, 32, 32, 3))


def test_wide_resnet_22_2():
  model = registry.create_model('wrn_22_2')
  variables, logits = _init_and_apply(model, (2, 32, 32, 3))
  assert logits.shape == (2, 10)
  shapes = masks_lib.mask_shapes(variables['params'])
  # 3 groups x 3 blocks x 2 convs + init conv + projections + logits.
  assert 'init_conv/conv/kernel' in shapes
  assert 'logits/kernel' in shapes
  # Channel widths scale by k=2.
  assert shapes['group1_block0/conv1/conv/kernel'] == (3, 3, 16, 32)
  assert shapes['group3_block0/conv1/conv/kernel'] == (3, 3, 64, 128)


@pytest.mark.parametrize('depth,n_params_m', [(18, 11.7), (50, 25.6)])
def test_resnet_param_counts(depth, n_params_m):
  model = registry.create_model('resnet', depth=depth, num_classes=1000)
  variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                         train=False)
  n = sum(x.size for x in jax.tree.leaves(variables['params']))
  assert n / 1e6 == pytest.approx(n_params_m, rel=0.02)


def test_resnet_invalid_depth():
  with pytest.raises(ValueError, match='resnet_depth'):
    m = registry.create_model('resnet', depth=42)
    _init_and_apply(m, (1, 32, 32, 3))


def test_resnet_first_last_map():
  model = registry.create_model('resnet50')
  m = model.first_last_layer_map(False, False)
  assert m == {'initial_conv/conv/kernel': 0.0, 'final_dense/kernel': 0.0}


def test_mobilenet_v1_dense_depthwise():
  model = registry.create_model('mobilenet_v1', num_classes=100)
  variables, logits = _init_and_apply(model, (1, 64, 64, 3))
  assert logits.shape == (1, 100)
  shapes = masks_lib.mask_shapes(variables['params'])
  dense_paths = model.dense_layer_paths()
  assert len(dense_paths) == 13
  # Depthwise kernels exist in params and would be masked by the default
  # rule — the trainer excludes them via dense_layer_paths.
  assert 'block0_depthwise/kernel' in shapes
  assert 'block0_depthwise/kernel' in dense_paths
  assert 'block0_pointwise/kernel' not in dense_paths


def test_mobilenet_v2():
  model = registry.create_model('mobilenet_v2', num_classes=10)
  _, logits = _init_and_apply(model, (1, 64, 64, 3))
  assert logits.shape == (1, 10)


def test_vgg16():
  model = registry.create_model('vgg_16', num_classes=10)
  _, logits = _init_and_apply(model, (1, 224, 224, 3))
  assert logits.shape == (1, 10)


def test_registry_unknown():
  with pytest.raises(ValueError, match='Unknown model'):
    registry.create_model('nope')
  assert 'resnet50' in registry.available_models()
