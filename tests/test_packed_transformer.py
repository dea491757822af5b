"""PackedTransformer: parity vs the equal-architecture dense twin and a
training smoke — the packed engine generalizes beyond MLPs."""

import flax.traverse_util as traverse
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from rigl_tpu.models.packed_transformer import (DenseTransformer,
                                                PackedTransformer)
from rigl_tpu.ops.pallas.block_sparse_packed import unpack_dense

CFG = dict(num_layers=2, d_model=64, d_ff=128, num_heads=4)
BLK = (16, 16)


def _dense_params_from_packed(variables):
  """Dense-twin params with PackedDense kernels unpacked (zeros at
  inactive blocks)."""
  packed = traverse.flatten_dict(variables['params'])
  packing = traverse.flatten_dict(variables['packing'])
  out = {}
  for path, v in packed.items():
    if path in packing:                       # a PackedDense kernel
      w = unpack_dense(v, packing[path], BLK)
      out[path[:-1] + ('d', 'kernel')] = w
    else:
      out[path] = v
  return traverse.unflatten_dict(out)


def test_packed_transformer_matches_dense_twin():
  model = PackedTransformer(sparsity=0.6, block=BLK, bm=16, **CFG)
  x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 64), jnp.float32)
  variables = model.init(jax.random.key(0), x)
  y = model.apply(variables, x)
  assert y.shape == (2, 8, 64)

  dense = DenseTransformer(**CFG)
  dv = {'params': _dense_params_from_packed(variables)}
  y_ref = dense.apply(dv, x)
  np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                             atol=2e-4, rtol=1e-4)


def test_packed_transformer_lm_trains():
  model = PackedTransformer(sparsity=0.5, block=BLK, bm=16, vocab_size=32,
                            **CFG)
  rs = np.random.RandomState(0)
  # Deterministic periodic token stream: next-token is learnable.
  tokens = jnp.asarray((np.arange(2 * 33) * 7) % 32, jnp.int32
                       ).reshape(2, 33)
  x, y = tokens[:, :-1], tokens[:, 1:]
  variables = model.init(jax.random.key(0), x)
  params, packing = variables['params'], variables['packing']
  tx = optax.adam(1e-3)
  opt = tx.init(params)

  def loss_fn(params):
    lg = model.apply({'params': params, 'packing': packing}, x)
    return jnp.mean(-jax.nn.log_softmax(lg)[
        jnp.arange(2)[:, None], jnp.arange(32)[None, :], y])

  @jax.jit
  def step(params, opt):
    loss, g = jax.value_and_grad(loss_fn)(params)
    up, opt = tx.update(g, opt, params)
    return optax.apply_updates(params, up), opt, loss

  losses = []
  for _ in range(30):
    params, opt, loss = step(params, opt)
    losses.append(float(loss))
  assert losses[-1] < losses[0] * 0.7, losses[::10]


@pytest.mark.slow
def test_packed_transformer_rigl_update():
  """RigL drop/grow on the transformer's packed kernels via the nested-tree
  helper: dense grads come from the dense twin, occupancy counts are
  preserved, momentum follows surviving blocks, and training continues."""
  from rigl_tpu.transforms.packed_training import flax_packed_rigl_update
  model = PackedTransformer(sparsity=0.5, block=BLK, bm=16, **CFG)
  x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 64), jnp.float32)
  variables = model.init(jax.random.key(0), x)
  params, packing = variables['params'], variables['packing']
  tx = optax.sgd(0.05, momentum=0.9)
  opt = tx.init(params)

  def loss_fn(params):
    out = model.apply({'params': params, 'packing': packing}, x)
    return jnp.mean(out.astype(jnp.float32) ** 2)

  for _ in range(3):            # build up momentum
    loss, g = jax.value_and_grad(loss_fn)(params)
    up, opt = tx.update(g, opt, params)
    params = optax.apply_updates(params, up)

  # Dense grads at every packed kernel via the dense twin.
  dense = DenseTransformer(**CFG)
  dv = _dense_params_from_packed({'params': params, 'packing': packing})

  def dense_loss(dv):
    return jnp.mean(dense.apply({'params': dv}, x
                                ).astype(jnp.float32) ** 2)

  gd = traverse.flatten_dict(jax.grad(dense_loss)(dv))
  flat_pk = traverse.flatten_dict(packing)
  dense_grads = {p[:-2] + ('kernel',): v for p, v in gd.items()
                 if p[:-2] + ('kernel',) in flat_pk}

  before = {p: int(v.shape[0])
            for p, v in traverse.flatten_dict(params).items()
            if p in flat_pk}
  out = flax_packed_rigl_update(params, packing, opt, tx, dense_grads,
                                0.3, BLK)
  after_p = traverse.flatten_dict(out.params)
  for p, n in before.items():
    assert after_p[p].shape[0] == n          # static count preserved
  assert any(np.asarray(g).sum() > 0
             for g in
             [np.asarray(out.occupancy[p]).sum() for p in out.occupancy])

  # Training continues on the new topology.
  packing2, params2, opt2 = out.packings, out.params, out.opt_state

  def loss2(params):
    o = model.apply({'params': params, 'packing': packing2}, x)
    return jnp.mean(o.astype(jnp.float32) ** 2)

  l0 = float(loss2(params2))
  for _ in range(5):
    loss, g = jax.value_and_grad(loss2)(params2)
    up, opt2 = tx.update(g, opt2, params2)
    params2 = optax.apply_updates(params2, up)
  assert float(loss2(params2)) < l0


def test_packed_transformer_param_memory_scales_with_density():
  model = PackedTransformer(sparsity=0.75, block=BLK, bm=16, **CFG)
  x = jnp.zeros((1, 4, 64), jnp.float32)
  variables = model.init(jax.random.key(0), x)
  packed = traverse.flatten_dict(variables['params'])
  packing = traverse.flatten_dict(variables['packing'])
  n_packed = sum(int(np.prod(v.shape)) for p, v in packed.items()
                 if p in packing)
  # Dense equivalents of the packed matmuls: qkv + out + fc1 + fc2 per layer.
  d, f = CFG['d_model'], CFG['d_ff']
  n_dense = CFG['num_layers'] * (d * 3 * d + d * d + d * f + f * d)
  assert n_packed < 0.3 * n_dense            # ~0.25 + floor rounding
