"""Training loop for PACKED block-sparse MLPs: the product surface of the
packed engine (ops/pallas/block_sparse_packed.py + transforms/
packed_training.py).

Weights, gradients, and optimizer slots of every hidden matmul live as
`(n_active, bk, bn)` packed blocks — O(density) memory end to end — with
RigL drop/grow running ON packed storage (bit-exact vs the dense premask
path, tests/test_packed_training.py).  The classification head stays dense
(the reference's MNIST net also keeps its final layer dense,
mnist/mnist_train_eval.py:269-272).

Execution (`via`):
  * 'kernel'      — the pallas packed matmul (TPU; blocks need bn==128,
                    bk % 8 == 0);
  * 'dense_view'  — differentiable unpack + XLA matmul: identical
                    semantics/storage, runs anywhere (kernel float parity
                    is covered in tests);
  * 'auto'        — kernel on TPU when the block is TPU-tiled, else
                    dense_view.

Used by drivers/packed_mlp.py and scripts/digits_packed.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rigl_tpu.layers.packed_dense import random_occupancy
from rigl_tpu.ops.block_mask import pool_to_blocks
from rigl_tpu.ops.pallas.block_sparse_packed import (make_packing,
                                                     packed_matmul,
                                                     unpack_dense)
from rigl_tpu.sparsity.distributions import get_n_zeros
from rigl_tpu.sparsity.schedules import UpdateSchedule
from rigl_tpu.transforms import packed_training as pt


@dataclasses.dataclass
class PackedMLPConfig:
  in_features: int = 784
  widths: Tuple[int, ...] = (512, 256)
  num_classes: int = 10
  sparsity: float = 0.9
  block: Tuple[int, int] = (16, 16)
  via: str = 'auto'                     # kernel | dense_view | auto
  bm: int = 128
  learning_rate: float = 0.05
  momentum: float = 0.9
  train_steps: int = 2000
  batch_size: int = 100
  maskupdate_begin_step: int = 0
  maskupdate_end_step: int = 1500
  maskupdate_frequency: int = 100
  drop_fraction: float = 0.3
  drop_fraction_anneal: str = 'cosine'
  seed: int = 0

  def layer_names(self) -> List[str]:
    return [f'l{i + 1}' for i in range(len(self.widths))]

  def layer_dims(self) -> Dict[str, Tuple[int, int]]:
    dims, prev = {}, self.in_features
    for name, w in zip(self.layer_names(), self.widths):
      dims[name] = (prev, w)
      prev = w
    return dims

  def resolve_via(self) -> str:
    if self.via != 'auto':
      return self.via
    bk, bn = self.block
    tpu_tiled = bn == 128 and bk % 8 == 0
    return 'kernel' if (jax.default_backend() != 'cpu' and tpu_tiled) \
        else 'dense_view'


class PackedMLPTrainer:
  """Packed sparse-MLP training: init / step / update / eval / ckpt."""

  def __init__(self, cfg: PackedMLPConfig):
    for name, (kin, kout) in cfg.layer_dims().items():
      if kin % cfg.block[0] or kout % cfg.block[1]:
        raise ValueError(
            f'{name}: ({kin}, {kout}) must divide block {cfg.block}')
    self.cfg = cfg
    self.via = cfg.resolve_via()
    self.tx = optax.sgd(cfg.learning_rate, momentum=cfg.momentum)
    self.schedule = UpdateSchedule(
        cfg.maskupdate_begin_step, cfg.maskupdate_end_step,
        cfg.maskupdate_frequency, cfg.drop_fraction,
        cfg.drop_fraction_anneal)
    self.last_update_step = self.schedule.initial_last_update_step
    self.params: Dict[str, Any] = {}
    self.packings: Dict[str, Any] = {}
    self.n_active: Dict[str, int] = {}
    self.opt_state = None
    self.step = 0
    self.batches_seen = 0
    self._jit_step = None

  # ------------------------------------------------------------- state ----
  def init_state(self):
    cfg = self.cfg
    key = jax.random.key(cfg.seed)
    dims = cfg.layer_dims()
    keys = jax.random.split(key, len(dims) + 1)
    for (name, (kin, kout)), k in zip(dims.items(), keys[:-1]):
      bk, bn = cfg.block
      nk, nn_ = kin // bk, kout // bn
      na = nk * nn_ - get_n_zeros(nk * nn_, cfg.sparsity)
      ka, kb = jax.random.split(k)
      self.packings[name] = make_packing(
          random_occupancy(ka, nk, nn_, na), na)
      self.params[name] = (jax.random.normal(kb, (na, bk, bn))
                           / np.sqrt(kin)).astype(jnp.float32)
      self.n_active[name] = na
    kw, kb = jax.random.split(keys[-1])
    last = cfg.widths[-1] if cfg.widths else cfg.in_features
    self.params['head_w'] = (jax.random.normal(kw, (last, cfg.num_classes))
                             / np.sqrt(last)).astype(jnp.float32)
    self.params['head_b'] = jnp.zeros((cfg.num_classes,), jnp.float32)
    self.opt_state = self.tx.init(self.params)
    self.step = 0
    self.batches_seen = 0
    self.last_update_step = self.schedule.initial_last_update_step
    self._jit_step = None

  # ----------------------------------------------------------- forward ----
  def logits(self, params, x, packings=None, dense_view=None):
    cfg = self.cfg
    packings = packings if packings is not None else self.packings
    h = x.reshape((x.shape[0], -1))
    for name in cfg.layer_names():
      if dense_view is not None:
        h = h @ dense_view[name]
      elif self.via == 'dense_view':
        h = h @ unpack_dense(params[name], packings[name], cfg.block)
      else:
        pad = (-h.shape[0]) % cfg.bm
        hp = jnp.pad(h, ((0, pad), (0, 0))) if pad else h
        y = packed_matmul(hp, params[name], packings[name], cfg.block,
                          cfg.bm)
        h = y[:h.shape[0]]
      h = jax.nn.relu(h)
    return h @ params['head_w'] + params['head_b']

  def _loss(self, params, x, y, packings=None, dense_view=None):
    lg = self.logits(params, x, packings, dense_view)
    return jnp.mean(-jax.nn.log_softmax(lg)[jnp.arange(x.shape[0]), y])

  # -------------------------------------------------------------- steps ----
  def _make_jit_step(self):
    packings = self.packings

    @jax.jit
    def step_fn(params, opt_state, x, y):
      loss, g = jax.value_and_grad(
          lambda p: self._loss(p, x, y, packings))(params)
      updates, opt_state = self.tx.update(g, opt_state, params)
      return optax.apply_updates(params, updates), opt_state, loss

    return step_fn

  def train_step(self, x, y):
    if self._jit_step is None:
      self._jit_step = self._make_jit_step()
    self.params, self.opt_state, loss = self._jit_step(
        self.params, self.opt_state, x, y)
    return float(loss)

  def is_update_step(self, step: int) -> bool:
    return bool(self.schedule.is_update_iter(step, self.last_update_step))

  def mask_update(self, x, y):
    """RigL update on packed storage: dense-view grads (inactive blocks
    included) -> pooled grow scores -> drop/grow + slot permutation."""
    cfg = self.cfg
    dv = {name: unpack_dense(self.params[name], self.packings[name],
                             cfg.block) for name in self.packings}

    def dense_loss(dv):
      return self._loss(self.params, x, y, dense_view=dv)

    g = jax.grad(dense_loss)(dv)
    grids = {name: pool_to_blocks(jnp.abs(g[name]), cfg.block, 'sum')
             for name in g}
    df = self.schedule.get_drop_fraction(self.step)
    out = pt.packed_rigl_update(self.params, self.packings, self.opt_state,
                                self.tx, grids, df, self.n_active)
    self.params = out.params
    self.packings = out.packings
    self.opt_state = out.opt_state
    self.last_update_step = self.step
    self._jit_step = None          # packings changed; re-close the step
    return {name: np.asarray(o) for name, o in out.occupancy.items()}

  # --------------------------------------------------------------- eval ----
  def evaluate(self, x, y, batch: int = 500) -> float:
    correct = 0
    for i in range(0, len(x), batch):
      lg = self.logits(self.params, jnp.asarray(x[i:i + batch]))
      correct += int((np.asarray(jnp.argmax(lg, -1))
                      == np.asarray(y[i:i + batch])).sum())
    return correct / len(x)

  # ---------------------------------------------------------------- loop ----
  def train(self, train_xy, eval_xy=None, progress_fn=None,
            log_every: int = 0) -> Dict[str, Any]:
    cfg = self.cfg
    if self.opt_state is None:
      self.init_state()
    xtr, ytr = train_xy
    n = len(xtr)
    n_updates = 0
    loss = float('nan')
    while self.step < cfg.train_steps:
      # Per-batch seeded sampling: resume from a checkpoint replays the
      # exact remaining batch sequence (batches_seen is checkpointed).
      rs = np.random.RandomState(
          (cfg.seed * 1000003 + self.batches_seen) % (2 ** 31))
      idx = rs.randint(0, n, size=cfg.batch_size)
      self.batches_seen += 1
      x = jnp.asarray(xtr[idx])
      y = jnp.asarray(ytr[idx])
      if self.is_update_step(self.step):
        # RigL consumes a batch without advancing the step counter
        # (reference skip-apply semantics, sparse_optimizers_base.py).
        self.mask_update(x, y)
        n_updates += 1
        continue
      loss = self.train_step(x, y)
      self.step += 1
      if log_every and self.step % log_every == 0 and progress_fn:
        progress_fn({'step': self.step, 'loss': loss})
    result = {'train_steps': self.step, 'mask_updates': n_updates,
              'batches': self.batches_seen, 'final_loss': loss,
              'sparsity': cfg.sparsity, 'via': self.via}
    if eval_xy is not None:
      result['eval_top_1'] = self.evaluate(*eval_xy)
    return result

  # ----------------------------------------------------------------- ckpt ----
  def save(self, path: str):
    """Checkpoint: packed params + occupancy grids (packings rebuild
    deterministically from occupancy) + optimizer state + step."""
    import os
    os.makedirs(path, exist_ok=True)
    flat = {'step': np.asarray(self.step),
            'last_update': np.asarray(self.last_update_step),
            'batches_seen': np.asarray(self.batches_seen)}
    for name in self.packings:
      flat[f'occ_{name}'] = np.asarray(pt.occupancy_grid(self.packings[name]))
    for name, p in self.params.items():
      flat[f'param_{name}'] = np.asarray(p)
    leaves, _ = jax.tree.flatten(self.opt_state)
    for i, leaf in enumerate(leaves):
      flat[f'opt_{i}'] = np.asarray(leaf)
    np.savez(os.path.join(path, 'packed_state.npz'), **flat)

  def restore(self, path: str) -> bool:
    import os
    f = os.path.join(path, 'packed_state.npz')
    if not os.path.exists(f):
      return False
    if self.opt_state is None:
      self.init_state()
    z = np.load(f)
    self.step = int(z['step'])
    self.last_update_step = int(z['last_update'])
    self.batches_seen = int(z['batches_seen'])
    for name in list(self.packings):
      occ = jnp.asarray(z[f'occ_{name}'])
      self.packings[name] = make_packing(occ, self.n_active[name])
    self.params = {k[len('param_'):]: jnp.asarray(z[k])
                   for k in z.files if k.startswith('param_')}
    leaves, treedef = jax.tree.flatten(self.opt_state)
    new_leaves = [jnp.asarray(z[f'opt_{i}']) for i in range(len(leaves))]
    self.opt_state = jax.tree.unflatten(treedef, new_leaves)
    self._jit_step = None
    return True
