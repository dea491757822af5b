"""Worker process for the multi-host test (tests/test_multihost.py).

Each process: 4 forced CPU devices, jax.distributed rendezvous, one RigL
train step (with a step-0 mask update) over the 8-device global mesh, then
prints a digest of the resulting masks + the loss.  The driver asserts the
digests agree across processes — the reference guarantees this via
cross_replica_sum'd grow scores + stateless RNG
(sparse_optimizers_base.py:402-418,471-476); here it falls out of GSPMD
reducing the global-loss gradients.

Usage (env must be set BEFORE the interpreter starts — sitecustomize
registers the axon backend at startup):

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python tests/multihost_worker.py <process_id> <num_processes> <port>
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

  import jax
  import numpy as np

  from rigl_tpu.parallel import multihost

  multihost.initialize(coordinator_address=f'localhost:{port}',
                       num_processes=nproc, process_id=pid)
  assert jax.process_count() == nproc, jax.process_count()
  assert jax.device_count() == 4 * nproc, jax.device_count()
  assert multihost.is_primary() == (pid == 0)

  import jax.numpy as jnp
  import optax
  from jax.sharding import NamedSharding, PartitionSpec as P

  from rigl_tpu.models import registry
  from rigl_tpu.sparsity.schedules import UpdateSchedule
  from rigl_tpu.train import steps
  from rigl_tpu.transforms import algorithms
  from rigl_tpu.transforms.sparse_training import SparseTraining

  mesh = multihost.global_mesh()
  repl = NamedSharding(mesh, P())

  model = registry.create_model('mnist_mlp', num_classes=10,
                                features=(16, 16))
  algo = algorithms.RigL(schedule=UpdateSchedule(
      begin_step=0, end_step=-1, frequency=100, drop_fraction=0.3))
  st = SparseTraining(optax.sgd(0.1, momentum=0.9), algo,
                      distribution='erdos_renyi_kernel',
                      default_sparsity=0.8)

  global_batch = 16
  local_batch = multihost.per_host_batch_size(global_batch)
  assert local_batch == global_batch // nproc

  state = steps.init_train_state(jax.random.key(0), model, st,
                                 (global_batch, 28, 28, 1))

  def to_global(x):
    # Typed PRNG keys can't pass through numpy; unwrap/rewrap the key data.
    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype,
                                                   jax.dtypes.prng_key):
      data = jax.make_array_from_process_local_data(
          repl, np.asarray(jax.random.key_data(x)))
      return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
    return jax.make_array_from_process_local_data(repl, np.asarray(x))

  state = jax.tree.map(to_global, state)

  # Per-host data is DIFFERENT (seeded by pid): mask identity must come
  # from the reduced global-loss gradients, not from identical inputs.
  rng = np.random.default_rng(100 + pid)
  local = {
      'image': rng.normal(0, 1, (local_batch, 28, 28, 1)).astype(np.float32),
      'label': rng.integers(0, 10, (local_batch,)).astype(np.int32),
  }
  batch = multihost.host_local_to_global(local, mesh)

  train_step = steps.make_train_step(model, st, has_batch_stats=False)
  step_fn = jax.jit(train_step,
                    in_shardings=(repl, NamedSharding(mesh, P('data'))),
                    out_shardings=(repl, repl))
  new_state, metrics = step_fn(state, batch)
  jax.block_until_ready(new_state.params)

  digest = hashlib.sha256()
  for path in sorted(new_state.sparse.masks):
    m = new_state.sparse.masks[path]
    digest.update(np.asarray(jax.device_get(m.addressable_data(0))).tobytes())
  updated = int(jax.device_get(
      new_state.sparse.last_update_step.addressable_data(0)))
  assert updated == 0, f'step-0 mask update did not fire: {updated}'
  loss = float(jax.device_get(metrics['loss'].addressable_data(0)))
  print(f'RESULT pid={pid} masks={digest.hexdigest()} loss={loss:.6f}')


if __name__ == '__main__':
  main()
