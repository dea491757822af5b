"""Multi-process multi-host test: 2 CPU processes x 4 forced devices run
one RigL train step (with a step-0 mask update) over the global 8-device
mesh through parallel/multihost.py, and the resulting masks must be
IDENTICAL across processes despite different per-host batches — the
reference's cross-replica guarantee (sparse_optimizers_base.py:471-476),
here provided by GSPMD's reduction of the global-loss gradients."""

import os
import re
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy suite; run with --runslow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tests', 'multihost_worker.py')


def _free_port():
  with socket.socket() as s:
    s.bind(('localhost', 0))
    return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mask_identity():
  port = _free_port()
  env = dict(os.environ)
  # Must be set before the interpreter starts: sitecustomize registers the
  # axon TPU backend at startup (CLAUDE.md).
  env['JAX_PLATFORMS'] = 'cpu'
  env['PALLAS_AXON_POOL_IPS'] = ''
  env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
  procs = [
      subprocess.Popen(
          [sys.executable, WORKER, str(pid), '2', str(port)],
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
          env=env, cwd=REPO)
      for pid in range(2)
  ]
  outs = []
  for p in procs:
    out, _ = p.communicate(timeout=600)
    outs.append(out)
  for p, out in zip(procs, outs):
    assert p.returncode == 0, f'worker failed:\n{out[-3000:]}'

  results = {}
  for out in outs:
    m = re.search(r'RESULT pid=(\d+) masks=(\w+) loss=([\d.eE+-]+)', out)
    assert m, f'no RESULT line:\n{out[-3000:]}'
    results[int(m.group(1))] = (m.group(2), float(m.group(3)))

  assert set(results) == {0, 1}
  assert results[0][0] == results[1][0], 'masks diverged across processes'
  assert results[0][1] == pytest.approx(results[1][1], rel=1e-6)


def test_initialize_surfaces_real_errors():
  """multihost.initialize must not swallow genuine failures."""
  from rigl_tpu.parallel import multihost
  import jax

  calls = {}

  def fake_init(**kw):
    calls.update(kw)
    raise RuntimeError('Could not connect to coordinator')

  orig = jax.distributed.initialize
  jax.distributed.initialize = fake_init
  try:
    with pytest.raises(RuntimeError, match='coordinator'):
      multihost.initialize('bogus:1', 2, 0)
    # Idempotent re-init stays silent.
    jax.distributed.initialize = lambda **kw: (_ for _ in ()).throw(
        RuntimeError('Distributed system is already initialized'))
    multihost.initialize('bogus:1', 2, 0)
    # Single-process: no-op, never calls into jax.distributed.
    jax.distributed.initialize = fake_init
    calls.clear()
    multihost.initialize(num_processes=1)
    assert not calls
  finally:
    jax.distributed.initialize = orig
