"""Multi-host utilities.

The reference reached multi-host scale through TPUEstimator master/
tpu_job_name plumbing (imagenet_train_eval.py:76-77,737-747); its JAX branch
explicitly raised on host_count > 1 (training/training.py:195-198).  Here
multi-host is the standard jax.distributed path: one process per host, a
global mesh spanning all slices (ICI within a slice, DCN across), and the
same jit'd train step — GSPMD handles cross-host collectives.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
  """Initializes jax.distributed when running multi-process; no-op for
  single-process runs (args auto-detected on TPU pods when omitted)."""
  if num_processes is not None and num_processes <= 1:
    return
  try:
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
  except RuntimeError as e:
    # Idempotence only: re-initialization is fine, anything else (bad
    # coordinator address, rendezvous timeout...) must surface.
    if 'already initialized' not in str(e).lower():
      raise


def is_primary() -> bool:
  """True on the process that should write checkpoints/metrics."""
  return jax.process_index() == 0


def global_mesh(n_model: int = 1):
  """A ('data', 'model') mesh over every device in the job (all hosts)."""
  from rigl_tpu.parallel.mesh import make_mesh
  return make_mesh(n_model=n_model, devices=jax.devices())


def per_host_batch_size(global_batch_size: int) -> int:
  n = jax.process_count()
  if global_batch_size % n:
    raise ValueError(
        f'global batch {global_batch_size} not divisible by {n} hosts')
  return global_batch_size // n


def host_local_to_global(batch, mesh):
  """Assembles per-host input shards into one global sharded array
  (the multi-host input path: each host feeds its slice of the batch)."""
  from jax.sharding import NamedSharding, PartitionSpec as P
  sharding = NamedSharding(mesh, P('data'))
  return jax.tree.map(
      lambda x: jax.make_array_from_process_local_data(sharding, x), batch)
