"""Checkpointing with orbax: full train-state save/restore + mask surgery.

Parity targets:
  * periodic save / auto-resume        (TF Estimator model_dir behavior,
    rigl_tf2/train.py:304-313)
  * mask-only or params-only restore from a different experiment
    (imagenet_resnet/utils.py:93-125, flags :256-261) — used for lottery /
    mask-transfer experiments
  * pre/post-mask-update snapshots     (rigl_tf2/train.py:418-428)
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from rigl_tpu.train.train_state import TrainState


class CheckpointManager:
  """Thin orbax wrapper keyed by optimizer step."""

  def __init__(self, directory: str, max_to_keep: int = 5):
    self.directory = os.path.abspath(directory)
    os.makedirs(self.directory, exist_ok=True)
    self._mgr = ocp.CheckpointManager(
        self.directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))

  def save(self, step: int, state: TrainState, force: bool = False) -> bool:
    if step in (self._mgr.all_steps() or []):
      return False
    saved = self._mgr.save(step, args=ocp.args.StandardSave(state),
                           force=force)
    self._mgr.wait_until_finished()
    return saved

  def latest_step(self) -> Optional[int]:
    return self._mgr.latest_step()

  def restore(self, state: TrainState, step: Optional[int] = None
              ) -> TrainState:
    step = step if step is not None else self._mgr.latest_step()
    if step is None:
      raise FileNotFoundError(f'No checkpoint under {self.directory}')
    return self._mgr.restore(step, args=ocp.args.StandardRestore(state))

  def close(self):
    self._mgr.close()


def restore_masks_only(state: TrainState, other: TrainState) -> TrainState:
  """Takes masks (and mask bookkeeping) from `other`, keeping params — the
  'load a discovered topology, retrain from scratch' experiment
  (imagenet_resnet/utils.py mask-suffix restore)."""
  return state.replace(sparse=state.sparse.replace(
      masks=other.sparse.masks,
      last_update_step=other.sparse.last_update_step,
      is_snipped=other.sparse.is_snipped))


def restore_params_only(state: TrainState, other: TrainState) -> TrainState:
  """Takes params/batch_stats from `other`, keeping current masks — the
  'lottery ticket' style restore (params-suffix restore)."""
  return state.replace(params=other.params, batch_stats=other.batch_stats)


def shuffle_masks(key: jax.Array, masks: Dict[str, Any]) -> Dict[str, Any]:
  """Per-layer random shuffle preserving layer sparsities — the reference's
  mask-shuffling control experiment (rigl_tf2/utils.py:126-128)."""
  out = {}
  for i, (path, m) in enumerate(masks.items()):
    flat = m.reshape(-1)
    out[path] = jax.random.permutation(
        jax.random.fold_in(key, i), flat).reshape(m.shape)
  return out
