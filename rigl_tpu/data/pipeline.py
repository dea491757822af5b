"""Host-side input pipeline: numpy batching + background device prefetch.

TPU-native replacement for the reference's tf.data/TPUEstimator infeed
(SURVEY.md §2.5 L5): the host thread prepares and transfers the next batch
while the device executes the current step, so input never serializes with
compute.  Pipelines are plain python iterators of {'image', 'label'} numpy
dicts, so any source (synthetic, raw files, tfrecord) plugs in.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np

Batch = Dict[str, np.ndarray]


class ArrayDataset:
  """In-memory dataset with the reference's epoch semantics: shuffle each
  epoch, drop remainder (dataset_base.py:74-90 batch(drop_remainder=True))."""

  def __init__(self, images: np.ndarray, labels: np.ndarray, batch_size: int,
               shuffle: bool = True, seed: int = 0,
               augment: Optional[Callable[[Batch, np.random.Generator],
                                          Batch]] = None):
    if len(images) != len(labels):
      raise ValueError('images/labels length mismatch')
    self.images = images
    self.labels = labels
    self.batch_size = batch_size
    self.shuffle = shuffle
    self.augment = augment
    self._rng = np.random.default_rng(seed)

  def __len__(self):
    return len(self.images) // self.batch_size

  def epoch(self) -> Iterator[Batch]:
    n = len(self.images)
    order = self._rng.permutation(n) if self.shuffle else np.arange(n)
    for i in range(len(self)):
      idx = order[i * self.batch_size:(i + 1) * self.batch_size]
      batch = {'image': self.images[idx], 'label': self.labels[idx]}
      if self.augment is not None:
        batch = self.augment(batch, self._rng)
      yield batch

  def repeat(self) -> Iterator[Batch]:
    while True:
      yield from self.epoch()


def prefetch_to_device(it: Iterator[Batch], size: int = 2,
                       sharding=None) -> Iterator[Any]:
  """Background-thread prefetcher: overlaps host batch prep + H2D transfer
  with device compute.  With a `sharding`, batches are placed sharded
  (jax.device_put with NamedSharding) so jit consumes them without
  resharding."""
  q: queue.Queue = queue.Queue(maxsize=size)
  _SENTINEL = object()

  def producer():
    try:
      for batch in it:
        if sharding is not None:
          batch = jax.device_put(batch, sharding)
        else:
          batch = jax.device_put(batch)
        q.put(batch)
      q.put(_SENTINEL)
    except BaseException as e:  # re-raised in the consumer
      q.put(e)

  t = threading.Thread(target=producer, daemon=True)
  t.start()
  while True:
    item = q.get()
    if item is _SENTINEL:
      return
    if isinstance(item, BaseException):
      raise item
    yield item


# ---------------------------------------------------------------- augment --
def pad_crop_flip(pad: int = 4):
  """CIFAR augmentation: reflect-pad by cropped border pixels, random crop
  back to original size, random horizontal flip — exactly the reference's
  pad_input/preprocess_train (cifar_resnet/data_helper.py:29-61)."""

  def fn(batch: Batch, rng: np.random.Generator) -> Batch:
    imgs = batch['image']
    n, h, w, c = imgs.shape
    # Mirror-pad including the border pixel (x[:pad][::-1] in the
    # reference's pad_input) == np.pad mode='symmetric'.
    padded = np.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode='symmetric')
    out = np.empty_like(imgs)
    ys = rng.integers(0, 2 * pad + 1, size=n)
    xs = rng.integers(0, 2 * pad + 1, size=n)
    flips = rng.random(n) < 0.5
    for i in range(n):
      crop = padded[i, ys[i]:ys[i] + h, xs[i]:xs[i] + w, :]
      out[i] = crop[:, ::-1, :] if flips[i] else crop
    return {'image': out, 'label': batch['label']}

  return fn


def standardize_per_image(images: np.ndarray) -> np.ndarray:
  """tf.image.per_image_standardization equivalent (data_helper.py uses it
  after augmentation)."""
  images = images.astype(np.float32)
  axes = tuple(range(1, images.ndim))
  mean = images.mean(axis=axes, keepdims=True)
  std = images.std(axis=axes, keepdims=True)
  n = np.prod(images.shape[1:])
  adj_std = np.maximum(std, 1.0 / np.sqrt(n))
  return (images - mean) / adj_std
