"""Data pipeline tests: idx/CIFAR binary parsers (with generated files),
synthetic datasets, augmentation, prefetch."""

import gzip
import os
import struct

import jax
import numpy as np
import pytest

from rigl_tpu.data import datasets, pipeline


def _write_idx_images(path, arr):
  with open(path, 'wb') as f:
    f.write(bytes([0, 0, 8, arr.ndim]))
    for d in arr.shape:
      f.write(struct.pack('>I', d))
    f.write(arr.astype(np.uint8).tobytes())


def _write_idx_labels(path, arr):
  with open(path, 'wb') as f:
    f.write(bytes([0, 0, 8, 1]))
    f.write(struct.pack('>I', arr.shape[0]))
    f.write(arr.astype(np.uint8).tobytes())


def test_mnist_idx_roundtrip(tmp_path):
  rs = np.random.RandomState(0)
  tx = rs.randint(0, 256, (20, 28, 28)).astype(np.uint8)
  ty = rs.randint(0, 10, 20).astype(np.uint8)
  vx = rs.randint(0, 256, (8, 28, 28)).astype(np.uint8)
  vy = rs.randint(0, 10, 8).astype(np.uint8)
  _write_idx_images(str(tmp_path / 'train-images-idx3-ubyte'), tx)
  _write_idx_labels(str(tmp_path / 'train-labels-idx1-ubyte'), ty)
  _write_idx_images(str(tmp_path / 't10k-images-idx3-ubyte'), vx)
  _write_idx_labels(str(tmp_path / 't10k-labels-idx1-ubyte'), vy)
  out = datasets.load_mnist_arrays(str(tmp_path))
  assert out is not None
  ltx, lty, lvx, lvy = out
  assert ltx.shape == (20, 28, 28, 1)
  np.testing.assert_array_equal(ltx[..., 0], tx)
  np.testing.assert_array_equal(lty, ty.astype(np.int32))
  assert lvx.shape == (8, 28, 28, 1)


def test_mnist_gzipped(tmp_path):
  rs = np.random.RandomState(1)
  tx = rs.randint(0, 256, (4, 28, 28)).astype(np.uint8)
  buf_img = bytes([0, 0, 8, 3]) + b''.join(
      struct.pack('>I', d) for d in tx.shape) + tx.tobytes()
  for name, content in [
      ('train-images-idx3-ubyte', buf_img),
      ('train-labels-idx1-ubyte',
       bytes([0, 0, 8, 1]) + struct.pack('>I', 4) + bytes([0, 1, 2, 3])),
      ('t10k-images-idx3-ubyte', buf_img),
      ('t10k-labels-idx1-ubyte',
       bytes([0, 0, 8, 1]) + struct.pack('>I', 4) + bytes([3, 2, 1, 0])),
  ]:
    with gzip.open(str(tmp_path / (name + '.gz')), 'wb') as f:
      f.write(content)
  out = datasets.load_mnist_arrays(str(tmp_path))
  assert out is not None and out[0].shape == (4, 28, 28, 1)


def test_cifar_binary_roundtrip(tmp_path):
  rs = np.random.RandomState(2)
  d = tmp_path / 'cifar-10-batches-bin'
  os.makedirs(str(d))
  for i in range(1, 6):
    rows = []
    for _ in range(10):
      label = rs.randint(0, 10)
      img = rs.randint(0, 256, 3072)
      rows.append(np.concatenate([[label], img]).astype(np.uint8))
    np.stack(rows).tofile(str(d / f'data_batch_{i}.bin'))
  np.stack(rows).tofile(str(d / 'test_batch.bin'))
  out = datasets.load_cifar10_arrays(str(tmp_path))
  assert out is not None
  tx, ty, vx, vy = out
  assert tx.shape == (50, 32, 32, 3)
  assert vx.shape == (10, 32, 32, 3)
  assert ty.dtype == np.int32


def test_missing_data_returns_none(tmp_path):
  assert datasets.load_mnist_arrays(str(tmp_path)) is None
  assert datasets.load_cifar10_arrays(str(tmp_path)) is None


def test_create_dataset_uses_files_when_present(tmp_path):
  rs = np.random.RandomState(3)
  tx = rs.randint(0, 256, (32, 28, 28)).astype(np.uint8)
  _write_idx_images(str(tmp_path / 'train-images-idx3-ubyte'), tx)
  _write_idx_labels(str(tmp_path / 'train-labels-idx1-ubyte'),
                    rs.randint(0, 10, 32).astype(np.uint8))
  _write_idx_images(str(tmp_path / 't10k-images-idx3-ubyte'), tx[:8])
  _write_idx_labels(str(tmp_path / 't10k-labels-idx1-ubyte'),
                    rs.randint(0, 10, 8).astype(np.uint8))
  train, test, info = datasets.create_dataset('mnist', 8,
                                              data_dir=str(tmp_path))
  assert info['source'] == 'files'
  assert info['num_train'] == 32
  batch = next(train.epoch())
  assert batch['image'].shape == (8, 28, 28, 1)
  # Normalized to [-0.5, 0.5].
  assert batch['image'].min() >= -0.5 and batch['image'].max() <= 0.5


def test_create_dataset_synthetic_fallback():
  train, test, info = datasets.create_dataset('cifar10', 8, n_synthetic=64)
  assert info['source'] == 'synthetic'
  batch = next(train.epoch())
  assert batch['image'].shape == (8, 32, 32, 3)
  with pytest.raises(FileNotFoundError):
    datasets.create_dataset('mnist', 8, data_dir='/nonexistent',
                            synthetic_ok=False)


def test_unknown_dataset():
  with pytest.raises(ValueError, match='Unknown dataset'):
    datasets.create_dataset('svhn', 8)


def test_pad_crop_flip_shapes():
  aug = pipeline.pad_crop_flip(4)
  rng = np.random.default_rng(0)
  batch = {'image': np.ones((4, 32, 32, 3), np.float32),
           'label': np.zeros(4, np.int32)}
  out = aug(batch, rng)
  assert out['image'].shape == (4, 32, 32, 3)


def test_standardize_per_image():
  x = np.random.default_rng(0).normal(5.0, 3.0, (2, 8, 8, 3)).astype(
      np.float32)
  out = pipeline.standardize_per_image(x)
  assert abs(out[0].mean()) < 1e-5
  assert out[0].std() == pytest.approx(1.0, abs=1e-4)


def test_prefetch_to_device():
  ds = pipeline.ArrayDataset(np.arange(32).reshape(16, 2).astype(np.float32),
                             np.zeros(16, np.int32), batch_size=4,
                             shuffle=False)
  batches = list(pipeline.prefetch_to_device(ds.epoch(), size=2))
  assert len(batches) == 4
  assert batches[0]['image'].shape == (4, 2)
  # Device arrays.
  assert isinstance(batches[0]['image'], jax.Array)


@pytest.mark.slow
def test_imagenet_tfrecord_wiring(tmp_path):
  """create_dataset routes to the TFRecord pipeline when records exist
  (code-review finding: was silently falling back to synthetic)."""
  tf = pytest.importorskip('tensorflow')
  rs = np.random.RandomState(0)

  def write_split(split, n):
    path = str(tmp_path / f'{split}-00000-of-00001')
    with tf.io.TFRecordWriter(path) as w:
      for i in range(n):
        img = rs.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        jpeg = tf.io.encode_jpeg(img).numpy()
        ex = tf.train.Example(features=tf.train.Features(feature={
            'image/encoded': tf.train.Feature(
                bytes_list=tf.train.BytesList(value=[jpeg])),
            'image/class/label': tf.train.Feature(
                int64_list=tf.train.Int64List(value=[i % 10 + 1])),
        }))
        w.write(ex.SerializeToString())

  write_split('train', 8)
  write_split('validation', 4)
  train, test, info = datasets.create_dataset(
      'imagenet', batch_size=4, eval_batch_size=2, data_dir=str(tmp_path))
  assert info['source'] == 'tfrecords'
  batch = next(iter(train.repeat()))
  assert batch['image'].shape == (4, 224, 224, 3)
  assert batch['label'].min() >= 0  # 1-indexed labels shifted to 0-indexed
  # Normalized: values centered near 0.
  assert abs(float(batch['image'].mean())) < 3.0
  eval_batch = next(iter(test.epoch()))
  assert eval_batch['image'].shape == (2, 224, 224, 3)
