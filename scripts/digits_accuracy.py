"""Real-data accuracy evidence, on-box: sklearn's bundled handwritten digits
trained through the FULL MNIST driver stack.

The environment has zero egress, so MNIST/CIFAR/ImageNet archives cannot be
fetched — but scikit-learn ships the UCI Optical Recognition of Handwritten
Digits test set (1797 REAL scanned 8x8 digits) inside its wheel.  This
script converts them losslessly to the MNIST idx format (16-level -> 0..255
grayscale; kron x3 upsample to 24x24 + 2px pad -> 28x28) and trains the
parity 300-100-10 architecture (reference mnist/mnist_train_eval.py:369-443)
through rigl_tpu's real-data path: data/datasets.py idx parser ->
train/trainer.py -> transforms/sparse_training.py.

Reported: test top-1 per training method at the reference's MNIST operating
points (per-layer custom sparsities {layer2: 0.9*s, layer3: 0},
mnist_train_eval.py:269-272).  The claim under test is the paper's core one:
RigL trains a 98%-sparse net close to dense accuracy, and beats static
sparsity at equal budget.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/digits_accuracy.py
  # ~2 min/arm on the 1-core box at the default 3000 steps

Results land in docs/REPRODUCE.md once measured.
"""

import json
import os
import struct
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get('DIGITS_STEPS', 3000))
METHODS = os.environ.get('DIGITS_METHODS', 'dense,rigl,static,set').split(',')
SPARSITY = float(os.environ.get('DIGITS_SPARSITY', 0.98))
# The reference's lr=0.2 is tuned for 60k-sample MNIST; on the 1437-sample
# digits set the DENSE net diverges at 0.2 (sparse nets survive — sparsity
# regularizes).  One lr for every arm, chosen so all arms train.
LR = float(os.environ.get('DIGITS_LR', 0.05))


def write_idx(path, arr):
  """MNIST idx format: magic, dims (big-endian), uint8 payload."""
  arr = np.ascontiguousarray(arr, np.uint8)
  with open(path, 'wb') as f:
    f.write(struct.pack('>HBB', 0, 8, arr.ndim))
    for d in arr.shape:
      f.write(struct.pack('>I', d))
    f.write(arr.tobytes())


def digits_as_mnist(data_dir):
  from sklearn.datasets import load_digits
  x, y = load_digits(return_X_y=True)          # (1797, 64) in 0..16, real data
  x = (x.reshape(-1, 8, 8) * (255.0 / 16.0)).round().clip(0, 255)
  x = np.kron(x, np.ones((1, 3, 3)))           # lossless 3x upsample -> 24x24
  x = np.pad(x, ((0, 0), (2, 2), (2, 2)))      # -> 28x28
  # Deterministic stratified-ish split: every 5th sample is test (20%).
  test = np.arange(len(x)) % 5 == 0
  write_idx(os.path.join(data_dir, 'train-images-idx3-ubyte'), x[~test])
  write_idx(os.path.join(data_dir, 'train-labels-idx1-ubyte'),
            y[~test].astype(np.uint8))
  write_idx(os.path.join(data_dir, 't10k-images-idx3-ubyte'), x[test])
  write_idx(os.path.join(data_dir, 't10k-labels-idx1-ubyte'),
            y[test].astype(np.uint8))
  return int((~test).sum()), int(test.sum())


def run_method(method, data_dir):
  from rigl_tpu.models.mlp import MnistMLP
  from rigl_tpu.train.trainer import TrainConfig, Trainer
  sparsity = 0.0 if method == 'dense' else SPARSITY
  cfg = TrainConfig(
      model='mnist_mlp', dataset='mnist', data_dir=data_dir,
      training_method=method, sparsity=sparsity,
      custom_sparsity_map=MnistMLP().custom_sparsity_map(sparsity, 0.9),
      train_steps=STEPS, batch_size=100,
      base_learning_rate=LR, lr_schedule='mnist', momentum=0.9,
      weight_decay=0.0, label_smoothing=0.0,
      maskupdate_begin_step=0, maskupdate_end_step=int(STEPS * 0.75),
      maskupdate_frequency=100, drop_fraction=0.3,
      drop_fraction_anneal='cosine',
      eval_every=0, log_every=1000, seed=0)
  r = Trainer(cfg).train(progress_fn=lambda m: None)
  return {'method': method, 'sparsity': sparsity,
          'eval_top_1': round(r['eval_top_1'], 4),
          'global_sparsity': round(r.get('global_sparsity', 0.0), 4),
          'steps': STEPS}


def main():
  out = {}
  with tempfile.TemporaryDirectory() as data_dir:
    n_train, n_test = digits_as_mnist(data_dir)
    print(f'# sklearn digits -> idx: {n_train} train / {n_test} test')
    for method in METHODS:
      res = run_method(method, data_dir)
      out[method] = res
      print(json.dumps(res))
  print(json.dumps(out))


if __name__ == '__main__':
  main()
