"""Real-data accuracy on the PACKED block-sparse engine: sklearn's bundled
handwritten digits (1797 real scanned 8x8 images, zero-egress-safe) trained
end-to-end through the product surface (train/packed_loop.PackedMLPTrainer,
the same loop drivers/packed_mlp.py runs).

This is the accuracy-side proof that packed storage is a first-class
training path: weights, grads, and momentum never exist densely except for
the rare update-step dense-grad view (RigL's grow score,
sparse_optimizers_base.py:328-334).

Arms (all 784-512-256-10, (16,16) blocks, lr 0.05 momentum SGD):
  dense         — packed storage at sparsity 0 (== dense matmuls);
  packed_rigl   — sparsity 0.9 with drop/grow every 100 steps;
  packed_static — sparsity 0.9, topology frozen at init.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/digits_packed.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get('DIGITS_STEPS', 2000))
SPARSITY = float(os.environ.get('DIGITS_SPARSITY', 0.9))
LR = float(os.environ.get('DIGITS_LR', 0.05))
ARMS = os.environ.get('DIGITS_ARMS', 'dense,packed_rigl,packed_static'
                      ).split(',')
SEEDS = [int(s) for s in os.environ.get('DIGITS_SEEDS', '0,1,2').split(',')]


def load_digits_flat():
  """28x28 view of the 8x8 digits (same lossless kron x3 + pad as
  scripts/digits_accuracy.py), flattened to 784, deterministic 80/20."""
  from sklearn.datasets import load_digits
  x, y = load_digits(return_X_y=True)
  x = (x.reshape(-1, 8, 8) * (255.0 / 16.0)).round().clip(0, 255)
  x = np.kron(x, np.ones((1, 3, 3)))
  x = np.pad(x, ((0, 0), (2, 2), (2, 2))).reshape(-1, 784) / 255.0
  test = np.arange(len(x)) % 5 == 0
  return (x[~test].astype(np.float32), y[~test].astype(np.int32),
          x[test].astype(np.float32), y[test].astype(np.int32))


def run_arm(arm, data):
  from rigl_tpu.train.packed_loop import PackedMLPConfig, PackedMLPTrainer
  xtr, ytr, xte, yte = data
  sparsity = 0.0 if arm == 'dense' else SPARSITY
  static = arm == 'packed_static'
  accs, updates = [], 0
  for seed in SEEDS:
    cfg = PackedMLPConfig(
        in_features=784, widths=(512, 256), num_classes=10,
        sparsity=sparsity, block=(16, 16), via='dense_view',
        learning_rate=LR, momentum=0.9, train_steps=STEPS, batch_size=100,
        maskupdate_begin_step=0,
        maskupdate_end_step=0 if (static or arm == 'dense')
        else int(STEPS * 0.75),
        maskupdate_frequency=100, drop_fraction=0.3,
        drop_fraction_anneal='constant' if (static or arm == 'dense')
        else 'cosine',
        seed=seed)
    tr = PackedMLPTrainer(cfg)
    res = tr.train((xtr, ytr), eval_xy=(xte, yte))
    accs.append(res['eval_top_1'])
    updates = res['mask_updates']
  out = {'arm': arm, 'sparsity': sparsity,
         'eval_top_1_mean': round(float(np.mean(accs)), 4),
         'eval_top_1_per_seed': [round(a, 4) for a in accs],
         'mask_updates': updates, 'steps': STEPS}
  print(json.dumps(out))
  return out


def main():
  data = load_digits_flat()
  print(f'# digits: {len(data[0])} train / {len(data[2])} test')
  out = {}
  for arm in ARMS:
    out[arm] = run_arm(arm, data)
  print(json.dumps(out))
  return out


if __name__ == '__main__':
  main()
