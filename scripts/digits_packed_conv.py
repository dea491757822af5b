"""Real-data accuracy for PACKED block-sparse CONVS at depth: sklearn's
bundled handwritten digits (1797 real scanned 8x8 images) trained through
PackedConvNet — the MobileNet-v1 sparsity structure (dense depthwise,
packed 1x1 contractions, mobilenetv1_model.py:43,156-221) with every
pointwise conv's weights/grads/momentum in O(density) packed storage and
RigL drop/grow running ON packed storage.

Arms (stem 32, stages 64/128/128, (16,16) blocks, lr 0.05 momentum SGD):
  dense         — packed storage at sparsity 0 (== dense matmuls);
  packed_rigl   — sparsity 0.8 with drop/grow every 100 steps;
  packed_static — sparsity 0.8, topology frozen at init.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/digits_packed_conv.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get('DIGITS_STEPS', 1000))
SPARSITY = float(os.environ.get('DIGITS_SPARSITY', 0.8))
LR = float(os.environ.get('DIGITS_LR', 0.05))
ARMS = os.environ.get('DIGITS_ARMS', 'dense,packed_rigl,packed_static'
                      ).split(',')
SEEDS = [int(s) for s in os.environ.get('DIGITS_SEEDS', '0,1,2').split(',')]

NET = dict(num_classes=10, stem_width=32,
           stages=((64, 2), (128, 2), (128, 1)))


def load_digits_images():
  from sklearn.datasets import load_digits
  x, y = load_digits(return_X_y=True)
  x = (x / 16.0).astype(np.float32).reshape(-1, 8, 8, 1)
  test = np.arange(len(x)) % 5 == 0
  return (x[~test], y[~test].astype(np.int32),
          x[test], y[test].astype(np.int32))


def run_arm(arm, data):
  from rigl_tpu.models.packed_convnet import DenseConvNet, PackedConvNet
  from rigl_tpu.train.packed_classifier import (PackedClassifierConfig,
                                                PackedClassifierTrainer)
  xtr, ytr, xte, yte = data
  sparsity = 0.0 if arm == 'dense' else SPARSITY
  static = arm == 'packed_static'
  accs, updates, n_packed, n_dense = [], 0, 0, 0
  for seed in SEEDS:
    cfg = PackedClassifierConfig(
        sparsity=sparsity, block=(16, 16), learning_rate=LR,
        train_steps=STEPS, batch_size=100,
        maskupdate_begin_step=0,
        maskupdate_end_step=0 if (static or arm == 'dense')
        else int(STEPS * 0.75),
        maskupdate_frequency=100, drop_fraction=0.3,
        drop_fraction_anneal='constant' if (static or arm == 'dense')
        else 'cosine',
        seed=seed)
    model = PackedConvNet(sparsity=sparsity, block=cfg.block, bm=64, **NET)
    twin = DenseConvNet(**NET)
    tr = PackedClassifierTrainer(model, twin, cfg, input_shape=(8, 8, 1))
    res = tr.train((xtr, ytr), eval_xy=(xte, yte))
    accs.append(res['eval_top_1'])
    updates = res['mask_updates']
    n_packed, n_dense = res['n_params_packed'], res['n_params_dense_equiv']
  out = {'arm': arm, 'sparsity': sparsity,
         'eval_top_1_mean': round(float(np.mean(accs)), 4),
         'eval_top_1_per_seed': [round(a, 4) for a in accs],
         'mask_updates': updates, 'steps': STEPS,
         'n_params_packed': n_packed, 'n_params_dense_equiv': n_dense}
  print(json.dumps(out))
  return out


def main():
  data = load_digits_images()
  print(f'# digits: {len(data[0])} train / {len(data[2])} test')
  out = {}
  for arm in ARMS:
    out[arm] = run_arm(arm, data)
  print(json.dumps(out))
  return out


if __name__ == '__main__':
  main()
