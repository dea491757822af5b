"""Real-data accuracy for the PACKED transformer LM: byte-level language
modeling on this repository's own source text (~1MB of real .py/.md bytes,
zero-egress-safe), trained end-to-end through the product surface
(train/packed_lm.PackedLMTrainer — the same loop drivers/packed_lm.py
runs), with RigL drop/grow ON packed storage.

Arms (2-layer decoder, d_model 128, d_ff 512, seq 128, lr 1e-3 Adam):
  dense         — packed storage at sparsity 0 (== dense matmuls);
  packed_rigl   — sparsity 0.8 with drop/grow every 100 steps;
  packed_static — sparsity 0.8, topology frozen at init;
  moe_rigl      — Switch top-1 MoE (4 experts, expert-stacked packed
                  kernels, per-expert drop/grow; LM_ARMS=moe_rigl);
  moe_static    — same MoE, topology frozen at init;
  moe_dense     — same MoE at sparsity 0 (the dense-MoE ceiling).

Reported: eval cross-entropy (nats/byte) on a held-out 10% suffix split.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/lm_bytes_accuracy.py
"""

import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = int(os.environ.get('LM_STEPS', 1000))
# One or more sparsity operating points; sparse arms run at each, the
# dense arm once (LM_SPARSITIES takes precedence over LM_SPARSITY).
SPARSITIES = [float(s) for s in os.environ.get(
    'LM_SPARSITIES', os.environ.get('LM_SPARSITY', '0.8')).split(',')]
ARMS = os.environ.get('LM_ARMS', 'dense,packed_rigl,packed_static'
                      ).split(',')
SEEDS = [int(s) for s in os.environ.get('LM_SEEDS', '0,1').split(',')]

# Defaults sized for CPU interpret-mode; on the real chip override to a
# TPU-legal block, e.g. LM_D_MODEL=512 LM_D_FF=2048 LM_HEADS=8 LM_BATCH=16
# LM_BLOCK=128,128 LM_BM=512 (Mosaic requires block dims (8k, 128k)).
_BLOCK = tuple(int(v) for v in os.environ.get('LM_BLOCK', '16,16').split(','))
if len(_BLOCK) != 2:
  raise SystemExit(f'LM_BLOCK must be "bk,bn" (two ints), got '
                   f'{os.environ.get("LM_BLOCK")!r}')
# LM_LR: shared Adam lr.  LM_DENSE_LR: override for the dense (s=0) arms —
# at d_model 512 the 5x-params dense model is unstable at the sparse arms'
# 1e-3 (bounces on the byte-LM plateau at ~2.4-2.7 nats for 10k steps on
# every seed, measured round 4); 3e-4 descends smoothly.  Each arm runs at
# its stable lr, like the reference's separately-tuned dense baselines.
LR = float(os.environ.get('LM_LR', 1e-3))
DENSE_LR = float(os.environ.get('LM_DENSE_LR', 3e-4))
# LM_DIST=uniform|erdos_renyi|erdos_renyi_kernel: per-layer sparsity
# distribution of the sparse arms (sparsity/layer_sparsity.py; round-5
# ERK-on-packed plumbing).  Dense arms ignore it.
DIST = os.environ.get('LM_DIST', 'uniform')
CFG = dict(vocab_size=256, num_layers=2,
           d_model=int(os.environ.get('LM_D_MODEL', 128)),
           d_ff=int(os.environ.get('LM_D_FF', 512)),
           num_heads=int(os.environ.get('LM_HEADS', 4)),
           seq_len=int(os.environ.get('LM_SEQ', 128)),
           block=_BLOCK, bm=int(os.environ.get('LM_BM', 128)),
           warmup_steps=50,
           batch_size=int(os.environ.get('LM_BATCH', 8)))
for _dim_name in ('d_model', 'd_ff'):
  for _b in _BLOCK:
    if CFG[_dim_name] % _b:
      raise SystemExit(f'LM_BLOCK={_BLOCK} must divide '
                       f'{_dim_name}={CFG[_dim_name]}')


CORPUS_SNAPSHOT = os.path.join(REPO, 'tests', 'golden', 'lm_corpus_v1.bin')


def load_repo_bytes() -> np.ndarray:
  """Byte stream for the LM task.  Default: the FROZEN snapshot
  tests/golden/lm_corpus_v1.bin (1,056,351 bytes of this repo's own
  .py/.md source, frozen at round 4) so accuracy numbers stay comparable
  round over round instead of drifting with every commit.  LM_CORPUS=live
  regenerates from the working tree (how the snapshot was produced)."""
  if (os.environ.get('LM_CORPUS', 'frozen') != 'live'
      and os.path.exists(CORPUS_SNAPSHOT)):
    return np.fromfile(CORPUS_SNAPSHOT, dtype=np.uint8).astype(np.int32)
  paths = sorted(
      glob.glob(os.path.join(REPO, 'rigl_tpu', '**', '*.py'), recursive=True)
      + glob.glob(os.path.join(REPO, 'tests', '*.py'))
      + glob.glob(os.path.join(REPO, 'docs', '*.md'))
      + glob.glob(os.path.join(REPO, '*.md')))
  chunks = [np.fromfile(p, dtype=np.uint8) for p in paths]
  return np.concatenate(chunks).astype(np.int32)


def run_arm(arm, train_tokens, eval_tokens, arm_sparsity):
  from rigl_tpu.train.packed_lm import PackedLMConfig, PackedLMTrainer
  dense = arm in ('dense', 'moe_dense')
  sparsity = 0.0 if dense else arm_sparsity
  static = arm.endswith('static')
  ces, updates, n_packed, n_dense = [], 0, 0, 0
  for seed in SEEDS:
    cfg = PackedLMConfig(
        n_experts=4 if arm.startswith('moe') else 0,
        learning_rate=DENSE_LR if dense else LR,
        sparsity=sparsity,
        sparsity_distribution='uniform' if dense else DIST,
        train_steps=STEPS,
        maskupdate_begin_step=0,
        maskupdate_end_step=0 if (static or dense)
        else int(STEPS * 0.75),
        maskupdate_frequency=100, drop_fraction=0.3,
        drop_fraction_anneal='constant' if (static or dense)
        else 'cosine',
        seed=seed, **CFG)
    tr = PackedLMTrainer(cfg)
    res = tr.train(
        train_tokens, eval_tokens=eval_tokens,
        # lax.scan-chunked loop (bit-identical to per-step; tested):
        # essential over the remote-TPU tunnel where a per-step host
        # readback would dominate at these model sizes.
        steps_per_loop=int(os.environ.get('LM_STEPS_PER_LOOP', 100)),
        eval_windows=int(os.environ.get('LM_EVAL_WINDOWS', 64)),
        log_every=int(os.environ.get('LM_LOG_EVERY', 1000)),
        progress_fn=lambda m: print(
            f'# t={time.time():.0f} {arm} s={sparsity} seed={seed} '
            f'step={m["step"]} loss={m["loss"]:.4f}',
            file=sys.stderr, flush=True))
    ces.append(res['eval_ce_nats'])
    updates = res['mask_updates']
    n_packed, n_dense = res['n_params_packed'], res['n_params_dense_equiv']
  out = {'arm': arm, 'sparsity': sparsity,
         'distribution': 'uniform' if dense else DIST,
         'learning_rate': DENSE_LR if dense else LR,
         'eval_ce_nats_mean': round(float(np.mean(ces)), 4),
         'eval_ce_per_seed': [round(c, 4) for c in ces],
         'eval_bits_per_byte': round(float(np.mean(ces)) / np.log(2), 4),
         'mask_updates': updates, 'steps': STEPS,
         'n_params_packed': n_packed, 'n_params_dense_equiv': n_dense}
  print(json.dumps(out))
  return out


def main():
  tokens = load_repo_bytes()
  split = int(len(tokens) * 0.9)
  train_tokens, eval_tokens = tokens[:split], tokens[split:]
  print(f'# repo bytes: {len(train_tokens)} train / {len(eval_tokens)} eval')
  out = {}
  for sp in SPARSITIES:
    for arm in ARMS:
      key = arm if arm in ('dense', 'moe_dense') else f'{arm}@{sp}'
      if key in out:
        continue  # dense arm runs once across the sparsity sweep
      out[key] = run_arm(arm, train_tokens, eval_tokens, sp)
  print(json.dumps(out))
  return out


if __name__ == '__main__':
  main()
