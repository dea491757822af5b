"""Packed block-sparse transformer LM driver: causal language modeling
where every parameter matmul's weights, gradients, and optimizer slots
live as `(n_active, bk, bn)` packed blocks (train/packed_lm.py), with RigL
drop/grow running ON packed storage.

Data: `--data_file` points at ANY local file, consumed byte-level
(vocab 256) with a 90/10 train/eval split; unset falls back to a
deterministic synthetic byte stream, like every other driver here.

The reference has no transformer family (its models stop at ResNet/VGG/
MobileNet + MLPs); this driver is the packed engine applied to the model
class production cares about, using the same architecture-agnostic
RigL semantics (sparse_optimizers_base.py:276-343).

  python -m rigl_tpu.drivers.packed_lm --train_steps=2000 \
      --end_sparsity=0.8 --data_file=/path/to/corpus.txt
"""

from __future__ import annotations

import json
import os

import numpy as np
from absl import app

from rigl_tpu.drivers import common
from rigl_tpu.drivers.common import safe_flags

FLAGS = common.flags.FLAGS
common.define_common_flags(default_method='rigl', default_sparsity=0.8,
                           default_steps=1000, default_batch=8,
                           default_frequency=100, default_end_step=750,
                           default_anneal='cosine', default_lr=1e-3)
safe_flags.DEFINE_string('data_file', None,
                         'any local file, read as a byte stream '
                         '(synthetic stream if unset)')
safe_flags.DEFINE_integer('num_layers', 2, 'transformer blocks')
safe_flags.DEFINE_integer('d_model', 256, '')
safe_flags.DEFINE_integer('d_ff', 1024, '')
safe_flags.DEFINE_integer('num_heads', 8, '')
safe_flags.DEFINE_integer('seq_len', 128, '')
safe_flags.DEFINE_string('packed_block', '16,16',
                         'block (bk,bn) of packed storage; TPU kernel '
                         'execution needs bn=128, bk%8==0')
safe_flags.DEFINE_integer('packed_bm', 128, 'row-panel size of the packed '
                          'matmul (VMEM-clamped automatically)')
safe_flags.DEFINE_string('lm_dtype', 'float32', 'float32|bfloat16')
safe_flags.DEFINE_integer('warmup_steps', 50, 'linear LR warmup')
safe_flags.DEFINE_integer('n_data', 1, 'data-parallel mesh shards')
safe_flags.DEFINE_integer('n_model', 1, 'tensor-parallel column groups '
                          '(packed kernels shard over the model axis)')
safe_flags.DEFINE_integer('n_pipe', 1, 'pipeline stages (blocks shard '
                          'over the pipe axis, GPipe microbatch schedule)')
safe_flags.DEFINE_integer('n_micro', 0, 'microbatches per local batch for '
                          'the pipeline schedule (0 = n_pipe)')
safe_flags.DEFINE_integer('n_seq', 1, 'sequence-parallel shards (tokens '
                          'shard over the seq axis; attention gathers k/v)')
safe_flags.DEFINE_integer('n_experts', 0, 'MoE: experts per FFN (0 = dense '
                          'FFN path); expert kernels are expert-stacked '
                          'packed storage with per-expert RigL')
safe_flags.DEFINE_float('capacity_factor', 2.0, 'MoE per-expert token '
                        'capacity = ceil(local_tokens/E * factor)')
safe_flags.DEFINE_float('aux_loss_weight', 0.01, 'Switch load-balance '
                        'aux loss weight')
safe_flags.DEFINE_integer('n_expert', 1, 'expert-parallel shards (experts '
                          'shard over the expert axis; tokens all_to_all)')
safe_flags.DEFINE_integer('generate_steps', 0, 'after training, sample '
                          'this many tokens from the packed model via the '
                          'serving decode path (rigl_tpu/serve)')
safe_flags.DEFINE_string('generate_prompt', '', 'prompt text for '
                         '--generate_steps (byte-level; defaults to the '
                         'first training window)')
safe_flags.DEFINE_float('generate_temperature', 0.8, 'sampling '
                        'temperature (0 = greedy)')
safe_flags.DEFINE_integer('generate_top_k', 0, 'top-k sampling truncation '
                          '(0 = off)')
safe_flags.DEFINE_float('generate_top_p', 1.0, 'nucleus (top-p) sampling '
                        'mass (1.0 = off)')
safe_flags.DEFINE_integer('generate_kv_chunk', 0, 'chunked KV-cache '
                          'attention: per-step KV reads scale with the '
                          'live prefix instead of the allocated cache '
                          '(0 = off; must divide the cache length). '
                          'Enable when allocated/live >= ~2x with chunk '
                          '~= expected live prefix (measured 2.9x there; '
                          '~32% overhead on tight allocations — PERF.md)')
safe_flags.DEFINE_float('snfs_momentum', 0.9, 'EMA decay for '
                        '--training_method=momentum (SNFS) grow scores')


def synthetic_stream(n: int = 200_000, seed: int = 0) -> np.ndarray:
  """Deterministic learnable byte stream: a noisy order-2 Markov walk over
  a 64-symbol alphabet (same spirit as the synthetic fallbacks in
  data/datasets.py — structure a model can learn, no external data)."""
  rs = np.random.RandomState(seed)
  table = rs.randint(0, 64, size=(64, 64))
  out = np.empty(n, np.int64)
  out[0], out[1] = 1, 2
  noise = rs.rand(n)
  rand_sym = rs.randint(0, 64, size=n)
  for i in range(2, n):
    out[i] = rand_sym[i] if noise[i] < 0.1 else \
        table[out[i - 2], out[i - 1]]
  return out.astype(np.int32)


def load_tokens():
  if FLAGS.data_file:
    raw = np.fromfile(FLAGS.data_file, dtype=np.uint8)
    if len(raw) < 10 * (FLAGS.seq_len + 1):
      raise ValueError(f'--data_file too small: {len(raw)} bytes')
    return raw.astype(np.int32), 256, 'file:' + os.path.basename(
        FLAGS.data_file)
  return synthetic_stream(seed=FLAGS.seed), 64, 'synthetic'


def main(argv):
  del argv
  from rigl_tpu.train.packed_lm import PackedLMConfig, PackedLMTrainer

  if FLAGS.training_method not in ('rigl', 'set', 'momentum', 'static'):
    raise ValueError('packed LM driver supports rigl / set / momentum '
                     '(SNFS) drop/grow or static (frozen topology), got '
                     f'{FLAGS.training_method!r}')
  # 'momentum' is the reference's name for SNFS (sparse_optimizers.py:126);
  # static freezes topology via end_step=0 and rides the rigl code path.
  algo = {'rigl': 'rigl', 'static': 'rigl', 'set': 'set',
          'momentum': 'snfs'}[FLAGS.training_method]

  tokens, vocab, source = load_tokens()
  split = int(len(tokens) * 0.9)
  train_tokens, eval_tokens = tokens[:split], tokens[split:]

  cfg = PackedLMConfig(
      vocab_size=vocab,
      num_layers=FLAGS.num_layers,
      d_model=FLAGS.d_model,
      d_ff=FLAGS.d_ff,
      num_heads=FLAGS.num_heads,
      seq_len=FLAGS.seq_len,
      sparsity=FLAGS.end_sparsity,
      # --mask_init_method (common flag, default erdos_renyi_kernel like
      # the reference's imagenet trainer) now reaches packed storage:
      # per-layer ERK n_active via sparsity/layer_sparsity.py.
      sparsity_distribution=FLAGS.mask_init_method,
      erk_power_scale=FLAGS.erk_power_scale,
      block=tuple(int(b) for b in FLAGS.packed_block.split(',')),
      bm=FLAGS.packed_bm,
      dtype=FLAGS.lm_dtype,
      learning_rate=FLAGS.learning_rate,
      warmup_steps=FLAGS.warmup_steps,
      train_steps=int(FLAGS.train_steps * FLAGS.training_steps_multiplier),
      batch_size=FLAGS.batch_size,
      maskupdate_begin_step=FLAGS.maskupdate_begin_step,
      maskupdate_end_step=(0 if FLAGS.training_method == 'static'
                           else FLAGS.maskupdate_end_step),
      maskupdate_frequency=FLAGS.maskupdate_frequency,
      drop_fraction=FLAGS.drop_fraction,
      drop_fraction_anneal=(FLAGS.drop_fraction_anneal
                            if FLAGS.training_method != 'static' else
                            'constant'),
      seed=FLAGS.seed,
      algo=algo,
      snfs_momentum=FLAGS.snfs_momentum,
      n_data=FLAGS.n_data,
      n_model=FLAGS.n_model,
      n_pipe=FLAGS.n_pipe,
      n_micro=FLAGS.n_micro,
      n_seq=FLAGS.n_seq,
      n_experts=FLAGS.n_experts,
      capacity_factor=FLAGS.capacity_factor,
      aux_loss_weight=FLAGS.aux_loss_weight,
      n_expert=FLAGS.n_expert)

  trainer = PackedLMTrainer(cfg)
  if FLAGS.output_dir and trainer.restore(FLAGS.output_dir):
    print(f'# resumed at step {trainer.step}')

  result = trainer.train(train_tokens, eval_tokens=eval_tokens,
                         progress_fn=lambda m: print(m),
                         log_every=FLAGS.log_every)
  result['data_source'] = source
  result['vocab_size'] = vocab
  result['sparsity_distribution'] = FLAGS.mask_init_method

  if FLAGS.output_dir:
    trainer.save(FLAGS.output_dir)
    with open(os.path.join(FLAGS.output_dir, 'result.json'), 'w') as f:
      json.dump(result, f, indent=2)

  if FLAGS.generate_steps:
    if FLAGS.generate_prompt:
      prompt = np.frombuffer(FLAGS.generate_prompt.encode('utf-8'),
                             np.uint8).astype(np.int32) % vocab
    else:
      prompt = np.asarray(train_tokens[:32], np.int32)
    out = trainer.generate(prompt, FLAGS.generate_steps,
                           temperature=FLAGS.generate_temperature,
                           top_k=FLAGS.generate_top_k,
                           top_p=FLAGS.generate_top_p,
                           kv_chunk=FLAGS.generate_kv_chunk,
                           seed=FLAGS.seed)
    result['generated_tokens'] = out[0].tolist()
    if vocab == 256:
      result['generated_text'] = bytes(
          out[0].tolist()).decode('utf-8', errors='replace')

  print(json.dumps(result, indent=2))
  return result


if __name__ == '__main__':
  app.run(main)
