"""Benchmark: sparse-vs-dense train-step wall clock, 1 chip.

Default (BENCH_WORKLOAD=all) runs EVERY arm — mlp, transformer, moe,
resnet50 — printing one JSON line per arm and a final summary line (the
driver parses the LAST line):
  {"metric": "bench_all", "value": <mlp ratio>, "vs_baseline": <mlp ratio>,
   "arms": {mlp: {...}, transformer: {...}, moe: {...}, resnet50: {...}}}
so the flagship ResNet-50 figure stays in the round-over-round record next
to the packed-engine arms.  vs_baseline > 1.0 means the sparse step is
faster than the dense step; the north-star target is sparse step time
<= 0.6x dense (vs_baseline >= 1.667).

Arms (run one with BENCH_WORKLOAD=mlp|transformer|moe|resnet50):
  mlp — 3x4096 MLP train step, PACKED block-sparse storage
      (weights/grads/momentum all (n_active, bk, bn)) vs an equal-dtype
      dense baseline.  The compute-bound regime where weight sparsity
      converts to wall clock; measured r2 (PERF.md + BENCH_r02): 2.26x
      gross at s=0.8 (driver capture 2.65x), 2.93x at s=0.9; net of the
      harness floor 0.288x / 0.130x of dense.
  transformer — 2-layer decoder (d_model 2048, d_ff 8192, seq 512) with
      every parameter matmul on packed storage vs the equal-dtype dense
      twin; attention/LN mass dense in both arms.  Measured r3 (x-sliced
      mm variant): 1.74-1.78x gross at s=0.8, 2.02x at s=0.9, 2.54x at
      s=0.95 (net 0.505x / 0.441x / 0.328x, PERF.md r3 session).
  moe — 2-layer Switch top-1 MoE decoder (8 experts, d_model 1024,
      d_ff 4096) with expert kernels on expert-stacked packed storage vs
      the identical-routing dense twin.  Measured r2: 1.61x / 1.86x gross
      at s=0.8 / 0.9 (scripts/bench_packed_moe.py, PERF.md s7).
  resnet50 — ResNet-50 RigL @80% ERK vs dense, the reference's own
      headline model.  Pinned at ~1.0x STRUCTURALLY: the step is
      activation-HBM-bound, so weight sparsity cannot beat dense there
      (roofline + measurements in PERF.md; the reference's TF/TPU
      implementation also runs dense-speed math under masks).  Sparse
      training at dense speed with O(density) checkpoint export is the
      honest RN50 result.

Every arm also reports achieved matmul TF/s and MFU for both the dense arm
and the packed arm's ACTIVE FLOPs, against the measured bf16 peak
(BENCH_PEAK_TFLOPS, default 197 — the MXU speed-of-light measured on this
v5e in PERF.md).  FLOPs are analytic matmul counts (fwd+dgrad+wgrad = 3x
forward); attention/router/dispatch mass is counted in both arms, packed
parameter matmuls scale by (1 - sparsity).  MFU is reported on gross step
time and omitted on CPU smoke runs.

Runs on whatever jax.default_backend() provides (real TPU under the driver);
scales shapes down automatically on CPU so it stays runnable anywhere.
"""

import json
import os
import sys
import time

import numpy as np

PEAK_TFLOPS = float(os.environ.get('BENCH_PEAK_TFLOPS', 197.0))


def _mfu_fields(result, t_dense, t_sparse, dense_flops, sparse_flops):
  """Achieved TF/s + MFU on gross step times; device peak from
  BENCH_PEAK_TFLOPS (measured MXU speed-of-light, PERF.md)."""
  import jax
  if jax.default_backend() == 'cpu':
    return result
  tf_dense = dense_flops / t_dense / 1e12
  tf_sparse = sparse_flops / t_sparse / 1e12
  result.update(
      tflops_dense=round(tf_dense, 1),
      tflops_packed_active=round(tf_sparse, 1),
      mfu_dense=round(tf_dense / PEAK_TFLOPS, 3),
      mfu_packed_active=round(tf_sparse / PEAK_TFLOPS, 3))
  return result


def _execution_fields(storage: str, **extra):
  """Self-describing execution mode per arm (VERDICT r4 item 6): storage
  ('packed' = (n_active, bk, bn) block storage with block-skipping
  kernels; 'dense-masked' = dense-shape math under premasked params —
  the measured-routing answer for activation-bound RN50), plus the
  packed-kernel mode knobs so a BENCH json is interpretable standalone."""
  out = {'storage': storage,
         'rowmode': os.environ.get('RIGL_PACKED_MM_ROWMODE', 'auto'),
         'variant': os.environ.get('RIGL_PACKED_MM_VARIANT', 'auto')}
  out.update(extra)
  return out


def _bench_step(step_fn, state, batch, warmup: int, iters: int,
                update_fn=None, update_iters=()):
  """Times `iters` *chained* train steps (each consumes the previous state)
  and synchronizes on a host readback of the final loss.

  Rationale: under the remote (axon) backend, `block_until_ready` on donated
  outputs returns before execution finishes, which produced impossible
  >peak-FLOPs numbers.  The state chain forces sequential execution and the
  final value readback bounds total device time; per-call dispatch overhead
  is amortized and small relative to a ResNet-50 train step.  (Wrapping the
  chain in lax.scan would remove dispatch entirely, but that program shape
  stalls the remote compiler.)

  `update_fn`/`update_iters`: host-gated schedule specialization — the
  predicted mask-update iterations (all inside warmup; asserted by the
  caller) run the update program, everything else the plain program.
  """
  import jax
  run = jax.jit(step_fn, donate_argnums=0)
  run_upd = (jax.jit(update_fn, donate_argnums=0)
             if update_fn is not None else None)
  for i in range(warmup):
    fn = run_upd if i in update_iters else run
    state, metrics = fn(state, batch)
  if warmup == 0 or all(i in update_iters for i in range(warmup)):
    # The timed program must compile+run at least once before timing.
    state, metrics = run(state, batch)
  _ = float(metrics['loss'])
  t0 = time.perf_counter()
  for _ in range(iters):
    state, metrics = run(state, batch)
  _ = float(metrics['loss'])
  return (time.perf_counter() - t0) / iters, state


def main_mlp():
  """BENCH_WORKLOAD=mlp: the compute-bound workload where block sparsity
  converts to wall-clock (PERF.md round-2 session 3) — 3x4096 MLP train
  step, packed block-sparse storage vs dense.  The RN50 default remains the
  headline (reference's own model); this arm is the north-star
  demonstration: the roofline proves weight sparsity cannot beat dense on
  activation-HBM-bound RN50@224, and DOES convert where matmuls sit above
  the ridge."""
  import jax
  sparsity = float(os.environ.get('BENCH_SPARSITY', '0.8'))
  os.environ.setdefault('MLP_SPARSITY', str(sparsity))
  os.environ.setdefault('MLP_ENGINE', 'packed')
  if jax.default_backend() == 'cpu':
    # Interpret-mode pallas on the 1-core box: shrink to a smoke size.
    os.environ.setdefault('MLP_WIDTH', '1024')
    os.environ.setdefault('MLP_BATCH', '256')
    os.environ.setdefault('MLP_ITERS', '2')
  sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
  from scripts import bench_blocksparse_mlp as b
  t_dense, t_sparse = b.main()
  result = {
      'metric': (f'mlp{b.DEPTH}x{b.WIDTH}_packed{int(sparsity * 100)}'
                 '_train_step_speedup_vs_dense'),
      'value': round(t_dense / t_sparse, 4),
      'unit': 'x dense (gross step ratio)',
      'vs_baseline': round(t_dense / t_sparse, 4),
      'execution': _execution_fields(
          'packed', engine=os.environ.get('MLP_ENGINE', 'packed'),
          sparsity=sparsity),
  }
  fwd = b.DEPTH * 2.0 * b.BATCH * b.WIDTH * b.WIDTH
  return _mfu_fields(result, t_dense, t_sparse, 3 * fwd,
                     3 * fwd * (1 - sparsity))


def main_transformer():
  """BENCH_WORKLOAD=transformer: packed block-sparse transformer train
  step vs its dense twin (scripts/bench_packed_transformer.py) — the
  compute-bound demonstration on the model family production cares
  about.  Attention math and LayerNorms are dense in BOTH arms, so the
  gross ratio honestly carries the mass weight sparsity cannot touch."""
  import jax
  sparsity = float(os.environ.get('BENCH_SPARSITY', '0.8'))
  os.environ.setdefault('TR_SPARSITY', str(sparsity))
  # TR_FUSED=1 swaps the flash-attention core into BOTH arms (TPU only;
  # parity: scripts/check_fused_attention_tpu.py).  Off by default: at the
  # bench's seq 512 the unfused XLA path is FASTER in both arms (measured
  # r3: dense 9.06 -> 10.43 ms, net ratio 0.505 -> 0.602 at s=0.8); the
  # kernel wins only in the long-sequence regime (see PERF.md).
  if jax.default_backend() == 'cpu':
    # Interpret-mode pallas on the 1-core box: shrink to a smoke size.
    os.environ.setdefault('TR_D_MODEL', '256')
    os.environ.setdefault('TR_D_FF', '512')
    os.environ.setdefault('TR_SEQ', '64')
    os.environ.setdefault('TR_BATCH', '2')
    os.environ.setdefault('TR_ITERS', '2')
    os.environ.setdefault('TR_BLOCK', '128,128')
    os.environ.setdefault('TR_BM', '128')
  sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
  from scripts import bench_packed_transformer as b
  t_dense, t_packed = b.main()
  result = {
      'metric': (f'transformer{b.LAYERS}x{b.D_MODEL}'
                 f'_packed{int(float(os.environ["TR_SPARSITY"]) * 100)}'
                 '_train_step_speedup_vs_dense'),
      'value': round(t_dense / t_packed, 4),
      'unit': 'x dense (gross step ratio)',
      'vs_baseline': round(t_dense / t_packed, 4),
      'execution': _execution_fields(
          'packed', fused_attention=bool(int(os.environ.get('TR_FUSED',
                                                            '0'))),
          sparsity=float(os.environ['TR_SPARSITY'])),
  }
  s = float(os.environ['TR_SPARSITY'])
  tok = b.BATCH * b.SEQ
  # Per layer fwd: fused QKV (d->3d) + out (d->d) + FFN (d->ff->d);
  # attention score/value matmuls ride in BOTH arms.
  param_fwd = b.LAYERS * 2.0 * tok * (
      b.D_MODEL * 3 * b.D_MODEL + b.D_MODEL * b.D_MODEL
      + 2 * b.D_MODEL * b.D_FF)
  attn_fwd = b.LAYERS * 2.0 * 2 * b.BATCH * b.SEQ * b.SEQ * b.D_MODEL
  return _mfu_fields(result, t_dense, t_packed, 3 * (param_fwd + attn_fwd),
                     3 * (param_fwd * (1 - s) + attn_fwd))


def main_moe():
  """BENCH_WORKLOAD=moe: packed expert-stacked MoE train step vs its
  dense twin (scripts/bench_packed_moe.py).  Router/dispatch/combine and
  attention/LN mass are identical in both arms; the delta is the expert
  and projection matmuls' storage/compute representation."""
  import jax
  sparsity = float(os.environ.get('BENCH_SPARSITY', '0.8'))
  os.environ.setdefault('MOE_SPARSITY', str(sparsity))
  if jax.default_backend() == 'cpu':
    os.environ.setdefault('MOE_D_MODEL', '64')
    os.environ.setdefault('MOE_D_FF', '128')
    os.environ.setdefault('MOE_HEADS', '4')
    os.environ.setdefault('MOE_SEQ', '32')
    os.environ.setdefault('MOE_BATCH', '2')
    os.environ.setdefault('MOE_EXPERTS', '4')
    os.environ.setdefault('MOE_ITERS', '2')
    os.environ.setdefault('MOE_BLOCK', '16,16')
    os.environ.setdefault('MOE_BM', '32')
  sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
  from scripts import bench_packed_moe as b
  t_dense, t_packed = b.main()
  result = {
      'metric': (f'moe{b.LAYERS}x{b.D_MODEL}x{b.EXPERTS}e'
                 f'_packed{int(float(os.environ["MOE_SPARSITY"]) * 100)}'
                 '_train_step_speedup_vs_dense'),
      'value': round(t_dense / t_packed, 4),
      'unit': 'x dense (gross step ratio)',
      'vs_baseline': round(t_dense / t_packed, 4),
      'execution': _execution_fields(
          'packed', dispatch='gather',
          sparsity=float(os.environ['MOE_SPARSITY'])),
  }
  s = float(os.environ['MOE_SPARSITY'])
  tok = b.BATCH * b.SEQ
  # USEFUL-flop model (VERDICT r4 item 6): expert mass counts ROUTED
  # tokens (each token through one expert's 2 FFN matmuls — the drop-free
  # ideal), NOT the capacity_factor-padded slots the MXU actually runs;
  # the gather-form dispatch/combine (r4) is data movement, not matmul
  # FLOPs, so it contributes nothing.  MFU here is utilization on useful
  # work and stays <= 1 at every batch; the capacity padding shows up as
  # lower MFU, which is the honest reading.
  param_fwd = b.LAYERS * 2.0 * (
      tok * (b.D_MODEL * 3 * b.D_MODEL + b.D_MODEL * b.D_MODEL)
      + tok * 2 * b.D_MODEL * b.D_FF)
  shared_fwd = b.LAYERS * 2.0 * (
      2 * b.BATCH * b.SEQ * b.SEQ * b.D_MODEL      # attention
      + tok * b.EXPERTS * b.D_MODEL)               # router
  return _mfu_fields(result, t_dense, t_packed,
                     3 * (param_fwd + shared_fwd),
                     3 * (param_fwd * (1 - s) + shared_fwd))


def main():
  import jax
  import jax.numpy as jnp
  import optax
  from rigl_tpu.models import registry
  from rigl_tpu.sparsity.schedules import UpdateSchedule
  from rigl_tpu.train import steps
  from rigl_tpu.transforms import algorithms
  from rigl_tpu.transforms.sparse_training import SparseTraining

  backend = jax.default_backend()
  on_tpu = backend not in ('cpu',)
  batch = int(os.environ.get('BENCH_BATCH', 128 if on_tpu else 8))
  image = int(os.environ.get('BENCH_IMAGE', 224 if on_tpu else 32))
  iters = int(os.environ.get('BENCH_ITERS', 20 if on_tpu else 3))
  warmup = int(os.environ.get('BENCH_WARMUP', 5 if on_tpu else 1))
  depth = int(os.environ.get('BENCH_DEPTH', 50 if on_tpu else 18))
  # BENCH_DIST: erdos_renyi_kernel (default) | uniform | erdos_renyi —
  # uniform@80 is a published operating point (74.6 top-1, README.md:66)
  # that puts sparsity where the step time is (group1/2), unlike ERK
  # which keeps those layers dense-ish.
  dist = os.environ.get('BENCH_DIST', 'erdos_renyi_kernel')
  sparsity = float(os.environ.get('BENCH_SPARSITY', '0.8'))
  # BENCH_BLOCK="128,128" -> block-granular masks + block-skipping execution
  # of eligible 1x1 convs in the sparse arm (models/common.py _BlockConv).
  block_env = os.environ.get('BENCH_BLOCK', '')
  block = tuple(int(v) for v in block_env.split(',')) if block_env else None
  block_bm = int(os.environ.get('BENCH_BLOCK_BM', 512))
  block_conv3x3 = bool(int(os.environ.get('BENCH_BLOCK_CONV3X3', '0')))
  block_min_sparsity = float(os.environ.get('BENCH_BLOCK_MIN_SPARSITY', '0'))
  # BENCH_BLOCK_ROUTING=path.json -> measured per-layer routing table
  # ({mask path: 'dense'|'tap'|'matmul'}, scripts/bench_layer_routing.py).
  routing_file = os.environ.get('BENCH_BLOCK_ROUTING', '')
  block_routing = None
  if routing_file:
    with open(routing_file) as f:
      block_routing = json.load(f)

  def make(method):
    use_block = block if method == 'rigl' else None
    model = registry.create_model('resnet', depth=depth, num_classes=1000,
                                  dtype=jnp.bfloat16, block=use_block,
                                  block_bm=block_bm)
    algo = (algorithms.RigL(schedule=UpdateSchedule(
        begin_step=0, end_step=25000, frequency=100, drop_fraction=0.3,
        drop_fraction_anneal='cosine'))
            if method == 'rigl' else algorithms.DENSE)
    # Reference first/last-layer defaults (imagenet_train_eval.py:246-255):
    # first conv NOT masked (first_layer_sparsity=0), last dense masked at
    # the default sparsity.  ERK's solver forces the first conv ~dense by
    # itself; for uniform the exclusion is what makes the published
    # uniform@80 operating point (README.md:66).
    from rigl_tpu.sparsity import masks as masks_lib

    def mask_rule(path, leaf):
      if path.startswith('initial_conv'):
        return False
      return masks_lib.default_mask_rule(path, leaf)

    st = SparseTraining(optax.sgd(0.1, momentum=0.9, nesterov=True), algo,
                        distribution=dist,
                        default_sparsity=sparsity, block=use_block,
                        block_routing=block_routing,
                        mask_rule=mask_rule,
                        premask_params=(method == 'rigl'))
    state = steps.init_train_state(jax.random.key(0), model, st,
                                   (batch, image, image, 3))
    mk = lambda hint: steps.make_train_step(  # noqa: E731
        model, st, weight_decay=1e-4, label_smoothing=0.1, block=use_block,
        block_conv3x3=block_conv3x3, block_min_sparsity=block_min_sparsity,
        update_hint=hint)
    if method == 'rigl':
      # Host-gated schedule specialization: the timed hot loop runs the
      # plain program (no mask-update cond); predicted update iterations
      # (step 0 here) run the update program during warmup.
      return mk(False), mk(True), st, state
    return mk(None), None, st, state

  rng = np.random.default_rng(0)
  batch_data = {
      'image': rng.normal(0, 1, (batch, image, image, 3)).astype(np.float32),
      'label': rng.integers(0, 1000, (batch,)).astype(np.int32),
  }
  batch_data = jax.device_put(batch_data)

  sparse_fn, sparse_upd, st_s, sparse_state = make('rigl')
  hints = st_s.predict_update_iters(warmup + iters)
  assert not any(hints[warmup:]), (
      'mask updates inside the timed window; grow warmup or retune the '
      f'schedule (updates at {[i for i, h in enumerate(hints) if h]})')
  sparse_time, _ = _bench_step(
      sparse_fn, sparse_state, batch_data, warmup, iters,
      update_fn=sparse_upd,
      update_iters={i for i, h in enumerate(hints[:warmup]) if h})
  dense_fn, _, _, dense_state = make('dense')
  dense_time, _ = _bench_step(dense_fn, dense_state, batch_data, warmup,
                              iters)

  imgs_per_sec = batch / sparse_time
  tag = {'erdos_renyi_kernel': 'erk', 'erdos_renyi': 'er',
         'uniform': 'u'}.get(dist, dist)
  result = {
      'metric': (f'resnet{depth}_rigl_{tag}{int(sparsity * 100)}'
                 '_train_imgs_per_sec_per_chip'),
      'value': round(imgs_per_sec, 2),
      'unit': 'imgs/sec',
      'vs_baseline': round(dense_time / sparse_time, 4),
      # Self-description (VERDICT r4 item 6): with block=None the sparse
      # arm runs DENSE-SHAPE math under premasked params — the measured
      # routing verdict for activation-HBM-bound RN50@224 (PERF.md
      # roofline); sparse EXECUTION engages only with BENCH_BLOCK set.
      'execution': _execution_fields(
          'dense-masked' if block is None else 'block-sparse',
          block=list(block) if block else None, distribution=dist,
          sparsity=sparsity),
  }
  print(f'# backend={backend} batch={batch} image={image} block={block} '
        f'sparse_step={sparse_time * 1e3:.2f}ms '
        f'dense_step={dense_time * 1e3:.2f}ms', file=sys.stderr)
  # MFU on the reference's verified forward count (tests/test_flops.py
  # reproduces 8.2e9 multiply-adds at 224; scale by (image/224)^2), train
  # step = 3x forward.  RigL runs dense-shape math under masks here
  # (activation-HBM-bound roofline, PERF.md), so both arms carry the full
  # conv mass.
  fwd = 2.0 * batch * 8.2e9 * (image / 224.0) ** 2 * (depth / 50.0)
  return _mfu_fields(result, dense_time, sparse_time, 3 * fwd, 3 * fwd)


ARMS = {'mlp': main_mlp, 'transformer': main_transformer, 'moe': main_moe,
        'resnet50': main}


def main_all():
  """Every arm, one JSON line each, then the summary line the driver
  parses — so BENCH_r{N}.json carries all four arms every round and the
  flagship RN50 number never drops out of the record (VERDICT r2)."""
  arms = {}
  for name in ('mlp', 'transformer', 'moe', 'resnet50'):
    try:
      arms[name] = ARMS[name]()
    except Exception as e:  # noqa: BLE001 — record and keep benching
      arms[name] = {'error': f'{type(e).__name__}: {e}'}
    print(json.dumps({'arm': name, **arms[name]}), flush=True)
  headline = arms.get('mlp', {})
  print(json.dumps({
      'metric': 'bench_all_headline_' + headline.get('metric', 'failed'),
      'value': headline.get('value', 0.0),
      'unit': headline.get('unit', ''),
      'vs_baseline': headline.get('vs_baseline', 0.0),
      'arms': arms,
  }))


def _backend_alive(timeout_s: int = 240) -> bool:
  """Probe remote-backend init in a SUBPROCESS with a hard timeout.

  The axon tunnel's claim handshake blocks indefinitely inside jax
  backend init when the pool is unreachable (observed round 5: a wedged
  pool froze `jax.devices()` with no error for hours).  A hung bench
  would stall the whole round-end capture; failing fast records an
  error line instead.  Normal init over the tunnel is seconds, so 240 s
  is generous.  CPU-forced runs skip the probe.
  """
  if os.environ.get('JAX_PLATFORMS', '') == 'cpu':
    return True
  import subprocess
  try:
    subprocess.run(
        [sys.executable, '-c', 'import jax; jax.devices()'],
        timeout=timeout_s, check=True, capture_output=True)
    return True
  except Exception:
    return False


if __name__ == '__main__':
  if not _backend_alive():
    print(json.dumps({
        'metric': 'bench_backend_unavailable',
        'value': 0.0, 'unit': 'error', 'vs_baseline': 0.0,
        'error': 'remote TPU backend init timed out (axon tunnel '
                 'unreachable); see PERF.md round-5 outage note',
    }))
    sys.exit(0)
  _workload = os.environ.get('BENCH_WORKLOAD', 'all')
  if _workload == 'all':
    main_all()
  else:
    print(json.dumps(ARMS.get(_workload, main)()))
