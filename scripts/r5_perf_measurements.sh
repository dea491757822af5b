#!/bin/bash
# Round-5 perf measurement session (one chip, sequential).
#
# A) Decode batch-8 attribution (VERDICT-r4 item 3): is the b8-vs-b1 gap
#    per-call dispatch (fixed, layer-count-linear) or KV-cache bytes
#    (MAXLEN/batch-linear)?  Roofline arithmetic: weights s=0.8 packed
#    ~77MB; KV cache = 2*B*h*L*hd*2B*layers = 67MB at b8/L256 vs 8.4MB at
#    b1 — if KV-linear, b8 is AT its weight+KV roofline and the <=150us
#    target is below the physical floor (the RN50-0.6x-style verdict).
#    Sweep: (batch, maxlen) at fixed model; prompt=steps=128 always.
# B) Transformer train-step decomposition (VERDICT-r4 item 2): e2e deltas
#    only (PERF.md methodology).
#    B1 block-size sweep at fixed s=0.8 (512/256/128 blocks: 1x/4x/16x
#       entry count, same active FLOPs) -> per-entry overhead slope.
#    B2 seq/batch sweep at fixed tokens (512x4 / 256x8 / 128x16): param
#       matmul mass constant, attention mass ~halves each step ->
#       attention share of the shared mass.
set -u
cd /root/repo
mkdir -p logs

echo "=== A: decode attribution $(date) ==="
{
  for cfg in "1 256" "8 256" "8 512" "8 1024" "4 256" "16 256"; do
    set -- $cfg
    echo "--- batch=$1 maxlen=$2"
    DEC_BATCH=$1 DEC_MAXLEN=$2 DEC_SPARSITY=0.8 \
      python scripts/bench_packed_decode.py 2>&1 | grep -v WARNING
  done
  # Chunked cache attention: live-prefix-proportional KV reads — the
  # over-allocated-cache row (L=1024, live <=256) should fall back to
  # ~the L=256 step time; the tight row (L=256, chunk 128) saves the
  # ~25% average-live margin.
  for cfg in "8 1024 256" "8 1024 128" "8 256 128" "1 1024 256"; do
    set -- $cfg
    echo "--- batch=$1 maxlen=$2 kv_chunk=$3"
    DEC_BATCH=$1 DEC_MAXLEN=$2 DEC_KV_CHUNK=$3 DEC_SPARSITY=0.8 \
      python scripts/bench_packed_decode.py 2>&1 | grep -v WARNING
  done
} > logs/r5_decode_attrib.log 2>&1
echo "=== A done $(date) ==="

echo "=== B1: block-size sweep $(date) ==="
for blk in "512,512" "256,256" "128,128"; do
  echo "--- block=$blk"
  TR_BLOCK=$blk TR_SPARSITY=0.8 \
    python scripts/bench_packed_transformer.py 2>&1 | grep -v WARNING
done > logs/r5_tr_blocks.log 2>&1
echo "=== B1 done $(date) ==="

echo "=== B2: seq/batch sweep $(date) ==="
for cfg in "512 4" "256 8" "128 16"; do
  set -- $cfg
  echo "--- seq=$1 batch=$2"
  TR_SEQ=$1 TR_BATCH=$2 TR_SPARSITY=0.8 \
    python scripts/bench_packed_transformer.py 2>&1 | grep -v WARNING
done > logs/r5_tr_seq.log 2>&1
echo "=== B2 done $(date) ==="

echo "=== C: dense-RN50 roofline attempts $(date) ==="
# VERDICT-r4 item 7: dense arm at 74% of unfused roofline — one measured
# attempt per lever; bench.py reports both arms so any dense win lifts
# vs_baseline's denominator honestly.
{
  echo "--- baseline (batch 128)"
  BENCH_WORKLOAD=resnet50 python bench.py
  echo "--- batch 256 (amortize BN/elementwise)"
  BENCH_WORKLOAD=resnet50 BENCH_BATCH=256 python bench.py
  echo "--- batch 512"
  BENCH_WORKLOAD=resnet50 BENCH_BATCH=512 python bench.py
} > logs/r5_rn50_dense.log 2>&1
echo "=== C done $(date) ==="

echo "=== D: MBv1 packed HBM table $(date) ==="
python scripts/mbv1_packed_hbm.py > logs/r5_mbv1_hbm.json 2> logs/r5_mbv1_hbm.log
rc=$?
echo "=== D done $(date) rc=$rc ==="
