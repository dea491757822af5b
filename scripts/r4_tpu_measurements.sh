#!/bin/bash
# Round-4 kernel/serving/model measurement queue (run sequentially on the
# free chip; each logs to logs/).
set -u
cd /root/repo
mkdir -p logs

echo "=== 1. mm-variant x rowmode bit-exactness $(date)"
timeout 1800 python scripts/check_mm_variants_tpu.py \
  > logs/r4_mm_variants.log 2>&1
echo "rc=$?"

echo "=== 2. fused-attention parity + seq-2048 trajectory $(date)"
timeout 3000 python scripts/check_fused_attention_tpu.py \
  > logs/r4_fused_attn.log 2>&1
echo "rc=$?"

echo "=== 3. decode bench: rowmode act (auto) vs dummy, batch 1 s=0.8 $(date)"
DEC_BATCH=1 RIGL_PACKED_MM_ROWMODE=act timeout 1800 \
  python scripts/bench_packed_decode.py > logs/r4_decode_b1_act.log 2>&1
DEC_BATCH=1 RIGL_PACKED_MM_ROWMODE=dummy timeout 1800 \
  python scripts/bench_packed_decode.py > logs/r4_decode_b1_dummy.log 2>&1
echo "rc=$?"

echo "=== 4. decode bench: batch 8 s=0.8 + mixed-length; s=0.9 $(date)"
DEC_BATCH=8 DEC_MIXED=1 timeout 2400 \
  python scripts/bench_packed_decode.py > logs/r4_decode_b8.log 2>&1
DEC_BATCH=8 DEC_SPARSITY=0.9 timeout 1800 \
  python scripts/bench_packed_decode.py > logs/r4_decode_b8_s09.log 2>&1
echo "rc=$?"

echo "=== 5. transformer train bench s=0.95: dummy vs act rowmode $(date)"
BENCH_WORKLOAD=transformer BENCH_SPARSITY=0.95 RIGL_PACKED_MM_ROWMODE=dummy \
  timeout 2400 python bench.py > logs/r4_tr095_dummy.log 2>&1
BENCH_WORKLOAD=transformer BENCH_SPARSITY=0.95 RIGL_PACKED_MM_ROWMODE=act \
  timeout 2400 python bench.py > logs/r4_tr095_act.log 2>&1
echo "rc=$?"

echo "=== 6. moe bench with gather dispatch $(date)"
BENCH_WORKLOAD=moe timeout 2400 python bench.py > logs/r4_moe_bench.log 2>&1
echo "rc=$?"

echo "=== 7. RN50 HBM accounting + small-batch inference $(date)"
timeout 5400 python scripts/rn50_packed_hbm.py > logs/r4_rn50_hbm.log 2>&1
echo "rc=$?"

echo "=== all done $(date)"
