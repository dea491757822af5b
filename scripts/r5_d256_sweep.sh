#!/bin/bash
# Round-5 follow-up: d256 at s=0.8 — the most capacity-starved probe
# (active ~314k params, half of the r4 d512@s0.9 regime where RigL won
# 3/3).  If RigL wins seed-robustly here, capacity binding DOES produce
# the s=0.8 ordering when severe enough; if still noise, the
# discriminator is the sparsity level, not active-parameter count.
set -u
cd /root/repo
mkdir -p logs
echo "=== d256 s=0.8 sweep start $(date) ==="
LM_STEPS=10000 LM_SPARSITIES=0.8 LM_SEEDS=0,1,2 \
LM_ARMS=dense,packed_rigl,packed_static \
LM_D_MODEL=256 LM_D_FF=1024 LM_HEADS=8 LM_BLOCK=128,128 LM_BM=512 \
  python scripts/lm_bytes_accuracy.py \
  > logs/r5_d256_s08.json 2> logs/r5_d256_s08.log
rc=$?
echo "=== d256 sweep done $(date) rc=$rc ==="
