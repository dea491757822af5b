#!/bin/bash
# Round-5 accuracy sweeps on the real chip, sequential (one chip).
#
# 1) CAPACITY-BOUND s=0.8 (VERDICT-r4 item 4): shrink the model until
#    capacity binds at s=0.8 on the SAME frozen corpus — d_model 384,
#    d_ff 1536 puts the s=0.8 active-parameter count (~708k) at the
#    r4 d512@s=0.9 regime (~630k) where RigL won 3/3 seeds.  3 seeds,
#    dense/rigl/static.
# 2) ERK byte-LM rows (VERDICT-r4 item 1 done-criterion): d512 s=0.8
#    rigl+static with per-layer ERK, 3 seeds — directly comparable to the
#    r4 uniform d512 s=0.8 table (dense baseline 1.429 unchanged).
set -u
cd /root/repo
mkdir -p logs

echo "=== d384 capacity-bound s=0.8 sweep start $(date) ==="
LM_STEPS=10000 LM_SPARSITIES=0.8 LM_SEEDS=0,1,2 \
LM_ARMS=dense,packed_rigl,packed_static \
LM_D_MODEL=384 LM_D_FF=1536 LM_HEADS=8 LM_BLOCK=128,128 LM_BM=512 \
  python scripts/lm_bytes_accuracy.py \
  > logs/r5_d384_s08.json 2> logs/r5_d384_s08.log
rc=$?
echo "=== d384 sweep done $(date) rc=$rc ==="

echo "=== ERK d512 s=0.8 sweep start $(date) ==="
LM_STEPS=10000 LM_SPARSITIES=0.8 LM_SEEDS=0,1,2 \
LM_ARMS=packed_rigl,packed_static LM_DIST=erdos_renyi_kernel \
LM_D_MODEL=512 LM_D_FF=2048 LM_HEADS=8 LM_BLOCK=128,128 LM_BM=512 \
  python scripts/lm_bytes_accuracy.py \
  > logs/r5_erk_s08.json 2> logs/r5_erk_s08.log
rc=$?
echo "=== ERK sweep done $(date) rc=$rc ==="
