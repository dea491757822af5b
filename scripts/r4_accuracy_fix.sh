#!/bin/bash
# Round-4 follow-up runs on the frozen corpus:
# 1) dense arm at its stable lr (3e-4; 1e-3 bounces on the plateau at
#    d_model 512 — measured, scripts/lm_bytes_accuracy.py comment), 3 seeds.
# 2) s=0.9 rigl/static, 3 seeds — re-validate the headline regime on the
#    frozen corpus.
# 3) moe_dense at the stable lr, 3 seeds (same stall fix for the MoE table).
set -u
cd /root/repo

echo "=== dense-lr rerun start $(date) ==="
LM_STEPS=10000 LM_SPARSITIES=0.8 LM_SEEDS=0,1,2 LM_ARMS=dense \
LM_D_MODEL=512 LM_D_FF=2048 LM_HEADS=8 LM_BLOCK=128,128 LM_BM=512 \
  python scripts/lm_bytes_accuracy.py > logs/r4_dense_fix.json 2> logs/r4_dense_fix.log
echo "=== s=0.9 rerun start $(date) ==="
LM_STEPS=10000 LM_SPARSITIES=0.9 LM_SEEDS=0,1,2 \
LM_ARMS=packed_rigl,packed_static \
LM_D_MODEL=512 LM_D_FF=2048 LM_HEADS=8 LM_BLOCK=128,128 LM_BM=512 \
  python scripts/lm_bytes_accuracy.py > logs/r4_s09_acc.json 2> logs/r4_s09_acc.log
echo "=== moe_dense rerun start $(date) ==="
LM_STEPS=10000 LM_SPARSITIES=0.8 LM_SEEDS=0,1,2 LM_ARMS=moe_dense \
LM_D_MODEL=512 LM_D_FF=2048 LM_HEADS=8 LM_BLOCK=128,128 LM_BM=512 \
  python scripts/lm_bytes_accuracy.py > logs/r4_moe_dense_fix.json 2> logs/r4_moe_dense_fix.log
echo "=== all done $(date) ==="
