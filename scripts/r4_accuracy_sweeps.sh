#!/bin/bash
# Round-4 accuracy sweeps on the real chip, run sequentially (one chip).
# 1) MoE accuracy (VERDICT #2): moe_rigl/moe_static/moe_dense, s=0.8/0.9, 3 seeds.
# 2) Frozen-corpus 6-seed s=0.8 table (VERDICT #5): dense/packed_rigl/packed_static.
set -u
cd /root/repo
mkdir -p logs

echo "=== MoE sweep start $(date) ==="
LM_STEPS=10000 LM_SPARSITIES=0.8,0.9 LM_SEEDS=0,1,2 \
LM_ARMS=moe_rigl,moe_static,moe_dense \
LM_D_MODEL=512 LM_D_FF=2048 LM_HEADS=8 LM_BLOCK=128,128 LM_BM=512 \
  python scripts/lm_bytes_accuracy.py > logs/r4_moe_acc.json 2> logs/r4_moe_acc.log
echo "=== MoE sweep done $(date) rc=$? ==="

echo "=== s=0.8 6-seed sweep start $(date) ==="
LM_STEPS=10000 LM_SPARSITIES=0.8 LM_SEEDS=0,1,2,3,4,5 \
LM_ARMS=dense,packed_rigl,packed_static \
LM_D_MODEL=512 LM_D_FF=2048 LM_HEADS=8 LM_BLOCK=128,128 LM_BM=512 \
  python scripts/lm_bytes_accuracy.py > logs/r4_s08_acc.json 2> logs/r4_s08_acc.log
echo "=== s=0.8 sweep done $(date) rc=$? ==="
