#!/bin/bash
# Round-5 resume chain, part 2 (launched after stanza A of
# r5_resume_chain.sh): D (MBv1 HBM table, cheap, item-8 done-criterion)
# first, then B1/B2 transformer decomposition, then C, then d256.
set -u
cd /root/repo
mkdir -p logs
status() { echo "$(date -u +%H:%M:%S) $*" >> logs/r5_chain.status; }

status "4 D mbv1-hbm start"
python scripts/mbv1_packed_hbm.py > logs/r5_mbv1_hbm.json 2> logs/r5_mbv1_hbm.log
status "4 D done rc=$?"

status "3 B1 blocks start"
for blk in "512,512" "256,256" "128,128"; do
  echo "--- block=$blk"
  TR_BLOCK=$blk TR_SPARSITY=0.8 \
    python scripts/bench_packed_transformer.py 2>&1 | grep -v WARNING
done > logs/r5_tr_blocks.log 2>&1
status "3 B1 done rc=$?"

status "3 B2 seq start"
for cfg in "512 4" "256 8" "128 16"; do
  set -- $cfg
  echo "--- seq=$1 batch=$2"
  TR_SEQ=$1 TR_BATCH=$2 TR_SPARSITY=0.8 \
    python scripts/bench_packed_transformer.py 2>&1 | grep -v WARNING
done > logs/r5_tr_seq.log 2>&1
status "3 B2 done rc=$?"

status "5 C rn50-dense start"
{
  echo "--- baseline (batch 128)"
  BENCH_WORKLOAD=resnet50 python bench.py
  echo "--- batch 256"
  BENCH_WORKLOAD=resnet50 BENCH_BATCH=256 python bench.py
  echo "--- batch 512"
  BENCH_WORKLOAD=resnet50 BENCH_BATCH=512 python bench.py
} > logs/r5_rn50_dense.log 2>&1
status "5 C done rc=$?"

status "6 d256 start"
LM_STEPS=10000 LM_SPARSITIES=0.8 LM_SEEDS=0,1,2 \
LM_ARMS=dense,packed_rigl,packed_static \
LM_D_MODEL=256 LM_D_FF=1024 LM_HEADS=8 LM_BLOCK=128,128 LM_BM=512 \
  python scripts/lm_bytes_accuracy.py \
  > logs/r5_d256_s08.json 2> logs/r5_d256_s08.log
status "6 d256 done rc=$?"

status "chain2 done"
