#!/bin/bash
# Interleaved A/B of the ANN/kmeans/semantic family: working tree (B, the
# r14 row-local rewrite) vs HEAD (A) — B, A, B order with per-run canaries
# (the r14 measurement-continuity protocol: within one quiet session only).
set -e
cd /root/repo
QS="ann_ivf_topk ann_pq_topk ann_ivfpq_topk ann_srp_topk embedding_cosine_topk kmeans_2iter semantic_dedup semantic_incremental ann_clustered_recall ann_index_lifecycle"
echo "=== RUN 1: B (working tree) ==="
python tools/time_extras.py --passes 2 $QS 2>/tmp/ab_b1.err | tee /tmp/ab_b1.json
git stash push -m "r14 ann rewrite AB" datalake_spark/operators/similarity.py datalake_spark/operators/ann_index.py
echo "=== RUN 2: A (HEAD) ==="
python tools/time_extras.py --passes 2 $QS 2>/tmp/ab_a1.err | tee /tmp/ab_a1.json
git stash pop
echo "=== RUN 3: B (working tree) ==="
python tools/time_extras.py --passes 2 $QS 2>/tmp/ab_b2.err | tee /tmp/ab_b2.json
echo "=== DONE ==="
