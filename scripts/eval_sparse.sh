#!/bin/bash
# MSMARCO sparse evaluation pipeline (reference scripts/eval_sparse.sh).
# One JAX process drives all local chips; the sharded 2-rank build + offline
# merge below reproduces the reference artifact layout — on a multi-chip host
# you can instead index once and retrieve with --use_mesh (the index shards
# across chips in HBM and no merge step exists).
set -eu

MODEL=${MODEL:?path to Lion-SP adapter dir}
DATA=${DATA:?dir with corpus.tsv / queries tsv / qrel jsons}
OUT=${OUT:-runs/sparse}
INDEX_DIR=${INDEX_DIR:-$OUT/index}

# 1) sharded index build (2 shards, reference eval_sparse.sh:14-19)
for RANK in 0 1; do
  python -m scaling_retriever_tpu.evaluation.eval_sparse \
    --task_name indexing \
    --model_name_or_path "$MODEL" \
    --corpus_path "$DATA/corpus.tsv" \
    --index_dir "$INDEX_DIR" \
    --eval_batch_size 64 --doc_max_length 192 \
    --rank $RANK --world_size 2
done

# 2) merge shards (reference scripts/eval_sparse.sh:21-22)
python - <<PY
import json
from scaling_retriever_tpu.index.inverted_index import merge_indexes
with open("$MODEL/config.json") as f:
    dim_voc = json.load(f).get("vocab_size", 128256)
merge_indexes(["${INDEX_DIR}_0", "${INDEX_DIR}_1"], "$INDEX_DIR", dim_voc)
PY

# 3) retrieval, top-1000 (reference eval_sparse.sh:24-50)
python -m scaling_retriever_tpu.evaluation.eval_sparse \
  --task_name retrieval \
  --model_name_or_path "$MODEL" \
  --query_path "$DATA/queries.dev.tsv" \
  --index_dir "$INDEX_DIR" --out_dir "$OUT/dev" \
  --eval_batch_size 64 --query_max_length 64 --top_k 1000

# 4) metrics: Dev mrr_10+recall; TREC DL ndcg_cut on qrel, mrr/recall on
#    qrel_binary (reference eval_sparse.sh:52-117, metrics.py:67-83)
python -m scaling_retriever_tpu.evaluation.eval_sparse \
  --task_name evaluate_msmarco \
  --eval_qrel_path "$DATA/qrel.json" \
  --eval_run_path "$OUT/dev/run.json" \
  --eval_metric "['mrr_10','recall']" --out_dir "$OUT/dev"

for YEAR in 2019 2020; do
  QDIR="$DATA/TREC_DL_$YEAR"
  [ -d "$QDIR" ] || continue
  python -m scaling_retriever_tpu.evaluation.eval_sparse \
    --task_name retrieval --model_name_or_path "$MODEL" \
    --query_path "$QDIR/queries.tsv" --index_dir "$INDEX_DIR" \
    --out_dir "$OUT/trec_$YEAR" --eval_batch_size 64 \
    --query_max_length 64 --top_k 1000
  python -m scaling_retriever_tpu.evaluation.eval_sparse \
    --task_name evaluate_msmarco \
    --eval_qrel_path "$QDIR/qrel.json" \
    --eval_run_path "$OUT/trec_$YEAR/run.json" \
    --eval_metric "['ndcg_cut']" --out_dir "$OUT/trec_$YEAR"
  python -m scaling_retriever_tpu.evaluation.eval_sparse \
    --task_name evaluate_msmarco \
    --eval_qrel_path "$QDIR/qrel_binary.json" \
    --eval_run_path "$OUT/trec_$YEAR/run.json" \
    --eval_metric "['mrr_10','recall']" --out_dir "$OUT/trec_${YEAR}_binary"
done
