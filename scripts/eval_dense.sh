#!/bin/bash
# MSMARCO dense evaluation pipeline (reference scripts/eval_dense.sh):
# sharded corpus encode -> npy chunks -> exact-IP retrieval -> metrics.
set -eu

MODEL=${MODEL:?path to Lion-DS adapter dir}
DATA=${DATA:?dir with corpus.tsv / queries tsv / qrel jsons}
OUT=${OUT:-runs/dense}
EMB_DIR=${EMB_DIR:-$OUT/doc_embeds}

for RANK in 0 1; do
  python -m scaling_retriever_tpu.evaluation.eval_dense \
    --task_name write_doc_embeds \
    --model_name_or_path "$MODEL" \
    --corpus_path "$DATA/corpus.tsv" \
    --doc_embed_dir "$EMB_DIR" \
    --eval_batch_size 128 --doc_max_length 192 \
    --rank $RANK --world_size 2
done

python -m scaling_retriever_tpu.evaluation.eval_dense \
  --task_name retrieval \
  --model_name_or_path "$MODEL" \
  --query_path "$DATA/queries.dev.tsv" \
  --doc_embed_dir "$EMB_DIR" --out_dir "$OUT/dev" \
  --eval_batch_size 128 --query_max_length 64 --top_k 1000

python -m scaling_retriever_tpu.evaluation.eval_dense \
  --task_name evaluate_msmarco \
  --eval_qrel_path "$DATA/qrel.json" \
  --eval_run_path "$OUT/dev/run.json" \
  --eval_metric "['mrr_10','recall']" --out_dir "$OUT/dev"
