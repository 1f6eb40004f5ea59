#!/bin/bash
# BEIR 13-dataset sparse evaluation loop (reference
# scripts/beir/eval_beir_sparse.sh:10-56): 512/512 max lengths, top_k=100,
# NDCG@10 / Recall@100 / R_cap@100 with self-match removal, then averaging.
# Datasets must be pre-downloaded locally (zero-egress): $BEIR_DIR/<name>/
# with corpus.jsonl, queries.jsonl, qrels/test.tsv.
set -eu

MODEL=${MODEL:?path to Lion-SP adapter dir}
BEIR_DIR=${BEIR_DIR:?dir containing beir datasets}
OUT=${OUT:-runs/beir_sparse}

DATASETS=${DATASETS:-"arguana fiqa nfcorpus quora scidocs scifact trec-covid webis-touche2020 climate-fever dbpedia-entity fever hotpotqa nq"}

for DS in $DATASETS; do
  IDX="$OUT/$DS/index"
  python -m scaling_retriever_tpu.evaluation.eval_sparse \
    --task_name indexing --model_name_or_path "$MODEL" \
    --is_beir --beir_dataset "$DS" --beir_dataset_dir "$BEIR_DIR" \
    --index_dir "$IDX" --eval_batch_size 32 --doc_max_length 512
  python -m scaling_retriever_tpu.evaluation.eval_sparse \
    --task_name retrieval --model_name_or_path "$MODEL" \
    --is_beir --beir_dataset "$DS" --beir_dataset_dir "$BEIR_DIR" \
    --index_dir "$IDX" --out_dir "$OUT/$DS" \
    --eval_batch_size 32 --query_max_length 512 --top_k 100
  python -m scaling_retriever_tpu.evaluation.eval_sparse \
    --task_name evaluate_beir \
    --is_beir --beir_dataset "$DS" --beir_dataset_dir "$BEIR_DIR" \
    --out_dir "$OUT/$DS"
done

python -m scaling_retriever_tpu.evaluation.beir_results --beir_eval_dir "$OUT"
