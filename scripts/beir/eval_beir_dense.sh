#!/bin/bash
# BEIR 13-dataset dense evaluation loop (reference
# scripts/beir/eval_beir_dense.sh): 512/512 max lengths, top_k=100,
# NDCG@10 / Recall@100 / R_cap@100 with self-match removal, then averaging.
# Datasets must be pre-downloaded locally (zero-egress): $BEIR_DIR/<name>/
# with corpus.jsonl, queries.jsonl, qrels/test.tsv.
set -eu

MODEL=${MODEL:?path to Lion-DS adapter dir}
BEIR_DIR=${BEIR_DIR:?dir containing beir datasets}
OUT=${OUT:-runs/beir_dense}

DATASETS=${DATASETS:-"arguana fiqa nfcorpus quora scidocs scifact trec-covid webis-touche2020 climate-fever dbpedia-entity fever hotpotqa nq"}

for DS in $DATASETS; do
  EMB="$OUT/$DS/doc_embeds"
  python -m scaling_retriever_tpu.evaluation.eval_dense \
    --task_name write_doc_embeds --model_name_or_path "$MODEL" \
    --is_beir --beir_dataset "$DS" --beir_dataset_dir "$BEIR_DIR" \
    --doc_embed_dir "$EMB" --eval_batch_size 32 --doc_max_length 512
  python -m scaling_retriever_tpu.evaluation.eval_dense \
    --task_name retrieval --model_name_or_path "$MODEL" \
    --is_beir --beir_dataset "$DS" --beir_dataset_dir "$BEIR_DIR" \
    --doc_embed_dir "$EMB" --out_dir "$OUT/$DS" \
    --eval_batch_size 32 --query_max_length 512 --top_k 100
  python -m scaling_retriever_tpu.evaluation.eval_dense \
    --task_name evaluate_beir \
    --is_beir --beir_dataset "$DS" --beir_dataset_dir "$BEIR_DIR" \
    --out_dir "$OUT/$DS"
done

python -m scaling_retriever_tpu.evaluation.beir_results --beir_eval_dir "$OUT"
