#!/bin/bash
# Parameterized dense LoRA training (reference scripts/msmarco/
# llama_{1b,3b,8b}_dense_lora_train_{cl,kd,cl-kd}.sh): single "rank" task,
# temperature T=0.01, no FLOPS regularizer.
set -eu

MODEL=${MODEL:?base model dir}
DATA=${DATA:?dir with corpus.tsv + train jsonl}
LOSS=${LOSS:-nce}
OUT=${OUT:-runs/train_dense_$LOSS}
MAX_STEPS=${MAX_STEPS:-1050}

case "$LOSS" in
  nce)        TRAIN_FILE=${TRAIN_FILE:-$DATA/train.jsonl} ;;
  kldiv|nce_kldiv) TRAIN_FILE=${TRAIN_FILE:-$DATA/train_with_scores.jsonl} ;;
  margin_mse) TRAIN_FILE=${TRAIN_FILE:-$DATA/qrel_added_teacher_scores.jsonl} ;;
esac

python -m scaling_retriever_tpu.training.train_dense \
  --model_name_or_path "$MODEL" \
  --corpus_path "$DATA/corpus.tsv" \
  --train_path "$TRAIN_FILE" \
  --output_dir "$OUT" \
  --loss_type "$LOSS" \
  --task_names rank --task_weights 1.0 \
  --T 0.01 \
  --lora_r 16 --lora_alpha 32 \
  --learning_rate 1e-4 --warmup_ratio 0.04 \
  --max_steps "$MAX_STEPS" \
  --per_device_train_batch_size ${BS:-8} \
  --gradient_accumulation_steps ${ACCUM:-16} \
  --n_negs ${N_NEGS:-16} \
  --query_max_length 64 --doc_max_length 128 \
  --bf16 --fsdp --logging_steps 50 --save_steps 500
