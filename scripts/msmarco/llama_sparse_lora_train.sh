#!/bin/bash
# Parameterized sparse LoRA training (covers the reference's 18-script
# {1B,3B,8B} x {cl,kd,cl-kd} matrix, scripts/msmarco/llama_*_sparse_*.sh):
#   LOSS=nce        -> "cl"  (contrastive, reference *_train_cl.sh)
#   LOSS=kldiv      -> "kd"
#   LOSS=margin_mse -> marginmse
#   LOSS=nce_kldiv  -> "cl-kd"
# Reference hyperparameters: effective batch 512 via 4 ranks x bs8 x accum16,
# 1050 steps/epoch on 532,751 examples, lr 1e-4, lora r16/alpha32, bf16,
# FLOPS reg q=0.01 d=0.008 with T=max_steps/3
# (scripts/msmarco/llama_1b_sparse_lora_train_cl.sh:26-96).
set -eu

MODEL=${MODEL:?base model dir (e.g. Llama-3.2-1B)}
DATA=${DATA:?dir with corpus.tsv + train jsonl}
LOSS=${LOSS:-nce}
OUT=${OUT:-runs/train_sparse_$LOSS}
MAX_STEPS=${MAX_STEPS:-1050}
BS=${BS:-8}
ACCUM=${ACCUM:-16}
N_NEGS=${N_NEGS:-16}

case "$LOSS" in
  nce)        TRAIN_FILE=${TRAIN_FILE:-$DATA/train.jsonl} ;;
  kldiv|nce_kldiv) TRAIN_FILE=${TRAIN_FILE:-$DATA/train_with_scores.jsonl} ;;
  margin_mse) TRAIN_FILE=${TRAIN_FILE:-$DATA/qrel_added_teacher_scores.jsonl} ;;
esac

python -m scaling_retriever_tpu.training.train_sparse \
  --model_name_or_path "$MODEL" \
  --corpus_path "$DATA/corpus.tsv" \
  --train_path "$TRAIN_FILE" \
  --output_dir "$OUT" \
  --loss_type "$LOSS" \
  --task_names rank query_reg doc_reg \
  --task_weights 1.0 0.01 0.008 \
  --lora_r 16 --lora_alpha 32 \
  --learning_rate 1e-4 --warmup_ratio 0.04 \
  --max_steps "$MAX_STEPS" \
  --per_device_train_batch_size "$BS" \
  --gradient_accumulation_steps "$ACCUM" \
  --n_negs "$N_NEGS" \
  --query_max_length 64 --doc_max_length 128 \
  --bf16 --fsdp --logging_steps 50 --save_steps 500
