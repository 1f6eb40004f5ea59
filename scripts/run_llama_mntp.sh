#!/bin/bash
# MNTP pretraining launcher (reference scripts/run_llama_mntp.sh +
# train_configs/mntp/*.json).
set -eu

MODEL=${MODEL:?base model dir}
CORPUS=${CORPUS:?msmarco corpus tsv}
OUT=${OUT:-runs/mntp}

python -m scaling_retriever_tpu.training.mntp \
  --config_json "${CONFIG:-configs/mntp/llama_mntp_msmarco.json}" \
  --model_name_or_path "$MODEL" \
  --train_file "$CORPUS" \
  --output_dir "$OUT"

# dense path needs the adapter re-keyed onto the bare BiModel
# (reference preprocess/lora_rewrite_from_mntp_to_bimodel.py)
python - <<PY
from scaling_retriever_tpu.models.lora import rewrite_mntp_to_bimodel
rewrite_mntp_to_bimodel("$OUT", "${OUT}_bimodel")
PY
