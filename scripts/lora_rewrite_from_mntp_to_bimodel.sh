#!/bin/bash
# Rewrite an MNTP LoRA adapter so it attaches to the bare BiModel (dense
# path). Mirror of reference scripts/lora_rewrite_from_mntp_to_bimodel.sh;
# this framework's own loader accepts both layouts, so the tool exists for
# interop with reference-side torch loading.
set -eu

INPUT_DIR=${1:?input adapter dir}
OUTPUT_DIR=${2:?output adapter dir}

python -m scaling_retriever_tpu.models.lora \
    --input_dir "$INPUT_DIR" --output_dir "$OUTPUT_DIR"
