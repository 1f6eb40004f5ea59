#!/usr/bin/env bash
# Resident sparse-retrieval server over an on-disk index
# (the serving analog of scripts/eval_sparse.sh's retrieval stage).
#
#   INDEX_DIR=/path/to/index PORT=8080 bash scripts/serve_sparse.sh
#
# Optional:
#   WARMUP_NPZ=queries.npz   npz with q_terms/q_vals [n, T] — pre-compiles
#                            and pre-warms the jit variants live traffic
#                            will hit (a cold variant costs 10-140 s
#                            mid-request on a remote-compile backend)
#   TOPK=1000 WIDTHS=8,64    result depth; tile width ladder
#   VAL_DTYPE=f32            posting value layout: bf16 (6 B/posting) or
#                            q8 (4 B/posting — halves index HBM; exact
#                            over the 8-bit per-term-scaled codes)
#   REORDER_HORIZON=4        cost-admission pool = horizon x tile width
#                            (power-law corpora: 8 measured best for
#                            throughput, 1 for latency SLOs — the
#                            bucket-aware admission study in
#                            PERFORMANCE.md; uniform corpora unaffected)
set -euo pipefail

INDEX_DIR=${INDEX_DIR:?set INDEX_DIR to the inverted-index directory}
PORT=${PORT:-8080}
TOPK=${TOPK:-1000}
WIDTHS=${WIDTHS:-8,64}
VAL_DTYPE=${VAL_DTYPE:-f32}
REORDER_HORIZON=${REORDER_HORIZON:-4}

ARGS=(--index_dir "$INDEX_DIR" --port "$PORT" --topk "$TOPK" --widths "$WIDTHS"
      --val_dtype "$VAL_DTYPE" --reorder_horizon "$REORDER_HORIZON")
if [[ -n "${WARMUP_NPZ:-}" ]]; then
  ARGS+=(--warmup_queries "$WARMUP_NPZ")
fi

exec python -m scaling_retriever_tpu.serving.server "${ARGS[@]}"
