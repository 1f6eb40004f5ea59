"""Quick start (reference examples/quick_start.py:11-31).

Loads a Lion LoRA checkpoint (adapter dir resolvable offline via
SRT_MODEL_DIR_MAP / local path), encodes two queries and two passages, and
prints the score matrix. With the published Lion-DS-1B adapter the expected
matrix is [[0.2878, 0.1321], [0.1041, 0.2922]] (reference README.md:62-66);
with Lion-SP-1B (LlamaBiSparse) it is [[14.835, 0.026], [0.005, 13.910]].
"""

import sys

import numpy as np

from transformers import AutoTokenizer

from scaling_retriever_tpu.models.encoder import LlamaBiDense, LlamaBiSparse

np.set_printoptions(suppress=True, precision=3)


def main(model_name_or_path: str, kind: str = "dense"):
    cls = LlamaBiDense if kind == "dense" else LlamaBiSparse
    model = cls.load_from_lora(model_name_or_path)
    tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)

    queries = ["What is the capital of France?", "Who wrote '1984'?"]
    passages = [
        "Paris is the capital of France.",
        "George Orwell wrote '1984'.",
    ]
    tq = tokenizer(queries, max_length=192, truncation=True, padding="longest")
    tp = tokenizer(passages, max_length=192, truncation=True, padding="longest")

    query_embeds = np.asarray(model.query_encode(
        np.asarray(tq["input_ids"]), np.asarray(tq["attention_mask"])))
    doc_embeds = np.asarray(model.doc_encode(
        np.asarray(tp["input_ids"]), np.asarray(tp["attention_mask"])))

    scores = query_embeds @ doc_embeds.T
    print(scores.tolist())
    return scores


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(
            "usage: python examples/quick_start.py <lora_adapter_dir> "
            "[dense|sparse]\n"
            "e.g. a local copy of hzeng/Lion-DS-1B-llama3-marco-mntp "
            "(expected score matrices are pinned in BASELINE.md)")
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "dense")
