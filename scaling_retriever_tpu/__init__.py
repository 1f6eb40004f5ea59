"""scaling_retriever_tpu — TPU-native sparse & dense retrieval for decoder-only LLMs.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
scaling-retriever (LION) reference codebase: bidirectional decoder-only LLM
encoders (Llama-3, Qwen2) emitting SPLADE-style vocab-space sparse
representations or L2-normalized mean-pooled dense embeddings, an HBM-resident
impact-ordered index queried on-chip, contrastive/distillation training, MNTP
pretraining, and the MSMARCO/TREC-DL/BEIR evaluation harness.
"""

__version__ = "0.1.0"
