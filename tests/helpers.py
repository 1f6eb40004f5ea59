"""Shared test fixtures: tiny local HF checkpoint with tokenizer, tiny corpora."""

import json
import os

import numpy as np


def make_tiny_tokenizer(save_dir: str, vocab_words=None, padding_side="left"):
    """Whitespace WordLevel tokenizer saved as PreTrainedTokenizerFast."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    words = vocab_words or [f"w{i}" for i in range(200)]
    vocab = {"<pad>": 0, "<unk>": 1, "<s>": 2, "</s>": 3}
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", unk_token="<unk>",
        bos_token="<s>", eos_token="</s>", padding_side=padding_side,
    )
    fast.save_pretrained(save_dir)
    return fast


def make_tiny_llama_dir(save_dir: str, vocab_size=256, tie=True, seed=0):
    """Tiny torch Llama + tokenizer saved to save_dir."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=vocab_size, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=tie,
    )
    torch.manual_seed(seed)
    LlamaForCausalLM(cfg).save_pretrained(save_dir)
    make_tiny_tokenizer(save_dir)
    return save_dir


def make_tiny_t5_dir(save_dir: str, vocab_size=256, seed=0,
                     feed_forward_proj="gated-gelu"):
    """Tiny torch T5 (v1.1-style gated FFN by default, matching the reference
    LoRA target modules) + tokenizer saved to save_dir."""
    import torch
    from transformers import T5Config, T5ForConditionalGeneration

    cfg = T5Config(
        vocab_size=vocab_size, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj=feed_forward_proj,
        tie_word_embeddings=True, dropout_rate=0.0,
    )
    torch.manual_seed(seed)
    T5ForConditionalGeneration(cfg).save_pretrained(save_dir)
    make_tiny_tokenizer(save_dir, padding_side="right")  # T5 convention
    return save_dir


def make_msmarco_style_data(data_dir: str, n_docs=50, n_queries=8, seed=0):
    """Tiny TSV corpus + queries + qrel where query i's relevant doc shares
    its distinctive words."""
    rng = np.random.default_rng(seed)
    os.makedirs(data_dir, exist_ok=True)
    corpus_path = os.path.join(data_dir, "corpus.tsv")
    query_path = os.path.join(data_dir, "queries.tsv")
    qrel_path = os.path.join(data_dir, "qrel.json")

    qrel = {}
    with open(corpus_path, "w") as f:
        for d in range(n_docs):
            words = [f"w{rng.integers(10, 150)}" for _ in range(12)]
            if d < n_queries:  # doc d is "about" topic d
                words = [f"w{150 + d}"] * 4 + words[:8]
            f.write(f"doc{d}\t{' '.join(words)}\n")
    with open(query_path, "w") as f:
        for q in range(n_queries):
            f.write(f"q{q}\tw{150 + q} w{rng.integers(10, 150)}\n")
            qrel[f"q{q}"] = {f"doc{q}": 1}
    with open(qrel_path, "w") as f:
        json.dump(qrel, f)
    return corpus_path, query_path, qrel_path
