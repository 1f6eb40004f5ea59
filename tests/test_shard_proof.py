"""3B/8B FSDP shard proof (VERDICT r3 #3): the real-width Llama configs
(GQA 8-kv heads, 128k vocab, untied 8B lm_head) carry through the FSDP
partition specs and the production train step AOT-compiles within v5e HBM
per device. Reference recipe anchor:
scripts/msmarco/llama_8b_dense_lora_train_cl-kd.sh:18."""

import numpy as np
import pytest

from scripts.shard_proof import (
    CONFIGS, aot_memory, audit_shardings, build_trainer, make_config,
)
from scaling_retriever_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(model=1)


@pytest.mark.parametrize("name", list(CONFIGS))
def test_fsdp_specs_cover_real_widths(name, mesh):
    """Every parameter >= 64 KiB shards 8 ways at the real dims — incl. the
    GQA kv projections [L, H, 1024] and the 128256-row embedding/lm_head."""
    n = mesh.shape["data"]
    trainer, config = build_trainer(name, "sparse", mesh)
    audit = audit_shardings(trainer, n)
    assert not audit["unsharded_big"], audit["unsharded_big"]
    # param bytes per device must be total/n for the sharded fraction
    assert audit["param_bytes_sharded"] / audit["param_bytes_total"] > 0.99


def test_8b_is_untied_with_gqa():
    cfg = make_config("llama-3.1-8b")
    assert not cfg.tie_word_embeddings
    assert cfg.num_key_value_heads == 8 and cfg.num_attention_heads == 32
    assert cfg.vocab_size == 128256 and cfg.intermediate_size == 14336


def test_8b_train_step_compiles_within_v5e_hbm(mesh):
    """AOT compile of the exact production train step (donation, full remat,
    NCE+KLDiv loss) at 8B widths; per-device live bytes from XLA's
    memory_analysis must fit a 15.75 GB v5e chip."""
    trainer, config = build_trainer("llama-3.1-8b", "dense", mesh)
    mem = aot_memory(trainer, mesh, config.vocab_size)
    assert mem["fits_v5e"], mem
    # params alone are 16 GB bf16 unsharded — the sharded argument size per
    # device must be well under a quarter of that
    assert mem["arg_gb_per_device"] < 4.0, mem


def test_abstract_trainer_matches_concrete_tiny(mesh):
    """Abstract-params Trainer init (eval_shape mode) produces the same
    sharding tree the concrete path does at a tiny config."""
    import jax

    from scaling_retriever_tpu.models import llama
    from scaling_retriever_tpu.models.config import ModelConfig
    from scaling_retriever_tpu.models.encoder import LlamaBiSparseForNCE_KLDiv
    from scaling_retriever_tpu.models.lora import LoraConfig, init_lora_params
    from scaling_retriever_tpu.training.trainer import (
        LLM2RetrieverTrainingArgs, Trainer,
    )

    cfg = ModelConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64)
    lcfg = LoraConfig(r=2, lora_alpha=4, base_model_name_or_path="tiny")
    args = LLM2RetrieverTrainingArgs(output_dir="/tmp/srt_abs", max_steps=1,
                                     fsdp=True, lora=True,
                                     task_names=("rank",), task_weights=(1.0,))

    concrete = Trainer(LlamaBiSparseForNCE_KLDiv(
        llama.init_params(cfg, jax.random.PRNGKey(0)), cfg,
        init_lora_params(cfg, lcfg, jax.random.PRNGKey(1)), lcfg),
        args, [], mesh)
    abstract = Trainer(LlamaBiSparseForNCE_KLDiv(
        jax.eval_shape(lambda: llama.init_params(cfg, jax.random.PRNGKey(0))),
        cfg,
        jax.eval_shape(lambda: init_lora_params(cfg, lcfg,
                                                jax.random.PRNGKey(1))),
        lcfg), args, [], mesh)
    assert abstract.abstract and not concrete.abstract

    cs = jax.tree_util.tree_map(lambda s: s.spec, concrete.param_shardings)
    as_ = jax.tree_util.tree_map(lambda s: s.spec, abstract.param_shardings)
    assert cs == as_
    # abstract params carry the sharding on the struct
    flat = jax.tree_util.tree_leaves(abstract.params)
    assert all(x.sharding is not None for x in flat)
    # opt state shapes agree
    c_shapes = [x.shape for x in jax.tree_util.tree_leaves(concrete.opt_state)]
    a_shapes = [x.shape for x in jax.tree_util.tree_leaves(abstract.opt_state)]
    assert c_shapes == a_shapes
