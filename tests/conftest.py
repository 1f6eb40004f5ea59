"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference can only exercise multi-rank behavior by launching torchrun
(SURVEY.md §4); here distributed logic is tested in-process with XLA's
host-platform device virtualization.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the real TPU
# ('axon'), but tests need the virtual 8-device CPU mesh and f32 numerics.
os.environ["JAX_PLATFORMS"] = os.environ.get("SRT_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TRANSFORMERS_NO_ADVISORY_WARNINGS", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax  # noqa: E402

# The env var alone is not enough: the ambient axon plugin re-pins the
# platform after env processing, so set it through the config API too.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_config():
    import jax.numpy as jnp
    from scaling_retriever_tpu.models.config import ModelConfig

    return ModelConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        max_position_embeddings=512,
        tie_word_embeddings=False,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
