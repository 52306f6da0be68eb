"""Test harness: force an 8-virtual-device CPU backend before JAX initializes.

This is the JAX analogue of a fake distributed backend (which the reference
lacks entirely — SURVEY.md §4): sharding/collective tests run against a real
8-device mesh without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may have imported jax already (registering
# a TPU plugin), in which case the env vars above were read too late — force
# the platform through the live config instead. Backends must not have
# initialized yet (conftest runs before any test imports).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from newsrecommendation_tpu.config import Config  # noqa: E402


@pytest.fixture
def tiny_cfg() -> Config:
    """Small dims so CPU tests are fast; same structure as the real config."""
    return Config(
        model="NRMS",
        title_source="word_ids",
        num_words_title=6,
        user_log_length=8,
        word_embedding_dim=16,
        news_dim=24,
        news_query_vector_dim=10,
        user_query_vector_dim=10,
        num_attention_heads=4,
        category_emb_dim=5,
        batch_size=4,
        npratio=3,
        drop_rate=0.0,
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def synthetic_dirs(tmp_path):
    """A tiny train/dev synthetic MIND corpus on disk."""
    from newsrecommendation_tpu.data.synthetic import generate_corpus

    train = tmp_path / "train"
    dev = tmp_path / "dev"
    generate_corpus(str(train), num_news=60, num_users=20, num_impressions=120,
                    seed=1, split="train")
    generate_corpus(str(dev), num_news=60, num_users=20, num_impressions=60,
                    seed=2, split="dev")
    return str(train), str(dev)
