"""Model-level tests: shapes, registry, both input formats, pad-doc path,
gradient flow, and padding_idx semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsrecommendation_tpu.models import get_model


def make_batch(rng, cfg, num_news=40):
    b, l, k, f = cfg.batch_size, cfg.user_log_length, cfg.npratio, cfg.news_feature_width
    vocab_hi = 30 if cfg.title_source == "word_ids" else num_news
    batch = {
        "history": rng.integers(0, vocab_hi, size=(b, l, f)).astype(np.int32),
        "history_mask": (rng.random((b, l)) > 0.3).astype(np.float32),
        "candidate": rng.integers(0, vocab_hi, size=(b, 1 + k, f)).astype(np.int32),
        "label": rng.integers(0, k + 1, size=(b,)).astype(np.int32),
        "weight": np.ones(b, dtype=np.float32),
    }
    return {k_: jnp.asarray(v) for k_, v in batch.items()}


def make_table(rng, cfg, num_news=40):
    if cfg.title_source == "word_ids":
        t = rng.normal(size=(30, cfg.word_embedding_dim)).astype(np.float32)
    else:
        t = rng.normal(
            size=(num_news + 1, cfg.num_words_title * cfg.word_embedding_dim)
        ).astype(np.float32)
    t[0] = 0.0
    return t


@pytest.mark.parametrize("model_name", ["NRMS", "NAML"])
@pytest.mark.parametrize("title_source", ["word_ids", "doc_table"])
def test_forward_shapes(tiny_cfg, rng, model_name, title_source):
    cfg = tiny_cfg.replace(model=model_name, title_source=title_source)
    model = get_model(model_name)
    table = make_table(rng, cfg)
    params = model.init(jax.random.PRNGKey(0), cfg, table, 3, 5)
    batch = make_batch(rng, cfg)
    loss, scores = model.forward(params, cfg, batch)
    assert scores.shape == (cfg.batch_size, 1 + cfg.npratio)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("model_name", ["NRMS", "NAML"])
def test_news_user_encoders_direct(tiny_cfg, rng, model_name):
    """The eval path calls news_encoder/user_encoder directly (main.py:194,247)."""
    cfg = tiny_cfg.replace(model=model_name)
    model = get_model(model_name)
    params = model.init(jax.random.PRNGKey(0), cfg, make_table(rng, cfg), 3, 5)
    feats = jnp.asarray(
        rng.integers(0, 30, size=(7, cfg.news_feature_width)).astype(np.int32)
    )
    nv = model.news_encoder(params, cfg, feats)
    assert nv.shape == (7, cfg.news_dim)
    hist = jnp.asarray(
        rng.normal(size=(3, cfg.user_log_length, cfg.news_dim)).astype(np.float32)
    )
    mask = jnp.asarray((rng.random((3, cfg.user_log_length)) > 0.5).astype(np.float32))
    uv = model.user_encoder(params, cfg, hist, mask)
    assert uv.shape == (3, cfg.news_dim)


def test_naml_multiview(tiny_cfg, rng):
    cfg = tiny_cfg.replace(model="NAML", use_category=True, use_subcategory=True)
    model = get_model("NAML")
    params = model.init(jax.random.PRNGKey(0), cfg, make_table(rng, cfg), 3, 5)
    assert "category_emb" in params["news_encoder"]
    assert "final_attn" in params["news_encoder"]
    batch = make_batch(rng, cfg)
    # clamp category columns to their vocab sizes
    title_w = cfg.num_words_title
    cand = np.array(batch["candidate"])
    cand[..., title_w] = cand[..., title_w] % 4       # cat ids 0..3
    cand[..., title_w + 1] = cand[..., title_w + 1] % 6
    hist = np.array(batch["history"])
    hist[..., title_w] = hist[..., title_w] % 4
    hist[..., title_w + 1] = hist[..., title_w + 1] % 6
    batch["candidate"] = jnp.asarray(cand)
    batch["history"] = jnp.asarray(hist)
    loss, scores = model.forward(params, cfg, batch)
    assert np.isfinite(float(loss))


def test_unknown_news_encodes_from_zero_row(tiny_cfg, rng):
    """Index 0 (unknown news) must hit the zero embedding row regardless of
    what training did to row 0 — padding_idx=0 semantics."""
    cfg = tiny_cfg
    model = get_model("NRMS")
    table = make_table(rng, cfg)
    table[0] = 99.0  # corrupt row 0; the lookup mask must neutralize it
    params = model.init(jax.random.PRNGKey(0), cfg, table, 0, 0)
    zero_feat = jnp.zeros((2, cfg.news_feature_width), dtype=jnp.int32)
    out1 = model.news_encoder(params, cfg, zero_feat)
    params2 = model.init(jax.random.PRNGKey(0), cfg, make_table(rng, cfg), 0, 0)
    out2 = model.news_encoder(params2, cfg, zero_feat)
    # both must equal the encoding of an all-zero word-vec sequence
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_pad_doc_path_differs_from_masked_path(tiny_cfg, rng):
    cfg_mask = tiny_cfg.replace(user_log_mask=True)
    cfg_pad = tiny_cfg.replace(user_log_mask=False)
    model = get_model("NRMS")
    params = model.init(jax.random.PRNGKey(0), cfg_mask, make_table(rng, cfg_mask), 0, 0)
    hist = jnp.asarray(
        rng.normal(size=(2, cfg_mask.user_log_length, cfg_mask.news_dim)).astype(np.float32)
    )
    mask = np.ones((2, cfg_mask.user_log_length), dtype=np.float32)
    mask[:, :3] = 0.0
    mask = jnp.asarray(mask)
    uv_mask = model.user_encoder(params, cfg_mask, hist, mask)
    uv_pad = model.user_encoder(params, cfg_pad, hist, mask)
    assert not np.allclose(np.asarray(uv_mask), np.asarray(uv_pad))


def test_gradients_flow_and_are_finite(tiny_cfg, rng):
    cfg = tiny_cfg
    model = get_model("NRMS")
    params = model.init(jax.random.PRNGKey(0), cfg, make_table(rng, cfg), 0, 0)
    batch = make_batch(rng, cfg)

    def loss_fn(p):
        loss, _ = model.forward(p, cfg, batch, rng=jax.random.PRNGKey(1),
                                deterministic=False)
        return loss

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # encoder weights actually receive gradient
    g_attn = np.asarray(grads["news_encoder"]["attn"]["fc1"]["w"])
    assert np.abs(g_attn).max() > 0


def test_weighted_loss_ignores_padded_samples(tiny_cfg, rng):
    """A padded final batch must produce the same loss as the ragged batch."""
    cfg = tiny_cfg
    model = get_model("NRMS")
    params = model.init(jax.random.PRNGKey(0), cfg, make_table(rng, cfg), 0, 0)
    batch = make_batch(rng, cfg)
    loss_full, _ = model.forward(params, cfg, batch)

    w = np.ones(cfg.batch_size, dtype=np.float32)
    w[-1] = 0.0
    batch_w = dict(batch)
    batch_w["weight"] = jnp.asarray(w)
    loss_w, _ = model.forward(params, cfg, batch_w)

    batch_s = {
        k: v[: cfg.batch_size - 1] for k, v in batch.items()
    }
    # smaller batch → different static shape, same math
    loss_s, _ = model.forward(params, cfg, batch_s)
    assert float(loss_w) == pytest.approx(float(loss_s), rel=1e-5)
    assert float(loss_w) != pytest.approx(float(loss_full), rel=1e-7)


def test_registry():
    from newsrecommendation_tpu.models import REGISTRY
    assert set(REGISTRY) >= {"NRMS", "NAML"}
    with pytest.raises(KeyError):
        get_model("LSTUR")
