"""Train step/state/loop: learning dynamics, freezing, weighted batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsrecommendation_tpu.models import get_model
from newsrecommendation_tpu.train import create_train_state
from newsrecommendation_tpu.train.state import trainable_mask
from newsrecommendation_tpu.train.step import make_multi_step, make_train_step


def setup(tiny_cfg, rng, **cfg_overrides):
    cfg = tiny_cfg.replace(**cfg_overrides)
    model = get_model(cfg.model)
    table = rng.normal(size=(30, cfg.word_embedding_dim)).astype(np.float32)
    table[0] = 0.0
    params = model.init(jax.random.PRNGKey(0), cfg, table)
    state = create_train_state(cfg, params)
    return cfg, model, state


def batch_of(rng, cfg, seed=0):
    r = np.random.default_rng(seed)
    b, l, k, f = cfg.batch_size, cfg.user_log_length, cfg.npratio, cfg.news_feature_width
    return {
        "history": jnp.asarray(r.integers(0, 30, size=(b, l, f)), jnp.int32),
        "history_mask": jnp.asarray((r.random((b, l)) > 0.3).astype(np.float32)),
        "candidate": jnp.asarray(r.integers(0, 30, size=(b, 1 + k, f)), jnp.int32),
        "label": jnp.asarray(r.integers(0, k + 1, size=(b,)), jnp.int32),
        "weight": jnp.ones((b,), jnp.float32),
    }


def test_loss_decreases_on_fixed_batch(tiny_cfg, rng):
    cfg, model, state = setup(tiny_cfg, rng, lr=0.01, deterministic=True)
    step = make_train_step(cfg, model, donate=False)
    batch = batch_of(rng, cfg)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(20):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses


def test_step_counter_increments(tiny_cfg, rng):
    cfg, model, state = setup(tiny_cfg, rng)
    step = make_train_step(cfg, model, donate=False)
    state, _ = step(state, batch_of(rng, cfg), jax.random.PRNGKey(0))
    state, _ = step(state, batch_of(rng, cfg), jax.random.PRNGKey(0))
    assert int(state.step) == 2


def test_frozen_embedding_not_updated(tiny_cfg, rng):
    cfg, model, state = setup(tiny_cfg, rng, freeze_embedding=True, lr=0.01)
    table_before = np.array(state.params["embedding_table"])
    step = make_train_step(cfg, model, donate=False)
    for i in range(3):
        state, _ = step(state, batch_of(rng, cfg, seed=i), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.array(state.params["embedding_table"]),
                                  table_before)
    # but the encoder weights did move
    assert not np.allclose(
        np.array(state.params["news_encoder"]["attn"]["fc1"]["w"]),
        np.array(create_train_state(
            cfg, get_model(cfg.model).init(
                jax.random.PRNGKey(0), cfg, table_before)
        ).params["news_encoder"]["attn"]["fc1"]["w"]),
    )


def test_unfrozen_embedding_updates(tiny_cfg, rng):
    cfg, model, state = setup(tiny_cfg, rng, freeze_embedding=False, lr=0.01)
    table_before = np.array(state.params["embedding_table"])
    step = make_train_step(cfg, model, donate=False)
    state, _ = step(state, batch_of(rng, cfg), jax.random.PRNGKey(0))
    assert not np.allclose(np.array(state.params["embedding_table"]), table_before)


def test_trainable_mask_structure(tiny_cfg, rng):
    cfg, model, state = setup(tiny_cfg, rng, freeze_embedding=True)
    mask = trainable_mask(state.params, cfg)
    assert mask["embedding_table"] is False
    assert mask["news_encoder"]["attn"]["fc1"]["w"] is True


def test_padded_weight_batch_matches_unpadded_grads(tiny_cfg, rng):
    """Gradient from a weight-padded batch == gradient from the short batch."""
    cfg, model, state = setup(tiny_cfg, rng, deterministic=True)
    full = batch_of(rng, cfg)
    short = {k: v[:-2] for k, v in full.items()}
    padded = dict(full)
    w = np.ones(cfg.batch_size, np.float32)
    w[-2:] = 0.0
    padded["weight"] = jnp.asarray(w)

    def grad_of(batch):
        def loss_fn(p):
            return model.forward(p, cfg, batch, deterministic=True)[0]
        return jax.grad(loss_fn)(state.params)

    g1 = grad_of(short)
    g2 = grad_of(padded)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.array(a), np.array(b),
                                                rtol=1e-4, atol=1e-6),
        g1, g2,
    )


def test_multi_step_matches_sequential(tiny_cfg, rng):
    """k scanned steps in one dispatch == k single dispatches, including the
    per-step dropout streams (both fold the absolute step counter)."""
    cfg, model, state = setup(tiny_cfg, rng, drop_rate=0.2,
                              deterministic=False, lr=0.01)
    single = make_train_step(cfg, model, donate=False)
    multi = make_multi_step(cfg, model, 4, donate=False)
    batches = [batch_of(rng, cfg, seed=i) for i in range(4)]
    key = jax.random.PRNGKey(3)

    st_seq = state
    for b in batches:
        st_seq, m_seq = single(st_seq, b, key)

    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    st_multi, ms = multi(state, stacked, key)

    assert int(st_multi.step) == 4
    assert ms["loss"].shape == (4,)
    assert float(ms["loss"][-1]) == pytest.approx(float(m_seq["loss"]),
                                                  rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.array(a), np.array(b),
                                                rtol=1e-4, atol=1e-6),
        st_multi.params, st_seq.params,
    )


def test_fit_steps_per_call_with_leftover(tiny_cfg, rng):
    """fit() with steps_per_call>1 on a batch count NOT divisible by k: the
    leftover goes through the 1-step path; counters stay exact."""
    from newsrecommendation_tpu.data.loader import TrainSamples
    from newsrecommendation_tpu.train.loop import fit

    cfg = tiny_cfg.replace(epochs=1, steps_per_call=3, log_steps=2,
                           deterministic=True)
    model = get_model(cfg.model)
    table = rng.normal(size=(30, cfg.word_embedding_dim)).astype(np.float32)
    table[0] = 0
    state = create_train_state(cfg, model.init(jax.random.PRNGKey(0), cfg,
                                               table))
    r = np.random.default_rng(0)
    n = cfg.batch_size * 7 + 1  # 8 batches (last partial) = 2 chunks + 2 left
    samples = TrainSamples(
        history=r.integers(0, 30, size=(n, cfg.user_log_length)).astype(
            np.int32),
        history_mask=np.ones((n, cfg.user_log_length), np.float32),
        pos=r.integers(1, 30, size=(n,)).astype(np.int32),
        neg=r.integers(1, 30, size=(n, cfg.npratio)).astype(np.int32),
    )
    feats = np.concatenate(
        [np.zeros((1, cfg.news_feature_width), np.int32),
         r.integers(0, 30, size=(29, cfg.news_feature_width)).astype(
             np.int32)])
    state, stats = fit(cfg, model, state, samples, feats)
    assert stats["steps"] == 8
    assert int(state.step) == 8
    assert stats["examples"] == n
    assert np.isfinite(stats["final_loss"])


def test_profile_trace_written(tiny_cfg, rng, tmp_path):
    """cfg.profile_dir wraps the loop in jax.profiler.start/stop_trace."""
    import os
    from newsrecommendation_tpu.train.loop import fit
    from newsrecommendation_tpu.data.loader import TrainSamples

    cfg = tiny_cfg.replace(epochs=1, profile_dir=str(tmp_path / "trace"),
                           log_steps=100)
    model = get_model(cfg.model)
    table = rng.normal(size=(30, cfg.word_embedding_dim)).astype(np.float32)
    table[0] = 0
    state = create_train_state(cfg, model.init(jax.random.PRNGKey(0), cfg, table))
    r = np.random.default_rng(0)
    n = 16
    samples = TrainSamples(
        history=r.integers(0, 30, size=(n, cfg.user_log_length)).astype(np.int32),
        history_mask=np.ones((n, cfg.user_log_length), np.float32),
        pos=r.integers(1, 30, size=(n,)).astype(np.int32),
        neg=r.integers(1, 30, size=(n, cfg.npratio)).astype(np.int32),
    )
    feats = np.concatenate(
        [np.zeros((1, cfg.news_feature_width), np.int32),
         r.integers(0, 30, size=(29, cfg.news_feature_width)).astype(np.int32)])
    fit(cfg, model, state, samples, feats)
    found = []
    for root, _, files in os.walk(tmp_path / "trace"):
        found.extend(files)
    assert found, "no profiler trace files written"


def test_fit_loop_end_to_end(tiny_cfg, rng, synthetic_dirs, tmp_path):
    import os
    from newsrecommendation_tpu.data import (
        TrainSamples, build_news_features, prepare_training_data, read_news,
    )
    from newsrecommendation_tpu.train.loop import fit

    train_dir, _ = synthetic_dirs
    cfg = tiny_cfg.replace(epochs=2, lr=0.003, log_steps=5, filter_num=0)
    prepare_training_data(train_dir, 1, cfg.npratio, 0)
    corpus = read_news(os.path.join(train_dir, "news.tsv"), cfg, "train")
    feats = build_news_features(corpus, cfg)
    samples = TrainSamples.from_file(
        os.path.join(train_dir, f"behaviors_np{cfg.npratio}_0.tsv"),
        corpus.news_index, cfg)
    model = get_model(cfg.model)
    table = rng.normal(size=(len(corpus.word_dict) + 1,
                             cfg.word_embedding_dim)).astype(np.float32)
    table[0] = 0
    state = create_train_state(
        cfg, model.init(jax.random.PRNGKey(0), cfg, table))
    state, stats = fit(cfg, model, state, samples, feats,
                       save_dir=str(tmp_path))
    assert stats["examples"] == 2 * samples.num_samples
    assert np.isfinite(stats["final_loss"])
    assert (tmp_path / "epoch-2.ckpt").exists()
