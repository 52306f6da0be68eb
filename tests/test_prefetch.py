"""train/prefetch.py: background host->device staging.

Order, exception relay, early-exit cleanup, and trajectory equivalence
with the inline path (the prefetcher must be invisible to training math).
"""

import threading
import time

import jax
import numpy as np
import pytest

from newsrecommendation_tpu.models import get_model
from newsrecommendation_tpu.train.prefetch import stage_ahead
from newsrecommendation_tpu.train.state import create_train_state


def test_order_preserved():
    out = list(stage_ahead(range(100), lambda x: x * x, depth=3))
    assert out == [x * x for x in range(100)]


def test_depth_zero_is_inline():
    main = threading.current_thread().name
    seen = []
    list(stage_ahead(range(5), lambda x: seen.append(
        threading.current_thread().name), depth=0))
    assert set(seen) == {main}


def test_stage_runs_on_worker_thread():
    main = threading.current_thread().name
    names = list(stage_ahead(range(5),
                             lambda x: threading.current_thread().name,
                             depth=2))
    assert all(n != main for n in names)
    assert len(set(names)) == 1  # single worker => FIFO guaranteed


def test_stage_exception_propagates():
    def bad(x):
        if x == 3:
            raise ValueError("boom at 3")
        return x

    it = stage_ahead(range(10), bad, depth=2)
    got = [next(it), next(it), next(it)]
    assert got == [0, 1, 2]
    with pytest.raises(ValueError, match="boom at 3"):
        list(it)


def test_iterator_exception_propagates():
    def items():
        yield 1
        raise RuntimeError("source died")

    it = stage_ahead(items(), lambda x: x, depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="source died"):
        next(it)


def test_early_close_does_not_hang():
    """Consumer abandons mid-stream; worker (blocked on a full queue) must
    exit promptly when the generator is closed."""
    produced = []

    def items():
        for i in range(1000):
            produced.append(i)
            yield i

    it = stage_ahead(items(), lambda x: x, depth=2)
    assert next(it) == 0
    t0 = time.perf_counter()
    it.close()
    assert time.perf_counter() - t0 < 6.0
    n_after_close = len(produced)
    time.sleep(0.3)
    assert len(produced) <= n_after_close + 2  # worker stopped pulling


def _tiny_fit(cfg, n=33):
    from newsrecommendation_tpu.data.loader import TrainSamples
    from newsrecommendation_tpu.train.loop import fit

    rng = np.random.default_rng(7)  # fresh stream: runs must be comparable
    model = get_model(cfg.model)
    table = rng.normal(size=(30, cfg.word_embedding_dim)).astype(np.float32)
    table[0] = 0
    state = create_train_state(
        cfg, model.init(jax.random.PRNGKey(0), cfg, table))
    r = np.random.default_rng(0)
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
    return fit(cfg, model, state, samples, feats)


def test_fit_trajectory_identical_with_and_without_prefetch(tiny_cfg):
    """prefetch_depth must not change a single bit of the training result."""
    base = tiny_cfg.replace(epochs=2, log_steps=3)
    state_off, stats_off = _tiny_fit(base.replace(prefetch_depth=0))
    state_on, stats_on = _tiny_fit(base.replace(prefetch_depth=3))
    assert stats_off["steps"] == stats_on["steps"]
    assert stats_off["examples"] == stats_on["examples"]
    assert stats_off["final_loss"] == stats_on["final_loss"]
    for a, b in zip(jax.tree_util.tree_leaves(state_off.params),
                    jax.tree_util.tree_leaves(state_on.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_prefetch_with_steps_per_call(tiny_cfg):
    """Prefetch + k-steps-per-dispatch (stacked path incl. leftovers)."""
    cfg = tiny_cfg.replace(epochs=1, steps_per_call=3, log_steps=2,
                           prefetch_depth=2, deterministic=True)
    n = cfg.batch_size * 7 + 1  # 8 batches: 2 stacks of 3 + 2 leftover
    _, stats = _tiny_fit(cfg, n=n)
    assert stats["steps"] == 8
    assert stats["examples"] == n
    assert np.isfinite(stats["final_loss"])


def test_fit_trajectory_identical_with_device_gather(tiny_cfg):
    """Device-side feature gather is an exact relayout of the host gather:
    every step's math (and therefore the whole trajectory) is bit-equal."""
    base = tiny_cfg.replace(epochs=2, log_steps=3)
    state_h, stats_h = _tiny_fit(base.replace(device_gather=False))
    state_d, stats_d = _tiny_fit(base.replace(device_gather=True))
    assert stats_h["steps"] == stats_d["steps"]
    assert stats_h["final_loss"] == stats_d["final_loss"]
    for a, b in zip(jax.tree_util.tree_leaves(state_h.params),
                    jax.tree_util.tree_leaves(state_d.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_device_gather_with_steps_per_call(tiny_cfg):
    cfg = tiny_cfg.replace(epochs=1, steps_per_call=3, log_steps=2,
                           device_gather=True, deterministic=True)
    n = cfg.batch_size * 7 + 1
    _, stats = _tiny_fit(cfg, n=n)
    assert stats["steps"] == 8
    assert stats["examples"] == n
    assert np.isfinite(stats["final_loss"])
