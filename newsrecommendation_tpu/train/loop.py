"""Host-side training loop: epochs over the batch iterator, jitted steps,
periodic logging with throughput counters, and checkpointing.

Parity with the reference loop (main.py:95-142): per-epoch iteration,
loss/accuracy logging every log_steps, mid-epoch checkpoints every
save_steps, and an end-of-epoch checkpoint. Additions the reference lacks:
examples/sec and steps/sec counters (BASELINE.md first-class metrics),
optional jax.profiler traces, and background host->device batch staging
(train/prefetch.py; cfg.prefetch_depth) that overlaps batch construction
with device compute.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

import numpy as np

from newsrecommendation_tpu.parallel.mesh import (
    replicate,
    shard_batch,
    shard_stacked_batch,
)
from newsrecommendation_tpu.train.prefetch import stage_ahead
from newsrecommendation_tpu.train.step import make_multi_step, make_train_step


class _AsyncSaver:
    """Checkpoint writes off the training thread.

    A synchronous save blocks the loop for the full device->host fetch +
    file write (~1 s/epoch over a remote-TPU transport — 24% of a short
    epoch, measured round 4). Instead the state is snapshotted ON DEVICE
    (one jitted elementwise copy, so the train step's buffer donation
    cannot free the leaves out from under the writer) and a single worker
    thread fetches + writes while training continues. One save in flight
    at a time; `wait()` at loop exit makes files durable before fit
    returns. Multi-controller runs save synchronously (every process
    must reach its shard writes; a lagging background thread would
    let a process exit with an unwritten shard file).
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None
        self._snap = jax.jit(lambda s: jax.tree_util.tree_map(
            lambda x: x + jnp.zeros((), x.dtype), s))

    def save(self, save_dir, name, state, cfg, **vocabs):
        from newsrecommendation_tpu.ckpt import save_checkpoint as _sync

        if jax.process_count() > 1:
            _sync(save_dir, name, state, cfg, **vocabs)
            return
        snap = self._snap(state)
        self.wait()  # one in flight: bounds device memory at 2x state

        def _write():
            # Capture failures (disk full, serialization error): a daemon
            # thread's exception otherwise vanishes into the excepthook and
            # fit() would return success with a missing/partial checkpoint.
            try:
                _sync(save_dir, name, snap, cfg, **vocabs)
            except BaseException as e:  # noqa: BLE001 — re-raised in wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, daemon=True, name="ckpt-saver")
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("background checkpoint write failed") from err


def fit(cfg, model, state, samples, news_features, *, mesh=None,
        train_step=None, multi_step=None, vocabs: Optional[dict] = None,
        save_dir: Optional[str] = None,
        device_gather: Optional[bool] = None) -> Dict[str, float]:
    """Train for cfg.epochs over `samples`; returns (state, stats).

    samples: data.loader.TrainSamples; news_features: combined feature matrix.
    train_step: optional pre-built step (e.g. the spmd shard_map step);
    defaults to the single-logical-device jit step. multi_step: matching
    k-steps-per-dispatch program (spmd.make_spmd_multi_step) when
    cfg.steps_per_call > 1; built automatically for the default step.
    device_gather: feature rows are gathered ON DEVICE from a resident
    replicated news_features matrix, and the host ships only int32 news
    indices per step (train/step.py:with_device_gather). Defaults to
    cfg.device_gather for the built-in step; a caller supplying a custom
    train_step must pass device_gather=True iff that step takes the extra
    news_feats argument (spmd.make_spmd_train_step(device_gather=True)).
    """
    custom_step = train_step is not None
    if device_gather is None:
        device_gather = (not custom_step
                         and bool(getattr(cfg, "device_gather", False)))
    if train_step is None:
        train_step = make_train_step(cfg, model, device_gather=device_gather)
    vocabs = vocabs or {}
    base_rng = jax.random.PRNGKey(cfg.seed)

    mlog = None
    if save_dir and jax.process_index() == 0:
        import os

        from newsrecommendation_tpu.utils.logging import MetricsLog
        mlog = MetricsLog(os.path.join(save_dir, "metrics.jsonl"))

    total_examples = 0
    total_steps = 0
    t_start = None  # set after the first step so compile time is excluded
    t0_examples = 0
    profiling = False
    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)
        profiling = True

    metrics = {"loss": jnp.zeros(()), "acc": jnp.zeros(())}
    k = cfg.steps_per_call
    if k > 1 and multi_step is None:
        if custom_step:
            logging.warning(
                "steps_per_call=%d ignored: a custom train_step was supplied "
                "without a matching multi_step", k)
            k = 1
        else:
            multi_step = make_multi_step(cfg, model, k,
                                         device_gather=device_gather)

    def after_step(ep, cnt, loss_a, acc_a, n_examples):
        """Logging/checkpoint bookkeeping shared by both dispatch paths.

        loss_a/acc_a: zero-arg callables returning host floats — only
        invoked at log points so off-log steps stay sync-free.
        """
        nonlocal total_steps, total_examples, t_start, t0_examples
        total_steps += 1
        total_examples += n_examples
        if cnt % cfg.log_steps == 0:
            loss_v, acc_v = loss_a(), acc_a()
            if t_start is None:
                t_start = time.perf_counter()
                t0_examples = total_examples
            elapsed = max(time.perf_counter() - t_start, 1e-9)
            eps = (total_examples - t0_examples) / elapsed
            logging.info(
                "[%d] Ed: %d, train_loss: %.5f, acc: %.5f, ex/s: %.1f",
                ep, cnt * cfg.batch_size, loss_v, acc_v, eps,
            )
            if mlog is not None:
                mlog.write("train", epoch=ep, step=cnt,
                           loss=round(loss_v, 5), acc=round(acc_v, 5),
                           examples_per_sec=round(eps, 1))
        if save_dir and cnt != 0 and cnt % cfg.save_steps == 0:
            saver.save(save_dir, f"epoch-{ep + 1}-{cnt}.ckpt",
                       state, cfg, **vocabs)

    depth = getattr(cfg, "prefetch_depth", 2)
    saver = _AsyncSaver()

    feats_dev = None
    if device_gather:
        # one placement for the whole run; every step gathers from it
        feats_dev = replicate(mesh, jnp.asarray(news_features))

    def iter_host_batches(ep):
        if device_gather:
            return samples.iter_index_batches(cfg.batch_size, epoch=ep,
                                              seed=cfg.seed)
        return samples.iter_batches(news_features, cfg.batch_size,
                                    epoch=ep, seed=cfg.seed)

    def run_step(st, dev):
        if device_gather:
            return train_step(st, dev, base_rng, feats_dev)
        return train_step(st, dev, base_rng)

    def run_multi(st, dev):
        if device_gather:
            return multi_step(st, dev, base_rng, feats_dev)
        return multi_step(st, dev, base_rng)

    def grouped():
        """All epochs' host batches, k-stacked, with epoch-end markers.

        One generator spanning the whole run (rather than one per epoch)
        lets the prefetch worker run epoch N+1's `epoch_arrays` — the
        vectorized positive-slot insertion, the largest single host cost —
        while the device is still training on epoch N's tail. The
        "epoch_end" marker rides the same FIFO queue, so the consumer
        checkpoints at exactly the old epoch boundary.
        """
        for ep in range(cfg.start_epoch, cfg.epochs):
            pending = []
            for batch in iter_host_batches(ep):
                if k == 1:
                    yield "single", ep, [batch]
                    continue
                pending.append(batch)
                if len(pending) == k:
                    yield "stack", ep, pending
                    pending = []
            for batch in pending:  # < k leftovers at epoch end: 1-step path
                yield "single", ep, [batch]
            yield "epoch_end", ep, None

    def stage(item):
        """Host gather is already done; device_put on the worker thread."""
        kind, ep, batches = item
        if kind == "epoch_end":
            return kind, ep, None, None
        n_examples = [int(b["weight"].sum()) for b in batches]
        if kind == "stack":
            stacked = {key: np.stack([b[key] for b in batches])
                       for key in batches[0]}
            return kind, ep, shard_stacked_batch(mesh, stacked), n_examples
        return kind, ep, shard_batch(mesh, batches[0]), n_examples

    try:
        cnt = -1
        for kind, ep, dev, n_examples in stage_ahead(grouped(), stage,
                                                     depth=depth):
            if kind == "epoch_end":
                logging.info("epoch %d finished", ep)
                if save_dir:
                    saver.save(save_dir, f"epoch-{ep + 1}.ckpt", state,
                               cfg, **vocabs)
                cnt = -1
                continue
            if kind == "single":
                cnt += 1
                state, metrics = run_step(state, dev)
                after_step(ep, cnt,
                           lambda: float(metrics["loss"]),
                           lambda: float(metrics["acc"]),
                           n_examples[0])
                continue
            state, ms = run_multi(state, dev)
            metrics = {"loss": ms["loss"][-1], "acc": ms["acc"][-1]}
            for j, n in enumerate(n_examples):
                cnt += 1
                after_step(ep, cnt,
                           lambda j=j: float(ms["loss"][j]),
                           lambda j=j: float(ms["acc"][j]),
                           n)
    finally:
        saver.wait()  # checkpoint files durable before fit returns
        if profiling:
            jax.profiler.stop_trace()

    jax.block_until_ready(metrics["loss"])
    elapsed = (time.perf_counter() - t_start) if t_start else 0.0
    stats = {
        "steps": total_steps,
        "examples": total_examples,
        "examples_per_sec": (
            (total_examples - t0_examples) / elapsed if t_start and elapsed > 0
            else 0.0
        ),
        "final_loss": float(metrics["loss"]),
        "final_acc": float(metrics["acc"]),
    }
    if mlog is not None:
        mlog.write("train_summary",
                   **{k: round(float(v), 5) for k, v in stats.items()})
        mlog.close()
    return state, stats
