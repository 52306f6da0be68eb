"""Host-side training loop: epochs over the batch iterator, jitted steps,
periodic logging with throughput counters, and checkpointing.

Parity with the reference loop (main.py:95-142): per-epoch iteration,
loss/accuracy logging every log_steps, mid-epoch checkpoints every
save_steps, and an end-of-epoch checkpoint. Additions the reference lacks:
examples/sec and steps/sec counters (BASELINE.md first-class metrics) and
optional jax.profiler traces.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from newsrecommendation_tpu.ckpt import save_checkpoint
from newsrecommendation_tpu.parallel.mesh import shard_batch
from newsrecommendation_tpu.train.step import make_train_step


def fit(cfg, model, state, samples, news_features, *, mesh=None,
        train_step=None, vocabs: Optional[dict] = None,
        save_dir: Optional[str] = None) -> Dict[str, float]:
    """Train for cfg.epochs over `samples`; returns (state, stats).

    samples: data.loader.TrainSamples; news_features: combined feature matrix.
    train_step: optional pre-built step (e.g. the spmd shard_map step);
    defaults to the single-logical-device jit step.
    """
    if train_step is None:
        train_step = make_train_step(cfg, model)
    vocabs = vocabs or {}
    base_rng = jax.random.PRNGKey(cfg.seed)

    total_examples = 0
    total_steps = 0
    t_start = None  # set after the first step so compile time is excluded
    profiling = False
    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)
        profiling = True

    metrics = {"loss": jnp.zeros(()), "acc": jnp.zeros(())}
    try:
        for ep in range(cfg.start_epoch, cfg.epochs):
            loss_sum, acc_sum = 0.0, 0.0
            for cnt, batch in enumerate(
                samples.iter_batches(news_features, cfg.batch_size,
                                     epoch=ep, seed=cfg.seed)
            ):
                dev_batch = shard_batch(mesh, batch)
                state, metrics = train_step(state, dev_batch, base_rng)
                total_steps += 1
                total_examples += int(batch["weight"].sum())

                if cnt % cfg.log_steps == 0:
                    # host sync happens here only
                    loss_v = float(metrics["loss"])
                    acc_v = float(metrics["acc"])
                    loss_sum += loss_v
                    acc_sum += acc_v
                    if t_start is None:
                        t_start = time.perf_counter()
                        t0_examples = total_examples
                    elapsed = max(time.perf_counter() - t_start, 1e-9)
                    eps = (total_examples - t0_examples) / elapsed
                    logging.info(
                        "[%d] Ed: %d, train_loss: %.5f, acc: %.5f, ex/s: %.1f",
                        ep, cnt * cfg.batch_size, loss_v, acc_v, eps,
                    )

                if (save_dir and cnt != 0 and cnt % cfg.save_steps == 0):
                    save_checkpoint(save_dir, f"epoch-{ep + 1}-{cnt}.ckpt",
                                    state, cfg, **vocabs)

            logging.info("epoch %d finished", ep)
            if save_dir:
                save_checkpoint(save_dir, f"epoch-{ep + 1}.ckpt", state, cfg,
                                **vocabs)
    finally:
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
    return state, stats
