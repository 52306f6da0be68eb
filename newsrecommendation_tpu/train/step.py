"""Jitted train step.

The reference's hot loop is forward -> backward -> Adam with DDP's implicit
gradient allreduce (main.py:105-110). Here the whole step is ONE jitted,
donated XLA computation; under a mesh the batch is sharded over the 'data'
axis and params are replicated, so XLA inserts the gradient all-reduce over
ICI automatically (the NCCL-DDP equivalent). Explicit shard_map variants
(row-sharded embedding tables) live in ``parallel/``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from newsrecommendation_tpu.train.state import TrainState, make_optimizer


def weighted_accuracy(labels, scores, weights):
    hit = (jnp.argmax(scores, axis=-1) == labels).astype(jnp.float32)
    w = weights.astype(jnp.float32)
    return jnp.sum(hit * w) / jnp.maximum(jnp.sum(w), 1.0)


def _make_step_body(cfg, model):
    """The un-jitted step: (state, batch, base_rng) -> (state, metrics).

    base_rng is a fixed per-run key; per-step dropout keys are derived by
    folding in the step counter, so the same body is bit-identical whether
    dispatched one step at a time (make_train_step) or scanned k steps per
    dispatch (make_multi_step).
    """
    def loss_fn(params, batch, rng):
        loss, scores = model.forward(
            params, cfg, batch, rng=rng,
            deterministic=cfg.deterministic,
        )
        acc = weighted_accuracy(batch["label"], scores, batch["weight"])
        return loss, acc

    def step_body(state: TrainState, batch, base_rng):
        tx = make_optimizer(cfg, state.params)
        rng = jax.random.fold_in(base_rng, state.step)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, {"loss": loss, "acc": acc}

    return step_body


def with_device_gather(body):
    """Wrap a step body to gather news features ON DEVICE from a resident
    feature matrix.

    The host loop then ships only (B, L) int32 doc indices per step instead
    of the gathered (B, L, F) feature rows — ~20x less host->device wire
    traffic (measured ~8 ms/step of un-overlappable transfer at production
    dims through the remote-TPU tunnel; docs/PERF.md round 4). news_feats
    is an explicit argument, not a closure, so the corpus is placed once
    and never baked into the compiled HLO.
    """
    def step(state, batch, base_rng, news_feats):
        batch = dict(batch)
        batch["history"] = jnp.take(news_feats, batch.pop("history_idx"),
                                    axis=0)
        batch["candidate"] = jnp.take(news_feats, batch.pop("candidate_idx"),
                                      axis=0)
        return body(state, batch, base_rng)

    return step


def make_train_step(cfg, model, donate: bool | None = None,
                    device_gather: bool = False):
    """Returns jitted train_step(state, batch, base_rng) -> (state, metrics).

    device_gather=True instead returns train_step(state, batch, base_rng,
    news_feats) where batch carries history_idx/candidate_idx and the
    feature gather runs inside the jit (see with_device_gather).
    """
    if donate is None:
        donate = cfg.donate_state
    body = _make_step_body(cfg, model)
    if device_gather:
        body = with_device_gather(body)
    return jax.jit(body, donate_argnums=(0,) if donate else ())


def make_multi_step(cfg, model, steps_per_call: int,
                    donate: bool | None = None,
                    device_gather: bool = False):
    """k sequential train steps in ONE dispatched XLA computation.

    Returns multi_step(state, stacked_batches, base_rng) -> (state, metrics)
    where every leaf of stacked_batches has a leading axis of length
    steps_per_call. The steps run under ``lax.scan``, so one host->device
    dispatch covers k optimizer updates — amortizing per-call runtime
    latency (significant over the remote-TPU tunnel, and at pod scale it
    keeps the host out of the step-time critical path). Math is identical
    to k single dispatches: dropout keys fold in the absolute step counter.

    metrics are the per-step arrays (leading axis k) so callers can log any
    granularity without extra device syncs.
    """
    step_body = _make_step_body(cfg, model)

    def multi_step(state: TrainState, stacked_batches, base_rng):
        def body(st, batch):
            return step_body(st, batch, base_rng)

        state, metrics = jax.lax.scan(body, state, stacked_batches,
                                      length=steps_per_call)
        return state, metrics

    def multi_step_dg(state: TrainState, stacked_batches, base_rng,
                      news_feats):
        gathered = with_device_gather(step_body)

        def body(st, batch):
            return gathered(st, batch, base_rng, news_feats)

        state, metrics = jax.lax.scan(body, state, stacked_batches,
                                      length=steps_per_call)
        return state, metrics

    if donate is None:
        donate = cfg.donate_state
    fn = multi_step_dg if device_gather else multi_step
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
