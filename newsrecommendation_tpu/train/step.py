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


def make_train_step(cfg, model, donate: bool | None = None):
    """Returns train_step(state, batch, base_rng) -> (state, metrics dict).

    base_rng is a fixed per-run key; per-step dropout keys are derived by
    folding in the step counter, so the step stays cacheable under jit.
    """
    def loss_fn(params, batch, rng):
        loss, scores = model.forward(
            params, cfg, batch, rng=rng,
            deterministic=cfg.deterministic,
        )
        acc = weighted_accuracy(batch["label"], scores, batch["weight"])
        return loss, acc

    def train_step(state: TrainState, batch, base_rng):
        tx = make_optimizer(cfg, state.params)
        rng = jax.random.fold_in(base_rng, state.step)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, {"loss": loss, "acc": acc}

    if donate is None:
        donate = cfg.donate_state
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
