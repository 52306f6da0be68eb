"""Train state: params + Adam optimizer state + step counter.

The reference uses optim.Adam(lr) over all trainable params (main.py:76) with
the frozen title table excluded via nn.Embedding(freeze=True). Here the
embedding table always lives in the param pytree (one code path) and
trainability is controlled by an optax mask: when cfg.freeze_embedding the
table's updates are zeroed, exactly matching requires_grad=False.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


class TrainState(NamedTuple):
    step: Any          # int32 scalar
    params: Any        # model param pytree (includes 'embedding_table')
    opt_state: Any


def trainable_mask(params, cfg):
    """Pytree of bools: False for leaves excluded from optimization."""
    def mask_fn(path, _leaf):
        if cfg.freeze_embedding and path and path[0] == "embedding_table":
            return False
        return True

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return mask_fn(path, tree)

    return walk(params)


def make_optimizer(cfg, params):
    """Adam with torch-default hyperparams (b1=0.9, b2=0.999, eps=1e-8).

    Frozen leaves are routed to set_to_zero (their updates become exact
    zeros and they carry no Adam state) — the equivalent of the reference's
    nn.Embedding.from_pretrained(freeze=True). Note optax.masked would NOT
    work here: it passes masked-out updates through unchanged.
    """
    adam = optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
    labels = jax.tree_util.tree_map(
        lambda m: "train" if m else "frozen", trainable_mask(params, cfg)
    )
    return optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()}, labels
    )


def create_train_state(cfg, params) -> TrainState:
    tx = make_optimizer(cfg, params)
    return TrainState(
        step=jax.numpy.zeros((), dtype=jax.numpy.int32),
        params=params,
        opt_state=tx.init(params),
    )
