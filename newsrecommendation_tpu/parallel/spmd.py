"""Explicit-SPMD train step: shard_map over the ('data','table') mesh.

This is the multi-chip training path. Layout:
  - batch: sharded over 'data', replicated over 'table';
  - embedding_table (+ its Adam state, if trainable): row-sharded over
    'table', replicated over 'data';
  - all other params + opt state: fully replicated.

Collectives per step (all ICI):
  - table-row psum over 'table' inside every embedding lookup
    (sharded_embedding.gather_rows_sharded), whose transpose scatter-adds
    table gradients back to the owning shard;
  - one gradient psum over 'data' (the DDP allreduce equivalent,
    reference main.py:82+109);
  - scalar psums for the globally-exact weighted loss/accuracy.

The weighted loss is computed as psum(local CE sum) / psum(local weight
sum), so padded final batches give bit-identical math to a single-device
run regardless of how padding lands across shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from newsrecommendation_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS
from newsrecommendation_tpu.parallel.sharded_embedding import gather_rows_sharded
from newsrecommendation_tpu.train.state import TrainState, make_optimizer

try:  # jax>=0.6 exports shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def state_pspecs(state: TrainState, table_sharded: bool):
    """PartitionSpecs matching TrainState: table row-sharded, rest replicated."""
    def spec_for(path):
        if table_sharded and "embedding_table" in path:
            return P(TABLE_AXIS, None)
        return P()

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if hasattr(tree, "_fields"):  # NamedTuple (optax states, TrainState)
            return type(tree)(*(walk(getattr(tree, f), path + (f,))
                                for f in tree._fields))
        if isinstance(tree, (list, tuple)):
            return type(tree)(walk(v, path) for v in tree)
        return spec_for(path)

    return walk(state)


def batch_pspecs(batch: dict):
    return {k: P(DATA_AXIS) for k in batch}


def place_state(state: TrainState, mesh, table_sharded: bool) -> TrainState:
    """Place a host/train state onto the mesh: embedding-table leaves (params
    AND their optimizer moments) row-sharded over 'table', all else
    replicated. The table must already be padded to a shard-divisible row
    count (sharded_embedding.shard_table) BEFORE the state was created, so
    Adam moments share the padded shape."""
    from jax.sharding import NamedSharding

    def place(path, leaf):
        names = {getattr(p, "key", getattr(p, "name", None)) for p in path}
        if table_sharded and "embedding_table" in names and getattr(
                leaf, "ndim", 0) == 2:
            return jax.device_put(leaf, NamedSharding(mesh, P(TABLE_AXIS, None)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, state)


def _table_lookup(cfg):
    if cfg.table_shards > 1:
        return lambda table, ids: gather_rows_sharded(table, ids, TABLE_AXIS)
    return lambda table, ids: jnp.take(table, ids, axis=0)


def _spmd_step_body(cfg, model, lookup):
    """Per-device step body (runs inside shard_map)."""
    def step(state, batch, base_rng):
        # distinct dropout stream per data shard (each DDP rank had its own)
        rng = jax.random.fold_in(
            jax.random.fold_in(base_rng, state.step),
            jax.lax.axis_index(DATA_AXIS),
        )

        def loss_sum_fn(params):
            loss_mean, scores = model.forward(
                params, cfg, batch, rng=rng,
                deterministic=cfg.deterministic, lookup=lookup,
            )
            wsum_local = jnp.sum(batch["weight"])
            hit = (jnp.argmax(scores, -1) == batch["label"]).astype(jnp.float32)
            hits_local = jnp.sum(hit * batch["weight"])
            return loss_mean * wsum_local, (wsum_local, hits_local)

        (loss_sum, (wsum, hits)), grads = jax.value_and_grad(
            loss_sum_fn, has_aux=True
        )(state.params)

        wsum_g = jax.lax.psum(wsum, DATA_AXIS)
        loss = jax.lax.psum(loss_sum, DATA_AXIS) / jnp.maximum(wsum_g, 1.0)
        acc = jax.lax.psum(hits, DATA_AXIS) / jnp.maximum(wsum_g, 1.0)

        # gradient of the GLOBAL weighted-mean loss
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, DATA_AXIS) / jnp.maximum(wsum_g, 1.0),
            grads,
        )

        tx = make_optimizer(cfg, state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(state.step + 1, params, opt_state),
            {"loss": loss, "acc": acc},
        )

    return step


def _gather_features(batch, news_feats):
    """Device-side feature gather (train/step.py:with_device_gather, here
    per-device inside shard_map: news_feats replicated, indices local)."""
    batch = dict(batch)
    batch["history"] = jnp.take(news_feats, batch.pop("history_idx"), axis=0)
    batch["candidate"] = jnp.take(news_feats, batch.pop("candidate_idx"),
                                  axis=0)
    return batch


def make_spmd_train_step(cfg, model, mesh, state: TrainState,
                         batch_example: dict, device_gather: bool = False):
    """Build the jitted shard_map train step for this mesh/state structure.

    device_gather=True: the step takes (state, batch, base_rng, news_feats)
    with index batches (history_idx/candidate_idx) and a replicated
    resident feature matrix — the host ships ~20x fewer bytes per step.
    """
    table_sharded = cfg.table_shards > 1
    st_specs = state_pspecs(state, table_sharded)
    b_specs = batch_pspecs(batch_example)
    step = _spmd_step_body(cfg, model, _table_lookup(cfg))

    if device_gather:
        def step_dg(state, batch, base_rng, news_feats):
            return step(state, _gather_features(batch, news_feats), base_rng)

        mapped = shard_map(
            step_dg, mesh=mesh,
            in_specs=(st_specs, b_specs, P(), P()),
            out_specs=(st_specs, {"loss": P(), "acc": P()}),
            check_vma=False,
        )
    else:
        mapped = shard_map(
            step, mesh=mesh,
            in_specs=(st_specs, b_specs, P()),
            out_specs=(st_specs, {"loss": P(), "acc": P()}),
            check_vma=False,
        )
    return jax.jit(mapped, donate_argnums=(0,) if cfg.donate_state else ())


def make_spmd_multi_step(cfg, model, mesh, state: TrainState,
                         batch_example: dict, steps_per_call: int,
                         device_gather: bool = False):
    """k SPMD train steps per dispatch: lax.scan over stacked batches INSIDE
    shard_map, so one XLA program covers k optimizer updates including all
    per-step collectives (see train/step.py:make_multi_step for why).

    stacked batches: every leaf (k, B, ...), batch dim sharded over 'data'.
    Returns per-step metric arrays of shape (k,).
    """
    table_sharded = cfg.table_shards > 1
    st_specs = state_pspecs(state, table_sharded)
    sb_specs = {k: P(None, DATA_AXIS) for k in batch_example}
    step = _spmd_step_body(cfg, model, _table_lookup(cfg))

    if device_gather:
        def multi(state, stacked_batches, base_rng, news_feats):
            def body(st, batch):
                return step(st, _gather_features(batch, news_feats),
                            base_rng)

            return jax.lax.scan(body, state, stacked_batches,
                                length=steps_per_call)

        in_specs = (st_specs, sb_specs, P(), P())
    else:
        def multi(state, stacked_batches, base_rng):
            def body(st, batch):
                return step(st, batch, base_rng)

            return jax.lax.scan(body, state, stacked_batches,
                                length=steps_per_call)

        in_specs = (st_specs, sb_specs, P())

    mapped = shard_map(
        multi, mesh=mesh,
        in_specs=in_specs,
        out_specs=(st_specs, {"loss": P(), "acc": P()}),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if cfg.donate_state else ())


def make_spmd_news_encoder(cfg, model, mesh, state: TrainState):
    """Sharded news-encoder apply for eval-time corpus encoding.

    features: (B, F) replicated; output news vectors replicated. Used when
    the table is row-sharded so eval never materializes the full table.
    """
    table_sharded = cfg.table_shards > 1
    p_specs = state_pspecs(state, table_sharded).params

    lookup = (
        (lambda table, ids: gather_rows_sharded(table, ids, TABLE_AXIS))
        if table_sharded else
        (lambda table, ids: jnp.take(table, ids, axis=0))
    )

    def encode(params, features):
        return model.news_encoder(params, cfg, features, lookup=lookup)

    mapped = shard_map(
        encode, mesh=mesh,
        in_specs=(p_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)
