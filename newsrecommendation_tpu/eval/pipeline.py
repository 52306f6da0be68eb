"""Two-phase evaluation pipeline.

Phase 1 — whole-corpus news-vector cache: the jitted news encoder runs over
the combined feature matrix in fixed-size chunks (one compile), producing
the (num_news+1, news_dim) cache the reference builds batch-by-batch with
per-batch device->host copies (main.py:185-198). The cache stays on device.

Phase 2 — impression scoring: for each fixed-shape batch of padded
impressions, ONE jitted computation gathers history news vectors from the
cache, runs the user encoder, gathers+scores candidates, and computes all
ranking metrics — replacing the reference's per-impression CPU numpy loop
(main.py:240-263). Only the scalar metric sums come back to the host.

The doc-sim sanity probe (mean cosine similarity over random pairs,
main.py:201-208) is vectorized to a single batched computation.
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from newsrecommendation_tpu.metrics import impression_metrics
from newsrecommendation_tpu.ops.scoring import score_cached_impressions
from newsrecommendation_tpu.train.prefetch import stage_ahead


def compute_news_scoring(model, params, cfg, news_features: np.ndarray,
                         encode_fn=None, mesh=None) -> jax.Array:
    """Encode the whole corpus -> (num_news+1, news_dim) on-device cache.

    encode_fn: optional pre-built (e.g. sharded) encoder apply; defaults to
    a jitted model.news_encoder closure. mesh: when given (single-process,
    no custom encode_fn), chunk rows are sharded over the 'data' axis so
    phase 1 uses every chip like phase 2 does — the reference's phase-1
    loop runs on one device per process (main.py:185-198).
    """
    n = news_features.shape[0]
    chunk = min(cfg.eval_news_chunk, max(n, 1))
    if (encode_fn is None and mesh is not None
            and jax.process_count() == 1 and mesh.shape.get("data", 1) > 1):
        from jax.sharding import NamedSharding, PartitionSpec as P

        d = mesh.shape["data"]
        chunk = -(-chunk // d) * d  # row-sharding needs divisibility
        row_sharding = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)
        jit_encode = _news_encode_jit(model, cfg)

        def encode_fn(p, feats):
            return jit_encode(p, jax.device_put(np.asarray(feats),
                                                row_sharding))
    if encode_fn is None:
        encode_fn = _news_encode_jit(model, cfg)
    pad = (-n) % chunk
    feats = np.concatenate(
        [news_features, np.zeros((pad,) + news_features.shape[1:],
                                 news_features.dtype)]
    ) if pad else news_features
    outs = []
    for start in range(0, feats.shape[0], chunk):
        # raw numpy slices: the encode_fn (jit or sharding wrapper) places
        # them; pre-committing with jnp.asarray would force an extra copy
        # on the sharded path
        outs.append(encode_fn(params, feats[start:start + chunk]))
    scoring = jnp.concatenate(outs, axis=0)[:n]
    # row 0 is the unknown-news vector; the reference computes it from the
    # zero feature row (not forced to zero), so keep whatever the encoder
    # produced for the zero row — history gathering relies on mask, not row 0.
    return scoring


@jax.jit
def _sims(vecs, ii, jj, kk):
    # module-level jit (one trace per shape for the process), not a
    # per-call closure — a fresh jit object per probe call re-traced and
    # re-compiled this every evaluation
    a = jnp.take(vecs, ii, axis=0)
    b = jnp.take(vecs, jj, axis=0)
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    sims = jnp.sum(a * b, axis=-1) / jnp.maximum(na * nb, 1e-12)
    return jnp.sum(sims * kk)


def doc_sim_probe(news_scoring, num_pairs: int = 1_000_000,
                  seed: int = 0) -> float:
    """Mean cosine similarity over random news-vector pairs (rows >= 1).

    Collapse detector: a degenerate news encoder drives this toward 1
    (reference main.py:201-208, which loops 1M numpy dots on the host).
    """
    n = news_scoring.shape[0]
    if n <= 2:
        return float("nan")
    rng = np.random.default_rng(seed)
    i = rng.integers(1, n, size=num_pairs)
    j = rng.integers(1, n, size=num_pairs)
    keep = i != j  # reference skips i == j pairs (still divides by 1M)

    total = 0.0
    step = 262144  # bound device memory for the gathered pairs
    vecs = jnp.asarray(news_scoring)
    for s in range(0, num_pairs, step):
        total += float(_sims(vecs, jnp.asarray(i[s:s + step]),
                             jnp.asarray(j[s:s + step]),
                             jnp.asarray(keep[s:s + step], dtype=np.float32)))
    return total / num_pairs


@functools.lru_cache(maxsize=32)
def _news_encode_jit(model, cfg):
    """Cached per-(model, cfg) jitted corpus encoder: a fresh jit object
    per call would re-trace and (on a remote-TPU service) re-COMPILE the
    same program every evaluation — ~50 s/call through the tunnel
    (measured round 4). Config is a frozen dataclass, models are
    get_model singletons, so the cache key is exact."""
    return jax.jit(lambda p, feats: model.news_encoder(p, cfg, feats))


def _eval_metrics_body(model, cfg, params, news_scoring, batch):
    params = {"user_encoder": params["user_encoder"]}  # enforce contract
    hist_vecs = jnp.take(news_scoring, batch["history"], axis=0)
    user_vecs = model.user_encoder(params, cfg, hist_vecs,
                                   batch["history_mask"])
    scores = score_cached_impressions(news_scoring, batch["candidates"],
                                      user_vecs)
    return impression_metrics(scores, batch["labels"],
                              batch["candidate_mask"])


@functools.lru_cache(maxsize=32)
def make_eval_step(model, cfg):
    """One jitted eval computation per fixed-shape impression batch.

    CONTRACT: eval_step may read ONLY params["user_encoder"] — phase 2
    scores from the news cache, never the embedding table or the news
    encoder (the table may be row-sharded across processes and is not
    fetchable; the multi-controller path below passes a params dict
    holding nothing else). A model whose user path needs other subtrees
    must extend that path, not silently read more here.
    """

    @jax.jit
    def eval_step(params, news_scoring, batch):
        return _eval_metrics_body(model, cfg, params, news_scoring, batch)

    return eval_step


@functools.lru_cache(maxsize=32)
def make_eval_step_acc(model, cfg):
    """Accumulating variant: the running metric sums ride INSIDE the jit,
    so phase 2 costs exactly ONE device dispatch per batch. The previous
    eager per-batch `sums[k] + out[k]` adds were 5 separate tiny XLA
    dispatches, which on a remote-TPU transport cost an RPC round trip
    each — profiled round 5 as ~5 ms of the 8.7 ms/batch wall at C=320
    (device compute: 1.8 ms, host->device transfer: 0.9 ms). Same
    params-subtree contract as make_eval_step."""

    @jax.jit
    def eval_step_acc(params, news_scoring, batch, sums):
        out = _eval_metrics_body(model, cfg, params, news_scoring, batch)
        return {k: sums[k] + out[k] for k in sums}

    return eval_step_acc


@functools.lru_cache(maxsize=32)
def make_eval_multi_step_acc(model, cfg, k: int):
    """k stacked eval batches per device dispatch, scanned inside one jit.

    Round-5 profiling at C=320/batch 128: device compute 1.8 ms and
    host->device transfer 0.9 ms per batch, yet the loop walls ~8 ms per
    batch — the per-dispatch overhead of the remote-TPU transport
    dominates, and neither bigger batches (512: +6%) nor in-jit sum
    accumulation (+8%) moves it. Amortizing k batches per dispatch
    divides that overhead by k — the eval twin of the train loop's
    cfg.steps_per_call scan (train/step.py:make_multi_step). Leftover
    batches (< k at end of shard) go through the single-step program.
    """

    @jax.jit
    def eval_multi_acc(params, news_scoring, stacked, sums):
        def body(s, batch):
            out = _eval_metrics_body(model, cfg, params, news_scoring, batch)
            return {kk: s[kk] + out[kk] for kk in s}, jnp.zeros(())

        sums, _ = jax.lax.scan(body, sums, stacked)
        return sums

    return eval_multi_acc


def combine_metric_sums(per_shard_sums) -> Dict[str, float]:
    """Sum metric-sum dicts from several eval shards into one (the exact
    math of the reference's two dist.reduce(SUM) calls, main.py:269-275)."""
    total: Dict[str, float] = {}
    for sums in per_shard_sums:
        for k, v in sums.items():
            total[k] = total.get(k, 0.0) + float(v)
    return total


def cross_process_sum(sums: Dict[str, float]) -> Dict[str, float]:
    """All-reduce metric sums across JAX processes.

    Single-process (including single-process multi-device meshes, where the
    per-batch work is already sharded over 'data') this is the identity.
    On a multi-controller deployment every process evaluates its own
    behaviors_{process_index}.tsv shard and this gathers + sums the scalar
    sums from all of them — the reference's dist.reduce(SUM) to rank 0
    (main.py:269-275), except the result is replicated to every process.
    """
    if jax.process_count() == 1:
        return dict(sums)
    from jax.experimental import multihost_utils

    keys = sorted(sums)
    local = np.asarray([sums[k] for k in keys], dtype=np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(local))
    return combine_metric_sums(
        [dict(zip(keys, row)) for row in gathered.reshape(-1, len(keys))]
    )


def summarize_metric_sums(sums: Dict[str, float],
                          samples_seen: float) -> Dict[str, float]:
    """Weighted means from (possibly globally-reduced) metric sums."""
    sums = dict(sums)
    count = max(sums.pop("count"), 1.0)
    result = {k: v / count for k, v in sums.items()}
    result["count"] = count
    result["samples_seen"] = float(samples_seen)
    return result


def evaluate_impressions(model, params, cfg, eval_samples, news_scoring,
                         log_every: Optional[int] = None,
                         mesh=None, all_reduce: bool = True,
                         return_sums: bool = False) -> Dict[str, float]:
    """Run phase 2 over this process's impressions; returns mean metrics.

    Padded batch rows have all-zero candidate masks, so they are excluded by
    the degenerate-impression filter automatically — as are real impressions
    with all-0/all-1 labels (reference main.py:250-251). With a mesh, each
    batch's rows are sharded over the 'data' axis so the user-encoder and
    pairwise-AUC work spread across local chips. Across PROCESSES, each
    process runs over its own impression shard and (all_reduce=True) the
    host-side scalar metric sums are combined with ``cross_process_sum`` —
    the reference's dist.reduce pattern (main.py:269-275).

    return_sums=True returns the raw LOCAL sums dict instead of means
    (used by tests to check shard-combine math against a full run).
    """
    eval_step_acc = make_eval_step_acc(model, cfg)
    batch_sharding = None
    if mesh is not None and jax.process_count() > 1:
        # Multi-controller: every process evaluates its OWN impression shard
        # (different line counts => different batch counts per process), so
        # phase 2 must be a process-LOCAL program — a jit over the global
        # mesh would be a cross-process collective requiring lockstep
        # dispatch, and device_put cannot place host rows on another
        # process's devices. Re-place the (replicated) user-encoder params
        # and the news cache on this process's local mesh and shard batch
        # rows over its local 'data' devices only. Found by
        # tests/test_multiprocess.py — the live 2-process cluster test.
        from jax.sharding import NamedSharding, PartitionSpec as P

        local_mesh = mesh.local_mesh
        # eval_step only reads params["user_encoder"] (phase 2 scores from
        # the news cache, never the embedding table — which may be
        # row-sharded across processes and thus not fetchable).
        uparams = jax.tree_util.tree_map(np.asarray,
                                         dict(params)["user_encoder"])
        ns_host = np.asarray(news_scoring)
        if cfg.eval_batch_size % local_mesh.shape["data"] == 0:
            rep = NamedSharding(local_mesh, P())
            params = jax.device_put({"user_encoder": uparams}, rep)
            news_scoring = jax.device_put(ns_host, rep)
            batch_sharding = NamedSharding(local_mesh, P("data"))
        else:
            params = {"user_encoder": jax.tree_util.tree_map(jnp.asarray,
                                                             uparams)}
            news_scoring = jnp.asarray(ns_host)
    elif mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        news_scoring = jnp.asarray(news_scoring)
        batch_sharding = NamedSharding(mesh, P("data"))
    else:
        news_scoring = jnp.asarray(news_scoring)
    metric_keys = ("auc", "mrr", "ndcg5", "ndcg10", "count")
    # Device-side accumulation: fetching float(out[k]) every batch would
    # block the dispatch thread on each step's result, serializing host
    # padding with device compute. Instead the scalar sums stay on device
    # (one tiny fused add per batch). Every _FOLD_EVERY batches (and at log
    # points) they fold into a host float64 accumulator — bounding the
    # float32 running-sum drift vs the reference's float64 host
    # accumulation (main.py:269-275) to ~_FOLD_EVERY terms while keeping
    # dispatch async between folds.
    _FOLD_EVERY = 64
    sums_host = {k: 0.0 for k in metric_keys}  # float64
    sums_dev = {k: jnp.zeros(()) for k in metric_keys}
    seen = 0

    def fold():
        nonlocal sums_dev
        for k in metric_keys:
            sums_host[k] += float(sums_dev[k])  # sync point
        sums_dev = {k: jnp.zeros(()) for k in metric_keys}

    kk = max(1, int(getattr(cfg, "eval_steps_per_call", 8)))
    eval_multi_acc = (make_eval_multi_step_acc(model, cfg, kk)
                      if kk > 1 else None)
    stacked_sharding = None
    if batch_sharding is not None and kk > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        stacked_sharding = NamedSharding(batch_sharding.mesh,
                                         P(None, "data"))

    def grouped():
        pending = []
        for batch in eval_samples.iter_batches(cfg.eval_batch_size):
            if kk == 1:
                yield "single", [batch]
                continue
            pending.append(batch)
            if len(pending) == kk:
                yield "stack", pending
                pending = []
        for batch in pending:  # < kk leftovers: single-step program
            yield "single", [batch]

    def stage(item):
        kind, batches = item
        num_real = sum(b["num_real"] for b in batches)

        def put(v, sh):
            return jnp.asarray(v) if sh is None else jax.device_put(v, sh)

        if kind == "stack":
            dev = {k: put(np.stack([b[k] for b in batches]),
                          stacked_sharding)
                   for k in batches[0] if k != "num_real"}
        else:
            dev = {k: put(v, batch_sharding)
                   for k, v in batches[0].items() if k != "num_real"}
        return kind, dev, num_real

    staged = stage_ahead(grouped(), stage,
                         depth=getattr(cfg, "prefetch_depth", 2))
    for cnt, (kind, dev_batch, num_real) in enumerate(staged):
        if kind == "stack":
            sums_dev = eval_multi_acc(params, news_scoring, dev_batch,
                                      sums_dev)
        else:
            sums_dev = eval_step_acc(params, news_scoring, dev_batch,
                                     sums_dev)
        seen += num_real
        if (cnt + 1) % _FOLD_EVERY == 0:
            fold()
        if log_every and cnt % log_every == 0:
            fold()
            c = max(sums_host["count"], 1.0)
            logging.info(
                "[eval] %d samples: AUC %.2f MRR %.2f nDCG5 %.2f nDCG10 %.2f",
                seen, 100 * sums_host["auc"] / c, 100 * sums_host["mrr"] / c,
                100 * sums_host["ndcg5"] / c, 100 * sums_host["ndcg10"] / c,
            )
    fold()
    sums = dict(sums_host)
    if return_sums:
        sums["samples_seen"] = float(seen)
        return sums
    if all_reduce:
        global_sums = cross_process_sum(dict(sums, samples_seen=float(seen)))
        seen = global_sums.pop("samples_seen")
        sums = global_sums
    return summarize_metric_sums(sums, seen)
