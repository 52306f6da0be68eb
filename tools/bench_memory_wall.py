"""Memory-wall proof at MIND-large scale (VERDICT r4 task #6).

The reference replicates its frozen per-title embedding table on every GPU
(/root/reference/src/model/NAML.py:105-107): at MIND-large dims (~104k
news, BERT 768-d x 20 tokens) that is a (104_001, 15_360) f32 table —
~6.4 GB per device, the actual scaling wall (SURVEY.md §2.3). This tool
turns that claim into measured numbers, twice:

  --chip    one REAL-chip frozen doc_table NAML training run with the full
            6.4 GB table resident in HBM: reports ms/step, examples/s, and
            the device memory_stats deltas (table bytes, peak bytes).
  --dryrun  the SAME table through the 4-way row-sharded path on an
            8-virtual-CPU (data=2, table=4) mesh: asserts every device
            holds ~1/4 of the table and runs one spmd step end to end —
            the multi-chip configuration where per-chip table memory drops
            with the table axis instead of being replicated.

    python tools/bench_memory_wall.py --chip
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_memory_wall.py --dryrun
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# MIND-large dims (README.md of MIND; the reference inline comment
# NAML.py:49-50 quotes the MIND-small BERT table as (51283, 15360))
NUM_NEWS = 104_000
T, WD = 20, 768
NEWS_DIM = 400


def make_cfg(batch_size: int, table_shards: int = 1):
    from newsrecommendation_tpu.config import Config

    return Config(
        model="NAML", title_source="doc_table", num_words_title=T,
        word_embedding_dim=WD, news_dim=NEWS_DIM, news_query_vector_dim=200,
        user_query_vector_dim=200, user_log_length=50, npratio=4,
        batch_size=batch_size, drop_rate=0.2, lr=3e-4,
        freeze_embedding=True, use_category=True, use_subcategory=True,
        compute_dtype="bfloat16", deterministic=False,
        table_shards=table_shards,
    )


def make_table_dims(num_rows: int, width: int) -> np.ndarray:
    """(num_rows, width) f32 filled from a tiled random block (full random
    generation of 1.6e9 floats is minutes on this host; the values only
    need to be non-degenerate)."""
    rng = np.random.default_rng(0)
    block = rng.normal(0, 0.06, size=(1024, width)).astype(np.float32)
    reps = -(-num_rows // 1024)
    table = np.tile(block, (reps, 1))[:num_rows]
    table[0] = 0.0
    return table


def make_table(num_rows: int) -> np.ndarray:
    return make_table_dims(num_rows, T * WD)


def make_batches(cfg, n_cat: int, count: int = 8, num_news: int = NUM_NEWS):
    out = []
    b, l, k = cfg.batch_size, cfg.user_log_length, cfg.npratio
    f = cfg.news_feature_width
    for seed in range(count):
        r = np.random.default_rng(seed)

        def rows(shape):
            a = np.zeros(shape + (f,), np.int32)
            a[..., 0] = r.integers(0, num_news + 1, size=shape)
            a[..., 1] = r.integers(0, n_cat + 1, size=shape)
            a[..., 2] = r.integers(0, n_cat + 1, size=shape)
            return a

        out.append({
            "history": rows((b, l)),
            "history_mask": (r.random((b, l)) > 0.3).astype(np.float32),
            "candidate": rows((b, 1 + k)),
            "label": r.integers(0, k + 1, size=(b,)).astype(np.int32),
            "weight": np.ones((b,), np.float32),
        })
    return out


def run_chip(batch_size: int, iters: int = 60):
    import jax
    import jax.numpy as jnp

    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.train import create_train_state
    from newsrecommendation_tpu.train.step import make_train_step

    dev = jax.devices()[0]

    def mem():
        try:
            s = dev.memory_stats()
            return {"bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use")}
        except Exception:  # noqa: BLE001 — not all backends expose stats
            return {}

    cfg = make_cfg(batch_size)
    model = get_model(cfg.model)
    n_cat = 300
    mem0 = mem()
    t0 = time.perf_counter()
    table = make_table(NUM_NEWS + 1)
    t_host = time.perf_counter() - t0
    table_bytes = table.nbytes

    t0 = time.perf_counter()
    params = model.init(jax.random.PRNGKey(0), cfg, table, n_cat, n_cat)
    params["embedding_table"] = jax.device_put(params["embedding_table"])
    jax.block_until_ready(params["embedding_table"])
    t_place = time.perf_counter() - t0
    del table
    state = create_train_state(cfg, params)
    step = make_train_step(cfg, model)
    mem1 = mem()

    batches = [{k: jnp.asarray(v) for k, v in b.items()}
               for b in make_batches(cfg, n_cat)]
    rng = jax.random.PRNGKey(0)
    for i in range(5):
        state, m = step(state, batches[i % 8], rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batches[i % 8], rng)
    float(m["loss"])
    dt = time.perf_counter() - t0
    mem2 = mem()
    print(json.dumps({
        "mode": "chip", "model": "NAML doc_table frozen",
        "table_shape": [NUM_NEWS + 1, T * WD],
        "table_gb": round(table_bytes / 2**30, 2),
        "host_table_build_s": round(t_host, 1),
        "table_place_s": round(t_place, 1),
        "batch_size": batch_size,
        "ms_per_step": round(1e3 * dt / iters, 2),
        "examples_per_sec": round(iters * batch_size / dt, 1),
        "mem_before": mem0, "mem_after_place": mem1, "mem_after_steps": mem2,
    }), flush=True)


def run_dryrun(batch_size: int, table_shards: int = 4,
               num_news: int = NUM_NEWS, row_width: int = T * WD,
               quiet: bool = False):
    """Sharded-table memory proof on the virtual-CPU mesh; returns the
    result record. num_news/row_width default to the full MIND-large dims
    (~6 GB host RAM); tests/test_sharding.py runs the same code at
    reduced dims — the per-device-bytes assertion is shape arithmetic and
    scale-invariant."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8")
    import jax.numpy as jnp

    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.parallel.mesh import make_mesh
    from newsrecommendation_tpu.parallel.sharded_embedding import shard_table
    from newsrecommendation_tpu.parallel.spmd import (
        make_spmd_train_step, place_state,
    )
    from newsrecommendation_tpu.train import create_train_state

    cfg = make_cfg(batch_size, table_shards=table_shards)
    if row_width != T * WD:
        assert row_width % cfg.num_words_title == 0
        cfg = cfg.replace(
            word_embedding_dim=row_width // cfg.num_words_title,
            news_dim=128, news_query_vector_dim=32, user_query_vector_dim=32,
            num_attention_heads=8)
    model = get_model(cfg.model)
    n_cat = 300
    mesh = make_mesh(data_parallel=8 // table_shards,
                     table_shards=table_shards)
    table = shard_table(make_table_dims(num_news + 1, row_width),
                        table_shards)
    total_bytes = table.nbytes
    params = model.init(jax.random.PRNGKey(0), cfg, table, n_cat, n_cat)
    state = create_train_state(cfg, params)
    del table, params
    state = place_state(state, mesh, table_sharded=True)

    arr = state.params["embedding_table"]
    shard_bytes = {s.data.nbytes for s in arr.addressable_shards}
    assert len(shard_bytes) == 1, shard_bytes
    per_device = shard_bytes.pop()
    assert abs(per_device * table_shards - total_bytes) <= total_bytes * 0.01, (
        per_device, total_bytes)

    host_batch = make_batches(cfg, n_cat, count=1, num_news=num_news)[0]
    step = make_spmd_train_step(cfg, model, mesh, state, host_batch)
    from newsrecommendation_tpu.parallel.mesh import shard_batch
    batch = shard_batch(mesh, {k: jnp.asarray(v)
                               for k, v in host_batch.items()})
    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(0))
    loss = float(m["loss"])
    record = {
        "mode": "dryrun", "mesh": dict(mesh.shape),
        "table_shape": [num_news + 1, row_width],
        "table_gb_total": round(total_bytes / 2**30, 2),
        "table_bytes_total": total_bytes,
        "table_bytes_per_device": per_device,
        "table_gb_per_device": round(per_device / 2**30, 2),
        "replication_factor_vs_reference": table_shards,
        "step_ok": bool(np.isfinite(loss)),
        "loss": round(loss, 4),
        "step_s_cold": round(time.perf_counter() - t0, 1),
    }
    if not quiet:
        print(json.dumps(record), flush=True)
    return record


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--chip", action="store_true")
    ap.add_argument("--dryrun", action="store_true")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--table_shards", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl", "rbg")

    if args.dryrun:
        run_dryrun(args.batch_size, args.table_shards)
    if args.chip:
        run_chip(args.batch_size)


if __name__ == "__main__":
    main()
