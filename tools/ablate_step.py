"""Ablate the train step to locate where the time goes.

Times, with the memoization-safe chaining protocol (tools/microbench.py):
  fwd        forward only (loss)
  grad       forward + backward (value_and_grad)
  full       forward + backward + Adam (the real train step)
  news_enc   news encoder alone over the step's B*(1+K+L) rows
  user_enc   user encoder alone
  gather     embedding-table gather alone

Each stage carries a scalar accumulator so every call's arguments differ
(the axon runtime memoizes bitwise-identical executions).

    python tools/ablate_step.py [--model NRMS] [--dtype float32] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_chain(fn, carry0, aux_sets, label, iters):
    import jax

    carry = fn(carry0, *aux_sets[0])
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for i in range(iters):
        carry = fn(carry, *aux_sets[i % len(aux_sets)])
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:10s}: {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl", "rbg")

    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.train import create_train_state
    from newsrecommendation_tpu.train.step import make_train_step

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="NRMS")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--stages", default="fwd,grad,full,news_enc,user_enc,gather")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    cfg = Config(
        model=args.model, title_source="word_ids", num_words_title=20,
        user_log_length=50, word_embedding_dim=300, news_dim=400,
        news_query_vector_dim=200, user_query_vector_dim=200,
        num_attention_heads=20, batch_size=128, npratio=4, drop_rate=0.2,
        lr=3e-4, deterministic=False, compute_dtype=args.dtype,
    )
    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    vocab = 30000
    table = rng.normal(0, 0.06, size=(vocab, cfg.word_embedding_dim)).astype(
        np.float32)
    table[0] = 0.0
    params = model.init(jax.random.PRNGKey(0), cfg, table)

    f = cfg.news_feature_width
    b = cfg.batch_size
    base_rng = jax.random.PRNGKey(0)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "history": jnp.asarray(r.integers(
                0, vocab, size=(b, cfg.user_log_length, f)), jnp.int32),
            "history_mask": jnp.asarray(
                (r.random((b, cfg.user_log_length)) > 0.3).astype(np.float32)),
            "candidate": jnp.asarray(r.integers(
                0, vocab, size=(b, 1 + cfg.npratio, f)), jnp.int32),
            "label": jnp.asarray(r.integers(
                0, cfg.npratio + 1, size=(b,)), jnp.int32),
            "weight": jnp.ones((b,), jnp.float32),
        }

    batches = [(make_batch(s),) for s in range(8)]
    print(f"backend: {jax.default_backend()} model={cfg.model} "
          f"dtype={cfg.compute_dtype}", flush=True)

    if "fwd" in stages:
        @jax.jit
        def fwd(carry, batch):
            loss, _ = model.forward(params, cfg, batch, rng=base_rng,
                                    deterministic=False)
            return carry * 0.5 + loss  # decay keeps the chain bounded+unique

        _time_chain(fwd, jnp.zeros(()), batches, "fwd", args.iters)

    if "grad" in stages:
        def loss_fn(p, batch):
            loss, _ = model.forward(p, cfg, batch, rng=base_rng,
                                    deterministic=False)
            return loss

        @jax.jit
        def grad(carry, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            # gn must reach the output or XLA dead-code-eliminates backward
            gn = sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(
                grads))
            return carry * 0.5 + loss + gn * 1e-6

        _time_chain(grad, jnp.zeros(()), batches, "grad", args.iters)

    if "full" in stages:
        train_step = make_train_step(cfg, model, donate=True)
        # fresh state over COPIED params: donation must not eat the params
        # the later component stages still read
        st0 = create_train_state(
            cfg, jax.tree_util.tree_map(jnp.array, params))
        st, m = train_step(st0, batches[0][0], base_rng)  # compile
        st, m = train_step(st, batches[1][0], base_rng)
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            st, m = train_step(st, batches[i % 8][0], base_rng)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{'full':10s}: {dt * 1e3:8.2f} ms", flush=True)

    rows = b * (1 + cfg.npratio + cfg.user_log_length)
    if "news_enc" in stages:
        @jax.jit
        def news_enc(carry, batch):
            flat = jnp.concatenate(
                [batch["candidate"].reshape(-1, f),
                 batch["history"].reshape(-1, f)], axis=0)
            vecs = model.news_encoder(params, cfg, flat, rng=base_rng,
                                      deterministic=False)
            return carry * 0.5 + jnp.sum(vecs)

        _time_chain(news_enc, jnp.zeros(()), batches,
                    f"news_enc({rows})", args.iters)

    if "user_enc" in stages:
        hv = [(jnp.asarray(np.random.default_rng(s).normal(
            size=(b, cfg.user_log_length, cfg.news_dim)).astype(np.float32)),
            batches[s][0]["history_mask"]) for s in range(8)]

        @jax.jit
        def user_enc(carry, vecs, mask):
            u = model.user_encoder(params, cfg, vecs, mask)
            return carry * 0.5 + jnp.sum(u)

        _time_chain(user_enc, jnp.zeros(()), hv, "user_enc", args.iters)

    if "gather" in stages:
        @jax.jit
        def gather(carry, batch):
            flat = jnp.concatenate(
                [batch["candidate"].reshape(-1, f),
                 batch["history"].reshape(-1, f)], axis=0)
            w = jnp.take(params["embedding_table"], flat[:, 0], axis=0)
            return carry * 0.5 + jnp.sum(w)

        _time_chain(gather, jnp.zeros(()), batches, "gather", args.iters)


if __name__ == "__main__":
    main()
