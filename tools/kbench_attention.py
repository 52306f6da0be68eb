"""Microbenchmark: in-kernel attention formulations at the NRMS shape.

Forward-only, attention op in isolation (N=7040 rows, T=20, 20 heads x d=20)
so compile cycles stay short. Variants:

  headloop   production exp_mhsa_qkv (per-head bn-batched dots)
  blanes     experimental batch-in-lanes kernel
  xla        the jnp VPU small-head path (what no-pallas uses)

    python tools/kbench_attention.py [--variants headloop,blanes,xla]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="headloop,blanes,xla")
    ap.add_argument("--grad", action="store_true",
                    help="time forward+backward (sum-of-tanh loss) instead "
                         "of forward only")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--n", type=int, default=7040)
    ap.add_argument("--t", type=int, default=20)
    ap.add_argument("--heads", type=int, default=20)
    ap.add_argument("--d", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from newsrecommendation_tpu.ops import attention as A
    from newsrecommendation_tpu.ops.pallas import exp_mhsa_qkv
    from newsrecommendation_tpu.ops.pallas.experimental_blanes import (
        exp_mhsa_qkv_blanes,
    )

    dt = jnp.dtype(args.dtype)
    n, t, h, d = args.n, args.t, args.heads, args.d
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, t, 3 * h * d)), dt)
    print(f"backend: {jax.default_backend()} shape=({n},{t},{3*h*d}) "
          f"dtype={dt.name}", flush=True)

    def xla_path(qkv):
        hd = h * d
        q = qkv[..., :hd].reshape(n, t, h, d)
        k = qkv[..., hd:2 * hd].reshape(n, t, h, d)
        v = qkv[..., 2 * hd:].reshape(n, t, h, d)
        scores = (q[:, :, None] * k[:, None, :]).sum(-1) / math.sqrt(d)
        attn = A.masked_exp_normalize(scores, None, axis=2)
        ctx = (attn[..., None].astype(v.dtype) * v[:, None]).sum(2)
        return ctx.reshape(n, t, hd)

    from newsrecommendation_tpu.ops.pallas.experimental_qkv2d import exp_mhsa_qkv_bias_2d

    zero_bias = jnp.zeros((3 * h * d,), dt)

    def qkv2d_path(qkv, br=128):
        # same contract as the other variants ((N,T,3HD) in / (N,T,HD)
        # out) so outputs compare; the 2-D reshape at the boundary is what
        # the production integration ELIDES (the projection's native
        # output is already 2-D) — kernel-only time is what differs.
        o = exp_mhsa_qkv_bias_2d(qkv.reshape(n * t, 3 * h * d), zero_bias,
                                 h, t, br)
        return o

    variants = {
        "headloop": jax.jit(lambda qkv: exp_mhsa_qkv(qkv, h)),
        "blanes": jax.jit(lambda qkv: exp_mhsa_qkv_blanes(qkv, h)),
        "xla": jax.jit(xla_path),
        "qkv2d": jax.jit(qkv2d_path),
    }

    def resolve(name):
        # "headloop@256" -> exp_mhsa_qkv with block_rows=256 (the backward
        # kernel targets block_rows//2, so @256 doubles the bwd block).
        # "probs[@N]" -> same entry point with bwd_residuals="probs" (the
        # residual-mode switch is applied per-variant in the main loop at
        # trace time; only meaningful with --grad).
        if name not in variants:
            base, _, br = name.partition("@")
            br = int(br) if br else 128
            assert base in ("headloop", "probs", "qkv2d"), name
            if base == "qkv2d":
                variants[name] = jax.jit(
                    lambda qkv, br=br: qkv2d_path(qkv, br))
            else:
                variants[name] = jax.jit(
                    lambda qkv, br=br: exp_mhsa_qkv(qkv, h, br))
        return variants[name]

    if args.grad:
        def as_grad(f):
            return jax.jit(jax.grad(lambda qkv: jnp.sum(jnp.tanh(
                f(qkv).astype(jnp.float32)))))
    else:
        def as_grad(f):
            return f

    from newsrecommendation_tpu.ops.pallas.config import set_bwd_residuals

    want = None
    for name in args.variants.split(","):
        # residual mode is read at trace time inside the custom-VJP rules
        set_bwd_residuals("probs" if name.startswith("probs")
                          else "recompute")
        fn = as_grad(resolve(name))
        # chain x -> f(x) padded back to qkv width to defeat memoization
        if args.grad:
            # dqkv already has qkv's shape; mix in x so values keep moving
            def chained(x, fn=fn):
                return fn(x) + 0.5 * x
        else:
            def chained(x, fn=fn):
                o = fn(x)
                return jnp.concatenate([o, o, x[..., 2 * h * d:]], axis=-1)

        chained = jax.jit(chained)
        x = chained(x0)
        jax.block_until_ready(x)
        out = np.asarray(fn(x0), np.float32)
        if want is None:
            want = out
        else:
            err = np.max(np.abs(out - want)) / (np.max(np.abs(want)) + 1e-9)
            print(f"  {name}: max rel err vs first variant = {err:.2e}",
                  flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            x = chained(x)
        jax.block_until_ready(x)
        dtime = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dtime * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
