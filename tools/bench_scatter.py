"""Measure embedding-table gradient strategies on TPU.

The NRMS word-ids config gathers B*(1+K)*T + B*L*T = 128*5*20 + 128*50*20
= 140,800 word ids per step from a (30k, 300) table; the gather's transpose
is a scatter-add PERF.md measured at ~5.7 ms/step (f32). Candidates:

  take       — jnp.take; XLA scatter-add backward (baseline)
  sorted     — custom VJP: argsort ids, gather-sorted grads, scatter with
               indices_are_sorted hint
  segsum     — custom VJP: sort + segment_sum(num_segments=vocab)
  onehot     — dL/dT = onehot(ids)^T @ g as one MXU matmul (dense, f32)
  onehot_bf16— same, bf16 operands / f32 accumulate
"""

import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    V, D = 30000, 300
    N = 140800  # flattened id count per step at the bench config
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    # zipf-ish id distribution like natural word frequencies
    ids0 = jnp.asarray((rng.zipf(1.3, size=N) % V).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    def grad_of(lookup):
        def loss(t, ids):
            return jnp.vdot(lookup(t, ids), g)
        return jax.jit(jax.grad(loss))

    def take(t, ids):
        return jnp.take(t, ids, axis=0)

    def sorted_scatter(t, ids):
        return jnp.take(t, ids, axis=0)
    # build custom-vjp variants
    import functools

    @jax.custom_vjp
    def lookup_sorted(t, ids):
        return jnp.take(t, ids, axis=0)
    def _ls_fwd(t, ids):
        return jnp.take(t, ids, axis=0), (ids, t.shape[0])
    def _ls_bwd(res, gy):
        ids, V = res
        order = jnp.argsort(ids)
        sid = ids[order]
        sg = jnp.take(gy, order, axis=0)
        dt = jnp.zeros((V, gy.shape[-1]), gy.dtype).at[sid].add(
            sg, indices_are_sorted=True)
        return dt, None
    lookup_sorted.defvjp(_ls_fwd, _ls_bwd)

    @jax.custom_vjp
    def lookup_segsum(t, ids):
        return jnp.take(t, ids, axis=0)
    def _seg_fwd(t, ids):
        return jnp.take(t, ids, axis=0), (ids, t.shape[0])
    def _seg_bwd(res, gy):
        ids, V = res
        dt = jax.ops.segment_sum(gy, ids, num_segments=V)
        return dt, None
    lookup_segsum.defvjp(_seg_fwd, _seg_bwd)

    def make_onehot(dtype):
        @jax.custom_vjp
        def lookup_oh(t, ids):
            return jnp.take(t, ids, axis=0)
        def _oh_fwd(t, ids):
            return jnp.take(t, ids, axis=0), (ids, t.shape[0])
        def _oh_bwd(res, gy):
            ids, V = res
            oh = jax.nn.one_hot(ids, V, dtype=dtype)   # (N, V)
            dt = jax.lax.dot_general(
                oh, gy.astype(dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dt, None
        lookup_oh.defvjp(_oh_fwd, _oh_bwd)
        return lookup_oh

    # bf16 scatter: the kernels already hand back bf16 row grads (bf16
    # activations); scattering at bf16 halves the scatter's HBM bytes and
    # skips the up-front f32 conversion of 140,800 rows, converting the
    # (V, D) result once instead. Accumulation precision: collisions
    # average ~4.7 rows/slot at this shape, bf16 sum loses ~3 decimal
    # digits — Adam's 3e-4 lr and f32 moments absorb it (A/B'd for the
    # parity configs before any default flip).
    @jax.custom_vjp
    def lookup_bf16scatter(t, ids):
        return jnp.take(t, ids, axis=0)

    def _b16_fwd(t, ids):
        return jnp.take(t, ids, axis=0), (ids, t.shape[0])

    def _b16_bwd(res, gy):
        ids, V = res
        dt = jnp.zeros((V, gy.shape[-1]), jnp.bfloat16).at[ids].add(
            gy.astype(jnp.bfloat16))
        return dt.astype(jnp.float32), None
    lookup_bf16scatter.defvjp(_b16_fwd, _b16_bwd)

    # onehot variants dropped: one_hot(ids, V) at N=140800, V=30000 is a
    # 4.2e9-element intermediate (~17 GB f32) — infeasible at this shape.
    variants = {
        "take": take,
        "sorted": lookup_sorted,
        "segsum": lookup_segsum,
        "take_bf16": lookup_bf16scatter,
    }

    # pre-staged id rotations (device arrays): eager per-iteration id math
    # would compile a new tiny executable per distinct python constant
    host_ids = np.asarray(ids0)
    ids_list = [jnp.asarray((host_ids + i) % V) for i in range(8)]
    for name, fn in variants.items():
        gfn = grad_of(fn)
        # chain: feed the grad back as the next table (same shape) to defeat
        # memoization; rotate pre-staged ids per call
        t = table
        t = gfn(t, ids_list[0]); jax.block_until_ready(t)
        n = 30
        t0 = time.perf_counter()
        for i in range(n):
            t = gfn(t, ids_list[i % 8])
        jax.block_until_ready(t)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:12s}: {dt*1e3:7.3f} ms/grad", flush=True)

if __name__ == "__main__":
    main()
