"""Micro-benchmark harness for the axon TPU runtime.

The runtime memoizes executions per (executable, arguments) pair, so naive
timing loops that reuse inputs measure cache hits, not compute. Every
iteration here feeds a UNIQUE input derived from the previous output, and
completion is forced with a scalar fetch at the end.

Usage:
    from tools.microbench import timeit
    timeit(lambda x: op(x), x0, label="op")   # f must map x -> same-shape x
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timeit(fn, x0, label: str = "", n: int = 40, flops: float | None = None,
           inner: int = 1):
    """Time fn: x -> x (same shape/dtype), chaining outputs to inputs.

    Returns seconds per call. The chain makes every call's argument unique
    (defeats memoization) and serializes execution (no overlap illusions).
    """
    x = fn(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / (n * inner)
    if label:
        extra = f" = {flops / dt / 1e12:.1f} TFLOP/s" if flops else ""
        print(f"{label}: {dt * 1e3:.3f} ms{extra}")
    return dt


def timeit_state(step_fn, state0, aux_sets, label: str = "", n: int = 40):
    """Time step_fn(state, *aux) -> state (a train-step-like chain).

    aux_sets: a LIST of >=2 distinct aux-arg tuples, rotated per call. With
    donated state the output reuses the input buffers, so a single fixed
    aux set makes every call identical at the buffer level and the runtime
    memoizes it — rotation forces real execution.
    """
    assert len(aux_sets) >= 2, "need >=2 distinct aux sets to defeat memoization"
    state = step_fn(state0, *aux_sets[0])
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for i in range(n):
        state = step_fn(state, *aux_sets[i % len(aux_sets)])
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / n
    if label:
        print(f"{label}: {dt * 1e3:.3f} ms")
    return dt, state
