"""Runtime switch for Pallas kernels.

Mode "auto" enables kernels on TPU backends and disables them on CPU (where
the jnp reference path is faster than interpreted Pallas). Tests force
"interpret" to exercise kernel code on CPU.
"""

from __future__ import annotations

_MODE = "auto"  # "auto" | "on" | "off" | "interpret"


def set_pallas_mode(mode: str) -> None:
    global _MODE
    if mode not in ("auto", "on", "off", "interpret"):
        raise ValueError(f"unknown pallas mode {mode!r}")
    _MODE = mode


def pallas_enabled() -> bool:
    if _MODE == "off":
        return False
    if _MODE in ("on", "interpret"):
        return True
    import jax

    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def pallas_interpret() -> bool:
    return _MODE == "interpret"


# The fused encoder-tail kernel (MHSA+dropout+pool in one kernel,
# ops/pallas/experimental_fused_encoder.py) is a documented EXPERIMENT, not a production
# path. Its Mosaic compile cost scales badly with the per-head unroll:
# measured on TPU v5e at the bench config (20 heads x d=20, bf16), the
# attention-only kernel compiles in ~140s but ONE fused-tail forward
# instance costs ~950s (dropout variant; most of it in lowering), the
# masked variant longer still, and the full train step embeds four such
# kernels (~1h of cold compile) — for an estimated ceiling of ~1-2 ms/step
# of saved context-tensor HBM traffic out of ~30 ms (see docs/PERF.md).
# Production NRMS runs 20 heads, and NAML's encoder tail has no MHSA, so a
# head-count auto-gate would only ever fire on toy test configs (where it
# once routed an unaligned block shape into a Mosaic compile error).
# "auto" therefore means OFF when compiled and ON only under interpret
# mode, which keeps the kernel exercised by tests at zero compile cost;
# "on" forces the experiment on hardware.
_FUSED_TAIL = "auto"  # "auto" | "on" | "off"


def set_fused_tail(mode) -> None:
    """mode: "auto"/"on"/"off" (bools accepted as on/off)."""
    global _FUSED_TAIL
    if isinstance(mode, bool):
        mode = "on" if mode else "off"
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown fused_tail mode {mode!r}")
    _FUSED_TAIL = mode


def fused_tail_enabled(n_heads: int | None = None) -> bool:
    if not pallas_enabled():
        return False
    if _FUSED_TAIL == "on":
        return True
    if _FUSED_TAIL == "off":
        return False
    # auto: interpret mode (tests) has no Mosaic compile cost — fuse;
    # compiled backends never auto-fuse (see the rationale above)
    return _MODE == "interpret"


# In-kernel attention formulation for the fused-QKV kernels. "headloop"
# (default) issues per-head bn-batched dots; "blanes" transposes each block
# to batch-in-lanes and runs the contractions as VPU multiply-reduces
# (ops/pallas/experimental_blanes.py). Switchable so hardware micro-benches can
# A/B the full train step.
_ATTN_LAYOUT = "headloop"  # "headloop" | "blanes"


def set_attention_layout(layout: str) -> None:
    global _ATTN_LAYOUT
    if layout not in ("headloop", "blanes"):
        raise ValueError(f"unknown attention layout {layout!r}")
    _ATTN_LAYOUT = layout


def attention_layout() -> str:
    return _ATTN_LAYOUT


# Kernel I/O layout for the fused-QKV attention kernels. "2d" feeds the
# QKV projection's NATIVE 2-D dot output (N*T, 3HD) straight into the
# kernel and regroups sublanes in VMEM (ops/pallas/qkv2d.py) — eliding the
# (N,T,3HD) relayout copy XLA otherwise inserts (the T=20 tiling tax,
# docs/PERF.md). Unmasked paths only; masked MHSA keeps the 3-D kernels.
_ATTN_IO = "3d"  # "3d" | "2d"


def set_attention_io(mode: str) -> None:
    """TRACE-TIME ONLY — see set_bwd_residuals; no effect on already-jitted
    steps."""
    global _ATTN_IO
    if mode not in ("3d", "2d"):
        raise ValueError(f"unknown attention io {mode!r}")
    _ATTN_IO = mode


def attention_io() -> str:
    return _ATTN_IO


# Sequence length at which MHSA dispatch switches from the full-T kernels
# (one (bn, T, T) score block per head in VMEM) to the key-axis blockwise
# flash kernel (ops/pallas/blockwise.py). Below this the full-T kernels win
# (single grid pass, no online-rescaling traffic); above it the quadratic
# score block approaches the VMEM budget. 512 keys x 512 queries x f32 =
# 1 MiB per head-block at block_rows rows — comfortably the crossover
# region for the 100 MiB VMEM limit used by the kernels.
_FLASH_MIN_SEQ = 512


def flash_min_seq() -> int:
    return _FLASH_MIN_SEQ


def set_flash_min_seq(t: int) -> None:
    global _FLASH_MIN_SEQ
    if t < 1:
        raise ValueError(f"flash_min_seq must be >= 1, got {t}")
    _FLASH_MIN_SEQ = t


# Residual strategy for the fused-QKV attention backward.
#   "recompute" — backward re-derives scores/exp/normalize from qkv (no
#                 extra HBM; 5 matmuls + the VPU normalize per head).
#   "probs"     — forward (under differentiation only) additionally writes
#                 the normalized f32 attention probs (N, T, H*T) to HBM;
#                 backward loads them and skips the score matmul and the
#                 exp/normalize entirely (4 matmuls, no transcendentals,
#                 and no mask operand — the probs already carry it).
#                 Bit-identical gradients: the saved probs are exactly the
#                 values the recompute would re-derive.
# The A/B lives in tools/kbench_attention.py / docs/PERF.md round 3:
# probs 22.302 ms vs recompute 22.560 ms (fwd+bwd harness, bf16, N=7040),
# identical gradients — probs is the default.
_BWD_RESIDUALS = "probs"  # "recompute" | "probs"


def set_bwd_residuals(mode: str) -> None:
    """TRACE-TIME ONLY (like set_pallas_mode): the value is read when a
    step is traced and is NOT part of any jit cache key — calling this
    after a step has been jitted does nothing for that compiled step.
    Set it before building steps, or retrace (new jit / cfg change) after.
    kbench/bench_step retrace per variant for exactly this reason."""
    global _BWD_RESIDUALS
    if mode not in ("recompute", "probs"):
        raise ValueError(f"unknown bwd_residuals mode {mode!r}")
    _BWD_RESIDUALS = mode


def bwd_residuals() -> str:
    return _BWD_RESIDUALS


# Row-block target for the fused-QKV kernels (the backward targets half of
# this). 256 measured ~4% faster than 128 at the production shape
# (kbench: probs@256 21.405 ms vs probs@128 22.302; headloop@256 21.66 in
# round 2) at the cost of roughly doubled Mosaic lowering time — flip to
# 128 with set_qkv_block_rows when cold-compile latency matters more than
# steady-state step time.
_QKV_BLOCK_ROWS = 256


def qkv_block_rows() -> int:
    return _QKV_BLOCK_ROWS


def set_qkv_block_rows(n: int) -> None:
    """TRACE-TIME ONLY — see set_bwd_residuals; no effect on already-jitted
    steps."""
    global _QKV_BLOCK_ROWS
    if n < 8:
        raise ValueError(f"qkv block_rows must be >= 8, got {n}")
    _QKV_BLOCK_ROWS = n
