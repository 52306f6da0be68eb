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


# The fused encoder-tail kernel (MHSA+dropout+pool in one kernel) is gated
# separately from the attention kernels: its Mosaic compile at high head
# counts is expensive (the per-head unroll appears in fwd AND bwd plus the
# pooling backward), so callers can fall back to attention-kernel + XLA
# pooling without losing the rest of the Pallas path.
_FUSED_TAIL = True


def set_fused_tail(enabled: bool) -> None:
    global _FUSED_TAIL
    _FUSED_TAIL = bool(enabled)


def fused_tail_enabled() -> bool:
    return _FUSED_TAIL and pallas_enabled()
