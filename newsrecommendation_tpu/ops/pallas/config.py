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
