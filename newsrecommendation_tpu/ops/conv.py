"""1-D convolution over token sequences (NAML's title CNN, NAML.py:27-32).

The reference uses nn.Conv1d(word_dim -> news_dim, k=3, padding=1) on
(B, C, T) with transposes around it. Here the data stays in (B, T, C) — the
TPU-natural layout where the channel dim maps onto MXU lanes — with two
interchangeable lowerings:

  "xla":  one lax.conv_general_dilated with NWC/WIO dimension numbers.
          XLA's TPU conv emitter picks a batch-minormost operand layout,
          which costs three layout copies around the conv in the NAML
          step (~1.1 ms of the 7.3 ms step — round-5 profile).
  "taps": one (B*T, Cin) x (Cin, k*Cout) matmul (each kernel tap is a
          plain matmul of the UNSHIFTED input) followed by shift-adds of
          the k tap outputs. Same FLOPs, identical math, row-major
          throughout — but MEASURED-REJECTED on the chip (round 5:
          14.58 vs 6.79 ms/step for the NAML train step): the k*Cout
          tap intermediate triples the conv's HBM write traffic, which
          costs far more than the three layout copies it removes.

`set_conv_impl` / NEWSREC_CONV_IMPL selects the lowering (A/B'd on the
chip, docs/PERF.md round 5); both are exact to torch Conv1d. Default:
"xla".
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from newsrecommendation_tpu.utils import init as pinit

_CONV_IMPL = os.environ.get("NEWSREC_CONV_IMPL", "xla")


def set_conv_impl(impl: str) -> None:
    """'taps' (default) or 'xla'; read at trace time."""
    global _CONV_IMPL
    assert impl in ("taps", "xla"), impl
    _CONV_IMPL = impl


def init_conv1d(key, in_channels: int, out_channels: int, kernel_size: int = 3,
                dtype=jnp.float32):
    return pinit.torch_conv1d(key, in_channels, out_channels, kernel_size, dtype)


def _conv1d_same_xla(params, x):
    w = params["w"].astype(x.dtype)  # (k, Cin, Cout)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + params["b"].astype(x.dtype)


def _conv1d_same_taps(params, x):
    # out[t] = sum_j w[j] . x[t + j - pad]; tap j's matmul y[s, j] = x[s]w[j]
    # contributes to out[s - j + pad] — realized as k static shift-adds.
    w = params["w"].astype(x.dtype)  # (k, Cin, Cout)
    k, cin, cout = w.shape
    pad = k // 2
    b, t, _ = x.shape
    y = (x.reshape(b * t, cin) @ w.transpose(1, 0, 2).reshape(cin, k * cout))
    y = y.reshape(b, t, k, cout)
    out = jnp.zeros((b, t, cout), x.dtype)
    for j in range(k):
        s = j - pad  # out[t] += y[t + s, j]
        if s == 0:
            out = out + y[:, :, j]
        elif s > 0:
            out = out + jnp.pad(y[:, s:, j], ((0, 0), (0, s), (0, 0)))
        else:
            out = out + jnp.pad(y[:, :s, j], ((0, 0), (-s, 0), (0, 0)))
    return out + params["b"].astype(x.dtype)


def conv1d_same(params, x):
    """x: (B, T, Cin) -> (B, T, Cout), SAME padding (== torch padding=k//2)."""
    if _CONV_IMPL == "taps":
        return _conv1d_same_taps(params, x)
    return _conv1d_same_xla(params, x)
