"""1-D convolution over token sequences (NAML's title CNN, NAML.py:27-32).

The reference uses nn.Conv1d(word_dim -> news_dim, k=3, padding=1) on
(B, C, T) with transposes around it. Here the data stays in (B, T, C) — the
TPU-natural layout where the channel dim maps onto MXU lanes — and the
conv runs as one lax.conv_general_dilated with NWC/WIO dimension numbers,
which XLA lowers to MXU matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from newsrecommendation_tpu.utils import init as pinit


def init_conv1d(key, in_channels: int, out_channels: int, kernel_size: int = 3,
                dtype=jnp.float32):
    return pinit.torch_conv1d(key, in_channels, out_channels, kernel_size, dtype)


def conv1d_same(params, x):
    """x: (B, T, Cin) -> (B, T, Cout), SAME padding (== torch padding=k//2)."""
    w = params["w"].astype(x.dtype)  # (k, Cin, Cout)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + params["b"].astype(x.dtype)
