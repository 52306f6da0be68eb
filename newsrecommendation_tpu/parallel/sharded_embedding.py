"""Row-sharded embedding tables with collective lookup.

The reference replicates its frozen (num_news+1, T*word_dim) title table on
every GPU (NAML.py:105-107) — ~3 GB at MIND-large scale, the real memory
wall (SURVEY.md §2.3). Here the table's rows are sharded over the mesh's
'table' axis and lookups run inside ``shard_map``:

  - batches are sharded over 'data' and REPLICATED over 'table', so every
    table shard sees the ids of its data-axis column;
  - each shard gathers the requested rows it owns (masked dense gather —
    a clean XLA gather, no host ragged logic);
  - one ``psum`` over 'table' assembles full rows on every participant.

The psum rides ICI and is the TPU-native analogue of the parameter-server /
all-to-all lookup; its transpose (for trainable tables) automatically
scatter-adds gradient rows back to the owning shard.

Row 0 of the global table is the all-zero unknown-news row; masking by
(id != 0) happens in the model's lookup wrapper, not here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from newsrecommendation_tpu.parallel.mesh import TABLE_AXIS


def padded_rows(num_rows: int, num_shards: int) -> int:
    """Global row count padded so every shard holds the same number of rows."""
    return ((num_rows + num_shards - 1) // num_shards) * num_shards


def shard_table(table: np.ndarray, num_shards: int) -> np.ndarray:
    """Zero-pad a (N, D) table to a shard-divisible row count.

    Place the result with ``mesh.table_sharding`` so shard i holds rows
    [i*rows_per_shard, (i+1)*rows_per_shard).
    """
    n, d = table.shape
    total = padded_rows(n, num_shards)
    if total == n:
        return table
    out = np.zeros((total, d), dtype=table.dtype)
    out[:n] = table
    return out


def gather_rows_sharded(local_table: jnp.ndarray, ids: jnp.ndarray,
                        axis_name: str = TABLE_AXIS) -> jnp.ndarray:
    """Inside shard_map: gather global rows from a row-sharded table.

    local_table: (rows_per_shard, D) — this shard's rows.
    ids: any int shape — GLOBAL row indices, replicated across `axis_name`.
    Returns (*ids.shape, D) full rows on every shard.
    """
    rows_per_shard = local_table.shape[0]
    shard = jax.lax.axis_index(axis_name)
    local_idx = ids - shard * rows_per_shard
    valid = (local_idx >= 0) & (local_idx < rows_per_shard)
    clipped = jnp.clip(local_idx, 0, rows_per_shard - 1)
    rows = jnp.take(local_table, clipped, axis=0)
    rows = rows * valid[..., None].astype(rows.dtype)
    return jax.lax.psum(rows, axis_name)
