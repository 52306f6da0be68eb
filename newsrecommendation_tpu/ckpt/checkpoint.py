"""Checkpoint/resume of the train-state pytree with vocab sidecars.

Parity with the reference's torch.save of {model_state_dict, category_dict,
subcategory_dict} at epoch-{E}[.{step}].pt (main.py:118-142), implementing
the INTENT its filter missed (SURVEY.md §5 defect 3): the frozen title
embedding table is genuinely excluded (it is rebuildable from the data dir
and may have a different shape at test time), and excluded consistently in
both the single- and multi-device paths.

Format: one msgpack file (flax.serialization) holding step/params/opt_state
with the frozen table leaf replaced by a sentinel, plus a JSON sidecar with
the vocab dicts and config snapshot. Writes are atomic (tmp + rename) so a
killed run never leaves a torn checkpoint — the failure-recovery model is
restart-from-checkpoint (reference: manual --load_ckpt_name + --start_epoch,
parameters.py:55-56).

Multi-controller (reference semantics: rank-0-only save, main.py:118-127):
every process calls save_checkpoint at the same points, but only process 0
writes the main file — EXCEPT for leaves that are NOT fully addressable
(a trainable embedding table row-sharded across processes, and its Adam
moments): no single process can fetch those, so each process atomically
writes its OWN addressable slices to ``{name}.shards{p}.npz`` with no
cross-process collectives (no lockstep requirement, no deadlock risk).
load_checkpoint reassembles the global array from all shard files (shared
checkpoint storage assumed, as with any multi-host checkpoint) and places
it back with the template leaf's sharding.
"""

from __future__ import annotations

import glob as _glob
import json
import logging
import os
import re
import tempfile
from typing import List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_EXCLUDED = "__excluded_frozen_table__"


def _strip_frozen(tree, cfg):
    """Replace the frozen embedding table with a sentinel scalar.

    Must run BEFORE any device fetch: a frozen table row-sharded across
    processes is not fetchable from one process, and never needs to be.
    """
    if not cfg.freeze_embedding:
        return tree
    out = dict(tree)
    if "embedding_table" in out:
        out["embedding_table"] = np.zeros((), dtype=np.float32)
    return out


def _walk_leaves(tree, path=()):
    """Yield (path_tuple, leaf) over a nested-dict pytree."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk_leaves(v, path + (str(k),))
    else:
        yield path, tree


def _set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def _is_non_addressable(leaf) -> bool:
    """True when no single process can fetch this leaf whole.

    Fully-replicated arrays are fetchable from any process even when their
    sharding spans other processes' devices, so they go in the main file.
    """
    return (isinstance(leaf, jax.Array)
            and not getattr(leaf, "is_fully_addressable", True)
            and not getattr(leaf, "is_fully_replicated", False))


def _extract_sharded(payload):
    """Replace non-fully-addressable leaves with placeholders.

    Returns (payload, {path_str: original_leaf}). The remaining payload is
    safe to jax.device_get on any single process.
    """
    sharded = {}
    for path, leaf in list(_walk_leaves(payload)):
        if _is_non_addressable(leaf):
            sharded["/".join(path)] = leaf
            _set_path(payload, path, np.zeros((), dtype=np.float32))
    return payload, sharded


def _shard_key(path_str: str, index, shape) -> str:
    spans = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        spans.append(f"{start}:{stop}")
    return f"{path_str}|{';'.join(spans)}"


def _write_local_shards(path: str, sharded: dict) -> None:
    """Atomically write this process's addressable slices of each leaf."""
    entries = {}
    for path_str, leaf in sharded.items():
        entries[f"__meta__|{path_str}"] = np.asarray(
            [*leaf.shape], dtype=np.int64)
        entries[f"__dtype__|{path_str}"] = np.frombuffer(
            np.dtype(leaf.dtype).str.encode(), dtype=np.uint8)
        for shard in leaf.addressable_shards:
            key = _shard_key(path_str, shard.index, leaf.shape)
            if key not in entries:  # replicas across 'data' carry same rows
                entries[key] = np.asarray(shard.data)
    out = f"{path}.shards{jax.process_index()}.npz"
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(out), suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, **entries)
    os.replace(tmp, out)


def _read_sharded_leaf(path: str, path_str: str) -> np.ndarray:
    """Reassemble one global array from every process's shard file."""
    files = sorted(_glob.glob(f"{path}.shards*.npz"))
    if not files:
        raise FileNotFoundError(
            f"{path}: checkpoint has sharded leaf {path_str} but no "
            f".shards*.npz files are present")
    full = None
    covered = 0
    for fn in files:
        with np.load(fn) as z:
            if full is None:
                shape = tuple(int(x) for x in z[f"__meta__|{path_str}"])
                dtype = np.dtype(
                    bytes(z[f"__dtype__|{path_str}"]).decode())
                full = np.zeros(shape, dtype=dtype)
            prefix = f"{path_str}|"
            for key in z.files:
                if not key.startswith(prefix) or key.startswith("__"):
                    continue
                idx = tuple(
                    slice(int(a), int(b))
                    for a, b in (span.split(":")
                                 for span in key[len(prefix):].split(";")))
                full[idx] = z[key]
                covered += z[key].size
    if covered < full.size:
        raise ValueError(
            f"{path}: shard files cover {covered}/{full.size} elements of "
            f"{path_str} — incomplete checkpoint (missing a process's file?)")
    return full


def save_checkpoint(model_dir: str, name: str, state, cfg,
                    category_dict=None, subcategory_dict=None,
                    word_dict=None) -> str:
    """Write {model_dir}/{name}.ckpt (+ .json sidecar). Returns the path.

    Safe to call from every process: process 0 writes the main file
    (reference rank-0 semantics, main.py:118-127); all processes write
    shard files for any cross-process-sharded leaf. No collectives.
    """
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, name)

    payload = {
        "step": state.step,
        "params": _strip_frozen(dict(state.params), cfg),
        "opt_state": serialization.to_state_dict(state.opt_state),
        "frozen_table_excluded": np.asarray(cfg.freeze_embedding),
    }
    payload, sharded = _extract_sharded(payload)
    if sharded:
        _write_local_shards(path, sharded)
    if jax.process_index() != 0:
        return path

    payload = jax.device_get(payload)
    blob = serialization.to_bytes(payload)
    fd, tmp = tempfile.mkstemp(dir=model_dir, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)

    sidecar = {
        "category_dict": category_dict or {},
        "subcategory_dict": subcategory_dict or {},
        "word_dict": word_dict or {},
        "sharded_leaves": sorted(sharded),
        "config": {k: v for k, v in vars(cfg).items()
                   if isinstance(v, (int, float, str, bool, type(None)))},
    }
    fd, tmp = tempfile.mkstemp(dir=model_dir, suffix=".tmp")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump(sidecar, f)
    os.replace(tmp, path + ".json")
    logging.info("checkpoint saved to %s", path)
    return path


def load_checkpoint(path: str, state_template, cfg) -> Tuple[object, dict]:
    """Restore a TrainState from disk into the template's structure.

    The template provides the frozen table (freshly built from the target
    data dir) when the checkpoint excluded it — mirroring how the reference
    test path rebuilds the table from the test dir (main.py:168-171).
    Cross-process-sharded leaves are reassembled from the per-process shard
    files and re-placed with the template leaf's sharding.
    Returns (state, sidecar dict with vocab dicts).
    """
    sidecar = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json", "r", encoding="utf-8") as f:
            sidecar = json.load(f)
    sharded_leaves: List[str] = list(sidecar.get("sharded_leaves", []))

    with open(path, "rb") as f:
        blob = f.read()
    template = {
        "step": jax.device_get(state_template.step),
        "params": _strip_frozen(dict(state_template.params), cfg),
        "opt_state": serialization.to_state_dict(
            state_template.opt_state),
        "frozen_table_excluded": np.asarray(False),
    }
    # template leaves matching the checkpoint's sharded set (and any leaf
    # not fetchable here) become placeholders for the msgpack round-trip
    template_leaves = {}
    for p, leaf in list(_walk_leaves(template)):
        p_str = "/".join(p)
        template_leaves[p_str] = leaf
        if p_str in sharded_leaves or _is_non_addressable(leaf):
            _set_path(template, p, np.zeros((), dtype=np.float32))
        else:
            _set_path(template, p, jax.device_get(leaf))
    restored = serialization.from_bytes(template, blob)

    for p_str in sharded_leaves:
        full = _read_sharded_leaf(path, p_str)
        tmpl_leaf = template_leaves.get(p_str)
        if isinstance(tmpl_leaf, jax.Array) and hasattr(tmpl_leaf, "sharding"):
            full = jax.device_put(full, tmpl_leaf.sharding)
        _set_path(restored, tuple(p_str.split("/")), full)

    params = dict(restored["params"])
    if cfg.freeze_embedding:
        params["embedding_table"] = state_template.params["embedding_table"]
    opt_state = serialization.from_state_dict(
        state_template.opt_state, restored["opt_state"]
    )
    state = type(state_template)(
        step=jax.numpy.asarray(restored["step"]),
        params=params,
        opt_state=opt_state,
    )
    logging.info("checkpoint loaded from %s", path)
    return state, sidecar


def latest_checkpoint(model_dir: str) -> Optional[str]:
    """Newest epoch-{E}[-{step}].ckpt by (epoch, step)."""
    if not os.path.isdir(model_dir):
        return None
    best, best_key = None, (-1, -1)
    for fn in os.listdir(model_dir):
        m = re.fullmatch(r"epoch-(\d+)(?:-(\d+))?\.ckpt", fn)
        if m:
            key = (int(m.group(1)), int(m.group(2) or 0))
            if key > best_key:
                best, best_key = fn, key
    return os.path.join(model_dir, best) if best else None
