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
"""

from __future__ import annotations

import json
import logging
import os
import re
import tempfile
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

_EXCLUDED = "__excluded_frozen_table__"


def _strip_frozen(tree, cfg):
    """Replace the frozen embedding table with a sentinel scalar."""
    if not cfg.freeze_embedding:
        return tree
    out = dict(tree)
    if "embedding_table" in out:
        out["embedding_table"] = np.zeros((), dtype=np.float32)
    return out


def save_checkpoint(model_dir: str, name: str, state, cfg,
                    category_dict=None, subcategory_dict=None,
                    word_dict=None) -> str:
    """Write {model_dir}/{name}.ckpt (+ .json sidecar). Returns the path."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, name)

    state_host = jax.device_get(state)
    payload = {
        "step": state_host.step,
        "params": _strip_frozen(state_host.params, cfg),
        "opt_state": serialization.to_state_dict(state_host.opt_state),
        "frozen_table_excluded": np.asarray(cfg.freeze_embedding),
    }
    blob = serialization.to_bytes(payload)
    fd, tmp = tempfile.mkstemp(dir=model_dir, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)

    sidecar = {
        "category_dict": category_dict or {},
        "subcategory_dict": subcategory_dict or {},
        "word_dict": word_dict or {},
        "config": {k: v for k, v in vars(cfg).items()
                   if isinstance(v, (int, float, str, bool, type(None)))},
    }
    with open(path + ".json", "w", encoding="utf-8") as f:
        json.dump(sidecar, f)
    logging.info("checkpoint saved to %s", path)
    return path


def load_checkpoint(path: str, state_template, cfg) -> Tuple[object, dict]:
    """Restore a TrainState from disk into the template's structure.

    The template provides the frozen table (freshly built from the target
    data dir) when the checkpoint excluded it — mirroring how the reference
    test path rebuilds the table from the test dir (main.py:168-171).
    Returns (state, sidecar dict with vocab dicts).
    """
    with open(path, "rb") as f:
        blob = f.read()
    template = {
        "step": jax.device_get(state_template.step),
        "params": _strip_frozen(jax.device_get(state_template.params), cfg),
        "opt_state": serialization.to_state_dict(
            jax.device_get(state_template.opt_state)
        ),
        "frozen_table_excluded": np.asarray(False),
    }
    restored = serialization.from_bytes(template, blob)

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

    sidecar = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json", "r", encoding="utf-8") as f:
            sidecar = json.load(f)
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
