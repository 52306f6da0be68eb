"""Offline behaviors.tsv preparation: negative sampling + shard splitting.

Behavioral parity with reference ``prepare_data.py``:
  - training: per impression, split clicked/non-clicked; drop impressions
    lacking either; emit one line per positive with npratio sampled negatives
    (sampling WITH replication when negatives are scarce); global shuffle;
    round-robin split into behaviors_np{K}_{shard}.tsv (prepare_data.py:14-49).
  - testing: raw behaviors.tsv round-robin split into behaviors_{shard}.tsv
    (prepare_data.py:52-66).

Shards here feed data-parallel hosts/devices on the TPU mesh instead of GPU
ranks, but the on-disk format is identical so artifacts interoperate.

Multi-controller safety: the reference prepares once in the parent before
spawning workers (main.py:293); here every process may call prepare (cli
runs it when its shard file is missing). The outputs are deterministic
(seeded RNG), so concurrent preparers produce byte-identical files — each
shard is therefore written to a process-unique temp name and atomically
os.replace'd, so a concurrent reader only ever sees a complete file.
"""

from __future__ import annotations

import logging
import os
import random
from typing import List


def sample_negatives(negatives: List[str], k: int, rng: random.Random) -> List[str]:
    """k negatives without replacement, replicating the pool if too small
    (reference get_sample, prepare_data.py:7-11)."""
    if k > len(negatives):
        pool = negatives * (k // len(negatives) + 1)
        return rng.sample(pool, k)
    return rng.sample(negatives, k)


def prepare_training_data(train_data_dir: str, num_shards: int, npratio: int,
                          seed: int) -> int:
    rng = random.Random(seed)
    out_lines: List[str] = []

    path = os.path.join(train_data_dir, "behaviors.tsv")
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            iid, uid, time, history, imp = line.rstrip("\n").split("\t")
            pos, neg = [], []
            for item in imp.split(" "):
                news_id, _, label = item.partition("-")
                if label == "1":
                    pos.append(news_id)
                elif label == "0":
                    neg.append(news_id)
            if not pos or not neg:
                continue
            for pos_id in pos:
                negs = " ".join(sample_negatives(neg, npratio, rng))
                out_lines.append(
                    "\t".join([iid, uid, time, history, pos_id, negs]) + "\n"
                )

    rng.shuffle(out_lines)

    for shard in range(num_shards):
        shard_path = os.path.join(
            train_data_dir, f"behaviors_np{npratio}_{shard}.tsv"
        )
        _atomic_write_lines(shard_path, out_lines[shard::num_shards])
    logging.info("prepared %d training samples into %d shards",
                 len(out_lines), num_shards)
    return len(out_lines)


def _atomic_write_lines(path: str, lines: List[str]) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.writelines(lines)
    os.replace(tmp, path)


def prepare_testing_data(test_data_dir: str, num_shards: int) -> int:
    path = os.path.join(test_data_dir, "behaviors.tsv")
    with open(path, "r", encoding="utf-8") as f:
        lines = f.readlines()
    for shard in range(num_shards):
        shard_path = os.path.join(test_data_dir, f"behaviors_{shard}.tsv")
        _atomic_write_lines(shard_path, lines[shard::num_shards])
    logging.info("prepared %d testing samples into %d shards",
                 len(lines), num_shards)
    return len(lines)
