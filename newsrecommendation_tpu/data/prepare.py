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
        with open(shard_path, "w", encoding="utf-8") as f:
            f.writelines(out_lines[shard::num_shards])
    logging.info("prepared %d training samples into %d shards",
                 len(out_lines), num_shards)
    return len(out_lines)


def prepare_testing_data(test_data_dir: str, num_shards: int) -> int:
    path = os.path.join(test_data_dir, "behaviors.tsv")
    with open(path, "r", encoding="utf-8") as f:
        lines = f.readlines()
    for shard in range(num_shards):
        shard_path = os.path.join(test_data_dir, f"behaviors_{shard}.tsv")
        with open(shard_path, "w", encoding="utf-8") as f:
            f.writelines(lines[shard::num_shards])
    logging.info("prepared %d testing samples into %d shards",
                 len(lines), num_shards)
    return len(lines)
