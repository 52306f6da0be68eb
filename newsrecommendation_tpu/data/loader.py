"""Host-side input pipeline: parse behaviors shards once into dense numpy
arrays, then build fixed-shape padded batches with vectorized ops.

Replaces the reference's per-line Python IterableDataset + DataLoader
(``dataset.py:6-89``, ``main.py:91-92``) — which re-parses text and runs a
Python mapper per sample per epoch — with a parse-once / index-per-epoch
design fast enough to feed a TPU:

  - id -> index mapping with 0 for unknown news (dataset.py:14-15),
  - FRONT-padded, most-recent-L click history with a 0/1 float mask
    (dataset.py:17-24),
  - per-epoch uniformly-random positive slot among the npratio negatives,
    with the slot index as the label (dataset.py:45-47),
  - feature-row gathering from the combined news matrix (dataset.py:40-47)
    done as one numpy fancy-index per batch.

Batches are fixed-shape: the final partial batch is padded and carries a 0/1
``weight`` vector so the jitted train step sees static shapes while the loss
math matches the reference's ragged final batch exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional

import numpy as np


class CandidateTruncationError(ValueError):
    """Raised when an eval impression has more candidates than the padded
    width — silent truncation would silently corrupt ranking metrics."""


def _guard_truncation(path: str, truncated: int, max_width: int,
                      width: int, allow: bool) -> None:
    if truncated <= 0:
        return
    msg = (f"{path}: {truncated} impression(s) exceed the eval candidate "
           f"width {width} (widest observed: {max_width}); their excess "
           f"candidates would be silently dropped from AUC/MRR/nDCG. "
           f"Raise max_candidates (--max_candidates) to >= {max_width}.")
    if allow:
        import logging
        logging.warning("%s (allow_truncation=True: continuing)", msg)
        return
    raise CandidateTruncationError(msg)


def trans_to_nindex(nids: List[str], news_index: Dict[str, int]) -> List[int]:
    """doc ids -> 1-based indices, 0 for unknown (reference dataset.py:14-15)."""
    return [news_index.get(i, 0) for i in nids]


def pad_to_fix_len(x: List[int], fix_length: int, padding_front: bool = True,
                   padding_value: int = 0):
    """Reference dataset.py:17-24: keep the LAST fix_length entries; front-pad
    by default. Returns (padded list, float32 mask)."""
    if padding_front:
        pad_x = [padding_value] * (fix_length - len(x)) + x[-fix_length:]
        mask = [0] * (fix_length - len(x)) + [1] * min(fix_length, len(x))
    else:
        pad_x = x[-fix_length:] + [padding_value] * (fix_length - len(x))
        mask = [1] * min(fix_length, len(x)) + [0] * (fix_length - len(x))
    return pad_x, np.asarray(mask, dtype=np.float32)


@dataclasses.dataclass
class TrainSamples:
    """Dense representation of one training shard (behaviors_np{K}_{r}.tsv)."""

    history: np.ndarray       # (N, L) int32 news indices, front-padded with 0
    history_mask: np.ndarray  # (N, L) float32
    pos: np.ndarray           # (N,) int32 positive news index
    neg: np.ndarray           # (N, K) int32 negative news indices

    @property
    def num_samples(self) -> int:
        return self.history.shape[0]

    @property
    def npratio(self) -> int:
        return self.neg.shape[1]

    @classmethod
    def from_file(cls, path: str, news_index: Dict[str, int], cfg,
                  use_native: bool = True) -> "TrainSamples":
        if use_native:
            from newsrecommendation_tpu.data import native_loader
            parsed = native_loader.parse_train_file(
                path, news_index, cfg.user_log_length, cfg.npratio)
            if parsed is not None:
                h, m, p, n = parsed
                return cls(history=h, history_mask=m, pos=p, neg=n)
        hist, mask, pos, neg = [], [], [], []
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                # iid, uid, time, history, pos, negs (prepare.py output)
                h, m = pad_to_fix_len(
                    trans_to_nindex(parts[3].split(), news_index),
                    cfg.user_log_length,
                )
                hist.append(h)
                mask.append(m)
                pos.append(trans_to_nindex(parts[4].split(), news_index)[0])
                neg.append(trans_to_nindex(parts[5].split(), news_index))
        return cls(
            history=np.asarray(hist, dtype=np.int32),
            history_mask=np.asarray(mask, dtype=np.float32),
            pos=np.asarray(pos, dtype=np.int32),
            neg=np.asarray(neg, dtype=np.int32),
        )

    def epoch_arrays(self, epoch: int, seed: int, shuffle: bool = False):
        """Per-epoch candidate assembly, fully vectorized.

        Returns (history, history_mask, candidate (N,1+K), label (N,)) with a
        fresh uniformly-random positive slot per sample (dataset.py:45-47).
        The reference iterates the file in fixed order each epoch (the global
        shuffle happened once at prepare time); shuffle=True additionally
        reshuffles sample order per epoch.
        """
        n, k = self.num_samples, self.npratio
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        label = rng.integers(0, k + 1, size=n).astype(np.int32)
        # candidate[:, j] = neg[:, j] for j < label; pos at j == label;
        # neg[:, j-1] for j > label  — i.e. insert pos at the label slot.
        j = np.arange(k + 1)[None, :]                      # (1, 1+K)
        lab = label[:, None]                               # (N, 1)
        neg_shifted = np.take_along_axis(
            self.neg, np.clip(j - (j > lab), 0, k - 1), axis=1
        )
        candidate = np.where(j == lab, self.pos[:, None], neg_shifted)
        candidate = candidate.astype(np.int32)

        if shuffle:
            perm = rng.permutation(n)
            return (self.history[perm], self.history_mask[perm],
                    candidate[perm], label[perm])
        return self.history, self.history_mask, candidate, label

    def iter_batches(self, news_features: np.ndarray, batch_size: int,
                     epoch: int, seed: int, shuffle: bool = False,
                     pad_final: bool = True) -> Iterator[dict]:
        """Yield fixed-shape batches of gathered feature rows.

        Batch dict: history (B,L,F) int32, history_mask (B,L) f32,
        candidate (B,1+K,F) int32, label (B,) int32, weight (B,) f32.
        """
        hist, mask, cand, label = self.epoch_arrays(epoch, seed, shuffle)
        n = hist.shape[0]
        for start in range(0, n, batch_size):
            end = min(start + batch_size, n)
            b = end - start
            h = news_features[hist[start:end]]          # (b, L, F)
            c = news_features[cand[start:end]]          # (b, 1+K, F)
            m = mask[start:end]
            lb = label[start:end]
            w = np.ones(b, dtype=np.float32)
            if b < batch_size:
                if not pad_final:
                    continue
                pad = batch_size - b
                h = np.concatenate([h, np.zeros((pad,) + h.shape[1:], h.dtype)])
                c = np.concatenate([c, np.zeros((pad,) + c.shape[1:], c.dtype)])
                m = np.concatenate([m, np.zeros((pad,) + m.shape[1:], m.dtype)])
                lb = np.concatenate([lb, np.zeros(pad, lb.dtype)])
                w = np.concatenate([w, np.zeros(pad, w.dtype)])
            yield {
                "history": h, "history_mask": m, "candidate": c,
                "label": lb, "weight": w,
            }

    def iter_index_batches(self, batch_size: int, epoch: int, seed: int,
                           shuffle: bool = False,
                           pad_final: bool = True) -> Iterator[dict]:
        """Like iter_batches but WITHOUT the host feature gather: yields the
        (B, L) / (B, 1+K) int32 news indices for a device-side gather
        (train/step.py:with_device_gather). ~20x less host->device traffic
        per step than shipping the gathered (B, L, F) feature rows.
        """
        hist, mask, cand, label = self.epoch_arrays(epoch, seed, shuffle)
        n = hist.shape[0]
        for start in range(0, n, batch_size):
            end = min(start + batch_size, n)
            b = end - start
            h = hist[start:end]
            c = cand[start:end]
            m = mask[start:end]
            lb = label[start:end]
            w = np.ones(b, dtype=np.float32)
            if b < batch_size:
                if not pad_final:
                    continue
                pad = batch_size - b
                h = np.concatenate([h, np.zeros((pad,) + h.shape[1:],
                                                h.dtype)])
                c = np.concatenate([c, np.zeros((pad,) + c.shape[1:],
                                                c.dtype)])
                m = np.concatenate([m, np.zeros((pad,) + m.shape[1:],
                                                m.dtype)])
                lb = np.concatenate([lb, np.zeros(pad, lb.dtype)])
                w = np.concatenate([w, np.zeros(pad, w.dtype)])
            yield {
                "history_idx": h, "history_mask": m, "candidate_idx": c,
                "label": lb, "weight": w,
            }


@dataclasses.dataclass
class EvalSamples:
    """Dense representation of one eval shard (raw behaviors_{r}.tsv lines).

    Candidates are padded to a fixed width C with a 0/1 mask; labels parsed
    from the Nxxx-0/1 impression field (reference dataset.py:70-72).
    """

    history: np.ndarray        # (N, L) int32
    history_mask: np.ndarray   # (N, L) float32
    candidates: np.ndarray     # (N, C) int32 news indices (0-padded)
    labels: np.ndarray         # (N, C) float32 0/1 (0 on padding)
    candidate_mask: np.ndarray  # (N, C) float32

    @property
    def num_samples(self) -> int:
        return self.history.shape[0]

    @classmethod
    def from_file(cls, path: str, news_index: Dict[str, int], cfg,
                  max_candidates: Optional[int] = None,
                  use_native: bool = True,
                  allow_truncation: bool = False) -> "EvalSamples":
        """Parse one eval shard; candidates padded to ``max_candidates``.

        Impressions wider than ``max_candidates`` would be silently
        truncated — which silently corrupts AUC/MRR/nDCG (dropped
        candidates simply vanish from the ranking). The reference parses
        unbounded (dataset.py:70-72), so truncation is OUR artifact:
        by default it raises with the count and the observed max width
        (fix: raise cfg.max_candidates); ``allow_truncation=True`` demotes
        the error to a logged warning for callers that accept the loss.
        """
        if use_native and max_candidates is not None:
            from newsrecommendation_tpu.data import native_loader
            parsed = native_loader.parse_eval_file(
                path, news_index, cfg.user_log_length, max_candidates)
            if parsed is not None:
                h, m, c, l, cm, truncated, max_width = parsed
                _guard_truncation(path, truncated, max_width,
                                  max_candidates, allow_truncation)
                return cls(history=h, history_mask=m, candidates=c,
                           labels=l, candidate_mask=cm)
        hist, mask, cand_lists, label_lists = [], [], [], []
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                h, m = pad_to_fix_len(
                    trans_to_nindex(parts[3].split(), news_index),
                    cfg.user_log_length,
                )
                hist.append(h)
                mask.append(m)
                items = parts[4].split()
                cand_lists.append(
                    trans_to_nindex([i.split("-")[0] for i in items], news_index)
                )
                label_lists.append([int(i.split("-")[1]) for i in items])

        width = max_candidates or max(len(c) for c in cand_lists)
        n = len(hist)
        widths = np.asarray([len(c) for c in cand_lists])
        _guard_truncation(path, int(np.sum(widths > width)),
                          int(widths.max(initial=0)), width, allow_truncation)
        candidates = np.zeros((n, width), dtype=np.int32)
        labels = np.zeros((n, width), dtype=np.float32)
        cmask = np.zeros((n, width), dtype=np.float32)
        for i, (cl, ll) in enumerate(zip(cand_lists, label_lists)):
            w = min(len(cl), width)
            candidates[i, :w] = cl[:w]
            labels[i, :w] = ll[:w]
            cmask[i, :w] = 1.0
        return cls(
            history=np.asarray(hist, dtype=np.int32),
            history_mask=np.asarray(mask, dtype=np.float32),
            candidates=candidates, labels=labels, candidate_mask=cmask,
        )

    def iter_batches(self, batch_size: int) -> Iterator[dict]:
        """Fixed-shape eval batches with a per-sample validity weight."""
        n = self.num_samples
        for start in range(0, n, batch_size):
            end = min(start + batch_size, n)
            b = end - start

            def pad(x):
                if b == batch_size:
                    return x[start:end]
                return np.concatenate(
                    [x[start:end],
                     np.zeros((batch_size - b,) + x.shape[1:], x.dtype)]
                )

            yield {
                "history": pad(self.history),
                "history_mask": pad(self.history_mask),
                "candidates": pad(self.candidates),
                "labels": pad(self.labels),
                "candidate_mask": pad(self.candidate_mask),
                "num_real": b,
            }
