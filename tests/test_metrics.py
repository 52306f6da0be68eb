"""Metrics: numpy oracles vs sklearn, batched JAX versions vs the oracles."""

import numpy as np
import pytest
import sklearn.metrics

from newsrecommendation_tpu import metrics as M


def random_impression(rng, n, ensure_both=True):
    labels = rng.integers(0, 2, size=n).astype(np.float64)
    if ensure_both:
        labels[0], labels[1] = 1, 0
    scores = rng.normal(size=n)
    return labels, scores


class TestNumpyOracles:
    def test_auc_matches_sklearn(self, rng):
        for n in (5, 17, 50):
            for _ in range(20):
                y, s = random_impression(rng, n)
                assert M.roc_auc_score(y, s) == pytest.approx(
                    sklearn.metrics.roc_auc_score(y, s), abs=1e-12
                )

    def test_auc_matches_sklearn_with_ties(self, rng):
        for _ in range(20):
            y, _ = random_impression(rng, 20)
            s = rng.integers(0, 4, size=20).astype(np.float64)  # many ties
            assert M.roc_auc_score(y, s) == pytest.approx(
                sklearn.metrics.roc_auc_score(y, s), abs=1e-12
            )

    def test_mrr_single_positive(self):
        y = np.array([0, 1, 0, 0])
        s = np.array([0.9, 0.8, 0.1, 0.2])  # positive ranked 2nd
        assert M.mrr_score(y, s) == pytest.approx(0.5)

    def test_ndcg_perfect_ranking_is_one(self, rng):
        y, _ = random_impression(rng, 12)
        assert M.ndcg_score(y, y, k=10) == pytest.approx(1.0)

    def test_dcg_known_value(self):
        y = np.array([1, 0, 1])
        s = np.array([3.0, 2.0, 1.0])
        # ranked labels [1,0,1]: 1/log2(2) + 0 + 1/log2(4)
        assert M.dcg_score(y, s, k=10) == pytest.approx(1.0 + 0.5)

    def test_ctr(self):
        y = np.array([1, 0, 1, 0])
        s = np.array([0.1, 0.9, 0.8, 0.2])
        assert M.ctr_score(y, s, k=2) == pytest.approx(0.5)


class TestBatchedJax:
    def _batch(self, rng, b=16, cmax=30):
        """Ragged impressions padded to width cmax."""
        scores = np.zeros((b, cmax), dtype=np.float32)
        labels = np.zeros((b, cmax), dtype=np.float32)
        mask = np.zeros((b, cmax), dtype=np.float32)
        rows = []
        for i in range(b):
            n = int(rng.integers(4, cmax + 1))
            y, s = random_impression(rng, n)
            scores[i, :n] = s
            labels[i, :n] = y
            mask[i, :n] = 1.0
            rows.append((y, s))
        return scores, labels, mask, rows

    def test_batched_auc_vs_oracle(self, rng):
        scores, labels, mask, rows = self._batch(rng)
        got = np.asarray(M.batched_auc(scores, labels, mask))
        want = [M.roc_auc_score(y, s) for y, s in rows]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_batched_auc_vs_pairwise_exact(self, rng):
        """Sort-based AUC == pairwise AUC bit-for-bit intent: across random
        masks, heavy ties, and degenerate rows (both return 0 there)."""
        for cmax, tie_levels in [(30, None), (64, 3), (384, 5)]:
            b = 16
            scores = rng.normal(size=(b, cmax)).astype(np.float32)
            if tie_levels:  # quantized scores -> many exact ties
                scores = np.round(scores * tie_levels) / tie_levels
            labels = rng.integers(0, 2, size=(b, cmax)).astype(np.float32)
            mask = (rng.random((b, cmax)) < 0.7).astype(np.float32)
            mask[:, 0] = 1.0
            got = np.asarray(M.batched_auc(scores, labels, mask))
            want = np.asarray(M.batched_auc_pairwise(scores, labels, mask))
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_batched_auc_ties_vs_oracle(self, rng):
        """Tie-averaged ranks: integer scores against the sklearn-pinned
        numpy oracle."""
        b, cmax = 12, 24
        scores = np.zeros((b, cmax), dtype=np.float32)
        labels = np.zeros((b, cmax), dtype=np.float32)
        mask = np.zeros((b, cmax), dtype=np.float32)
        rows = []
        for i in range(b):
            n = int(rng.integers(4, cmax + 1))
            y, _ = random_impression(rng, n)
            s = rng.integers(0, 3, size=n).astype(np.float64)
            scores[i, :n] = s
            labels[i, :n] = y
            mask[i, :n] = 1.0
            rows.append((y, s))
        got = np.asarray(M.batched_auc(scores, labels, mask))
        want = [M.roc_auc_score(y, s) for y, s in rows]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_batched_rankdata_average(self, rng):
        x = rng.integers(0, 5, size=(6, 40)).astype(np.float32)
        got = np.asarray(M.batched_rankdata_average(x))
        want = np.stack([M._rankdata_average(row.astype(np.float64))
                         for row in x])
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_batched_mrr_vs_oracle(self, rng):
        scores, labels, mask, rows = self._batch(rng)
        got = np.asarray(M.batched_mrr(scores, labels, mask))
        want = [M.mrr_score(y, s) for y, s in rows]
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("k", [5, 10])
    def test_batched_ndcg_vs_oracle(self, rng, k):
        scores, labels, mask, rows = self._batch(rng)
        got = np.asarray(M.batched_ndcg(scores, labels, mask, k=k))
        want = [M.ndcg_score(y, s, k=k) for y, s in rows]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_batched_ctr_vs_oracle(self, rng):
        scores, labels, mask, rows = self._batch(rng)
        got = np.asarray(M.batched_ctr(scores, labels, mask, k=1))
        want = [M.ctr_score(y, s, k=1) for y, s in rows]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_valid_impression_mask(self):
        labels = np.array([[1, 0, 0], [1, 1, 0], [0, 0, 0], [1, 1, 1]],
                          dtype=np.float32)
        mask = np.array([[1, 1, 0], [1, 1, 0], [1, 1, 1], [1, 1, 1]],
                        dtype=np.float32)
        # row 1: all real labels are 1 (the masked 0 doesn't count) -> invalid
        got = np.asarray(M.valid_impression_mask(labels, mask))
        np.testing.assert_array_equal(got, [1.0, 0.0, 0.0, 0.0])

    def test_impression_metrics_sums(self, rng):
        scores, labels, mask, rows = self._batch(rng, b=8)
        sums = M.impression_metrics(scores, labels, mask)
        assert float(sums["count"]) == 8.0
        want_auc = sum(M.roc_auc_score(y, s) for y, s in rows)
        assert float(sums["auc"]) == pytest.approx(want_auc, abs=1e-4)

    def test_train_accuracy(self):
        logits = np.array([[1.0, 2.0, 0.0], [3.0, 1.0, 0.0]])
        labels = np.array([1, 2])
        assert float(M.train_accuracy(labels, logits)) == pytest.approx(0.5)
