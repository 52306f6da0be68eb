"""End-to-end training-dynamics parity vs the ACTUAL torch reference.

The per-step oracles (test_reference_train_oracle.py) prove gradient and
optimizer equivalence at a single step; these tests train the unmodified
reference program at /root/reference/src and this repo's stack on
byte-identical prepared shards from identical initial weights, and assert
the per-epoch loss trajectories and final eval metrics agree — "same model
after training", the last offline rung below a real-MIND reproduction of
README.md:68-80 (VERDICT r3 task 1).

Both sides share data bytes, the embedding table, and initial weights; the
residual differences are framework RNG streams (dropout, positive-slot
placement), so tolerances are statistical, not bitwise.

The assertion bands are DERIVED from measured seed spread at this exact
config (scale 1, 3 epochs, seeds 3/5/7 — round 5, 2026-08-21):
  NRMS word_ids (trainable): per-seed AUC diff 1.39/0.02/0.69 (pooled
    seed spread 0.95), max epoch-loss diff 0.0305 -> bands 2.5 AUC
    (~2.6x spread) / 0.06 loss (2x worst seed).
  NAML doc_table (frozen): per-seed AUC diff 0.12/0.16/0.05 (spread
    0.31), max epoch-loss diff 0.0009 -> bands 0.75 AUC / 0.005 loss.
The 3x-scale 4-combo matrix lives in docs/PARITY.md (round-5 section);
re-derive with tools/dynamics_parity.py --seeds 3,5,7 if the config
changes.
"""

import os

import pytest

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.environ.get("NEWSREC_REFERENCE_SRC",
                                         "/root/reference/src")),
        reason="reference source not available"),
]


@pytest.mark.parametrize("model_name,title_source,epochs,loss_tol,auc_tol", [
    # NRMS: trainable word table, dropout on both sides -> loosest band
    ("NRMS", None, 3, 0.06, 2.5),
    # NAML: frozen doc table -> dynamics nearly identical
    ("NAML", None, 3, 0.005, 0.75),
    # cross-format combos (frozen-table equivalence; torch side runs its
    # native format — tools/dynamics_parity.py module docstring). Frozen
    # tables keep dynamics near-identical -> tight bands; frozen NRMS
    # learns slowly (no trainable table), so it needs 6 epochs to clear
    # the >60-AUC learning bar (measured: 70.5/70.1 AUC, diff 0.4,
    # max epoch-loss diff 0.0175 at 6 epochs).
    ("NRMS", "doc_table", 6, 0.06, 1.0),
    ("NAML", "word_ids", 3, 0.005, 0.75),
])
def test_training_dynamics_match_reference(model_name, title_source, epochs,
                                           loss_tol, auc_tol, tmp_path):
    from tools.dynamics_parity import compare, run_pair

    pair = run_pair(model_name, title_source=title_source, epochs=epochs,
                    root=str(tmp_path))
    verdict = compare(pair, loss_tol=loss_tol, auc_tol=auc_tol)
    assert verdict["both_loss_decreasing"], verdict
    assert verdict["max_epoch_loss_diff"] <= loss_tol, verdict
    assert verdict["auc_diff"] <= auc_tol, verdict
    # both ends must actually have learned ranking signal, not just moved
    assert verdict["final_auc_jax"] > 60 and verdict["final_auc_torch"] > 60, \
        verdict
