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
placement), so tolerances are statistical, not bitwise. Observed on the
committed configs (3 epochs): NRMS max epoch-loss diff 0.014 / AUC diff
1.4; NAML 0.0004 / 0.01.
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


@pytest.mark.parametrize("model_name,loss_tol,auc_tol", [
    # NRMS: trainable word table, dropout on both sides -> loosest band
    ("NRMS", 0.08, 3.0),
    # NAML: frozen doc table -> dynamics nearly identical
    ("NAML", 0.02, 1.0),
])
def test_training_dynamics_match_reference(model_name, loss_tol, auc_tol,
                                           tmp_path):
    from tools.dynamics_parity import compare, run_pair

    pair = run_pair(model_name, epochs=3, root=str(tmp_path))
    verdict = compare(pair, loss_tol=loss_tol, auc_tol=auc_tol)
    assert verdict["both_loss_decreasing"], verdict
    assert verdict["max_epoch_loss_diff"] <= loss_tol, verdict
    assert verdict["auc_diff"] <= auc_tol, verdict
    # both ends must actually have learned ranking signal, not just moved
    assert verdict["final_auc_jax"] > 60 and verdict["final_auc_torch"] > 60, \
        verdict
