"""SCST quality lift on a held-out split (VERDICT r2 #3).

The on-device SCST loop — the framework's differentiator vs the reference's
2-host-crossing RL loop (SURVEY.md §3.2) — must IMPROVE a held-out metric,
not merely run. Fixture: XE deliberately under-trained (40 steps => entropic
policy), then SCST optimizes CIDEr against the greedy baseline; val CIDEr is
measured on 64 held-out videos from the same generative process.

Frozen config (seed 0): measured val CIDEr 0.022 after XE -> 0.426 after 300
SCST steps (lift +0.40; the 150-step point already shows +0.088). Runs ~4 min
single-core CPU => slow-marked. Reproduce via
    PYTHONPATH= python scripts/scst_lift_experiment.py 40 300
"""
import pytest


@pytest.mark.slow
def test_scst_improves_heldout_cider():
    from scripts.scst_lift_experiment import build

    cider_xe, cider_scst, reward = build(xe_steps=40, scst_steps=300,
                                         seed=0, cpu=True)
    assert reward > 0.0
    # measured lift is +0.40; require a quarter of it so run-to-run float
    # jitter can never flake the assertion while a real regression still fails
    assert cider_scst > cider_xe + 0.1, (
        f"SCST did not lift held-out CIDEr: xe={cider_xe:.4f} "
        f"scst={cider_scst:.4f}")
