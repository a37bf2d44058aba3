"""Config-5 value assertion: the trained clip-attention head must not lose
to the reference's 10-frame majority vote (deepfake_detection.py:146-196)
on the swap-proxy task, and must WIN on the bursty regime where majority
voting structurally fails (fake evidence in < half the frames can never
reach a majority). Full experiment + numbers: tools/clip_head_vs_vote.py,
results table in docs/DESIGN.md "Round-5 status"."""

import pytest

from tools.clip_head_vs_vote import run_experiment


@pytest.mark.slow
def test_clip_head_beats_majority_vote():
    # exactly the documented headline config (tools/clip_head_vs_vote.py
    # defaults): 48 train / 32 val clips. Smaller samples are statistically
    # fragile — at 24/24 the bursty vote can get lucky (frame-probe noise
    # pushes a few non-manipulated frames over 0.5) — while the headline
    # margins are wide (uniform 84.4% vs 62.5%, bursty 65.6% vs 46.9%).
    res = run_experiment(n_train=48, n_val=32, window=8, size=64, seed=0)

    # dense-evidence regime: the vote is viable here; the head must at
    # least match it (premise: learned aggregation is never a downgrade)
    uni = res["uniform"]
    assert uni["head_acc"] >= uni["vote_acc"], uni

    # bursty regime (3 of 8 frames manipulated): strict-majority voting is
    # structurally blind — the head must beat it outright
    bur = res["bursty"]
    assert bur["head_acc"] > bur["vote_acc"], bur
    assert bur["head_acc"] >= 0.55, bur     # and be better than chance
