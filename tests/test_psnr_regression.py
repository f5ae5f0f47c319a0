"""End-to-end PSNR regression gate (SURVEY.md §4 end-to-end row; VERDICT r1
item 5): a short real training run must reach an eval PSNR threshold that a
blind-spot / estimator / preprocessing regression cannot.

Calibration (this environment, CPU, seed 0, patch 32 / batch 8): evals at
steps 100/200/300 score 19.8 / 22.7 / 24.1 dB on the synthetic corpus
whose noisy input is 20.23 dB at sigma=25. A net that collapses to
identity (broken blind spot) or to the prior mean sits at or below the
noisy level, and a broken posterior mean scores far below 22. Thresholds
22.5 (final) / 23.0 (best) leave >1 dB of run-to-run slack while catching
every failure class above. Patch 32 keeps the gate ~5x cheaper than the
flagship patch-64 shape; under the suite's 8-virtual-device CPU split the
run uses 1/8 of the machine, so expect several minutes.
"""

import json

import pytest


def _run_and_collect(wd, extra):
    from ssdn_tpu.cli.train import main as train_main

    train_main([
        "--workdir", str(wd), "--train-data", "synthetic:64",
        "--eval-data", "synthetic:6", "--iterations", "300",
        "--batch-size", "8", "--patch-size", "32",
        "--eval-interval", "100", "--snapshot-interval", "300",
        "--log-interval", "100",
    ] + extra)
    evals, noisy = [], None
    with open(wd / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("prefix") == "eval" and "psnr" in rec:
                evals.append((rec["step"], rec["psnr"]))
                noisy = rec.get("noisy_psnr", noisy)
    assert evals, "no eval records written"
    return evals, noisy


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,extra,margin",
    [
        # graded configs 2-4 (VERDICT r2 item 7b): a fast quality gate
        # that catches an estimator/blind-head regression — each must
        # clearly beat its noisy input after 300 steps. Margins are
        # conservative vs the round-2 200-step on-chip smokes
        # (blind-sigma +9.3, poisson +7.2, impulse +8.5 dB over noisy).
        ("blind_sigma", ["--noise-style", "gauss5_50", "--blind"], 2.0),
        ("poisson", ["--noise-style", "poisson30"], 2.0),
        ("impulse", ["--noise-style", "impulse50"], 2.0),
    ],
)
def test_graded_config_beats_noisy(tmp_path, name, extra, margin):
    evals, noisy = _run_and_collect(tmp_path / name, extra)
    best = max(p for _, p in evals)
    assert noisy is not None
    assert best >= noisy + margin, (
        f"{name}: best eval {best:.2f} dB < noisy {noisy:.2f} + {margin}; "
        f"evals={evals}"
    )


@pytest.mark.slow
def test_short_training_reaches_psnr_threshold(tmp_path):
    evals, noisy = _run_and_collect(tmp_path / "psnr_reg", [])
    assert evals, "no eval records written"
    final = dict(evals)[300]
    best = max(p for _, p in evals)
    # thresholds tightened round 3 (VERDICT r2 item 7a): calibration run
    # scores 24.1 dB at step 300; 23.4 leaves ~0.7 dB run-to-run slack
    # and now catches a ~1 dB quality regression, not just collapse
    assert final >= 23.4, (
        f"eval PSNR regressed: {final:.2f} dB at step 300 "
        f"(threshold 23.4, calibrated 24.1, noisy ~20.2); evals={evals}"
    )
    assert best >= 23.4, (
        f"best eval PSNR {best:.2f} dB below 23.4; evals={evals}"
    )
    # posterior-mean-specific floor: a broken Sigma/posterior path can
    # leave mu healthy while the denoised output barely beats the input
    assert final >= noisy + 3.0, (
        f"denoised {final:.2f} dB < noisy {noisy:.2f} + 3.0"
    )
