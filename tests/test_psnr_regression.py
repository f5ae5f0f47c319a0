"""End-to-end PSNR regression gate (SURVEY.md §4 end-to-end row; VERDICT r1
item 5): a short real training run must reach an eval PSNR threshold that a
blind-spot / estimator / preprocessing regression cannot.

Calibration (this environment, CPU, seed 0): the 400-step run scores
23.1-24.8 dB across eval points on the synthetic corpus whose noisy input
is 20.23 dB at sigma=25. A net that collapses to identity (broken blind
spot) or to the prior mean sits at or below the noisy level, and a broken
posterior mean scores far below 22. Threshold 22.0 dB leaves ~1 dB of
run-to-run slack while still catching every failure class above.
"""

import json

import pytest


@pytest.mark.slow
def test_short_training_reaches_psnr_threshold(tmp_path):
    from ssdn_tpu.cli.train import main as train_main

    wd = tmp_path / "psnr_reg"
    train_main([
        "--workdir", str(wd), "--train-data", "synthetic:64",
        "--eval-data", "synthetic:6", "--iterations", "400",
        "--batch-size", "8", "--eval-interval", "200",
        "--snapshot-interval", "400", "--log-interval", "200",
    ])
    evals = []
    with open(wd / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("prefix") == "eval" and "psnr" in rec:
                evals.append((rec["step"], rec["psnr"]))
    assert evals, "no eval records written"
    final = dict(evals)[400]
    best = max(p for _, p in evals)
    assert final >= 22.0, (
        f"eval PSNR regressed: {final:.2f} dB at step 400 "
        f"(threshold 22.0, noisy level ~20.2); evals={evals}"
    )
    assert best >= 23.0, (
        f"best eval PSNR {best:.2f} dB below 23.0; evals={evals}"
    )
