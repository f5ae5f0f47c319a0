"""End-to-end PSNR regression gates (SURVEY.md §4 end-to-end row; VERDICT r1
item 5, r2 items 7a/7b): a short real training run must reach an eval PSNR
threshold that a blind-spot / estimator / preprocessing regression cannot.

Two tiers (VERDICT r2 item 8 — the box has ONE CPU core, so the full-model
gates cost ~25 min each and cannot live in the default suite):

* **Fast tier** (default suite): narrow 16/32-feature net, 150 steps. Catches
  every *structural* failure class — broken blind spot (collapses to
  identity => PSNR == noisy), broken posterior mean / NLL (far below noisy),
  broken preprocessing or noise injection — in ~2 min per config.
  Calibration (this box, 1-core CPU, seed 0, step 150): gauss25 24.30 dB vs
  noisy 20.23 (+4.07); poisson30 23.12 vs 18.16 (+4.96); impulse50 21.03 vs
  12.49 (+8.54). Margins keep >=1.5 dB run-to-run slack.
  Blind-sigma has no fast quality gate: the sigma-estimation phase
  transition needs full width + ~200 steps (measured: 16/32 net is still
  below noisy at step 300, 24/48 at +0.2 dB after 200 steps / 5 min) — its
  mechanical coverage (step runs, loss decreases) is in test_train_step's
  config-2 parametrization and its quality lives in the slow tier.

* **Slow tier** (`-m slow`, deselected by the default `addopts`; run it
  per-round and record results — see README "Testing"): the full-model
  gates with the round-3-tightened thresholds that catch a ~1 dB quality
  regression (e.g. a subtly wrong Sigma path), plus the graded configs 2-4
  at full fidelity.
"""

import json

import pytest

NARROW = [
    "--enc-features", "16", "--dec-features", "32",
    "--nin-a-features", "64", "--nin-b-features", "32",
]


def _run_and_collect(wd, extra, iterations=300, eval_interval=100):
    from ssdn_tpu.cli.train import main as train_main

    train_main([
        "--workdir", str(wd), "--train-data", "synthetic:64",
        "--eval-data", "synthetic:6", "--iterations", str(iterations),
        "--batch-size", "8", "--patch-size", "32",
        "--eval-interval", str(eval_interval),
        "--snapshot-interval", str(iterations),
        "--log-interval", str(eval_interval),
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


# ---------------------------------------------------------------- fast tier


@pytest.mark.parametrize(
    "name,extra,margin",
    [
        # margin = required (best eval - noisy input) in dB; calibrated
        # values are +4.07 / +4.96 / +8.54 (module docstring)
        ("gauss25", [], 2.5),
        ("poisson", ["--noise-style", "poisson30"], 3.0),
        ("impulse", ["--noise-style", "impulse50"], 6.0),
    ],
)
def test_fast_gate_beats_noisy(tmp_path, name, extra, margin):
    evals, noisy = _run_and_collect(
        tmp_path / name, NARROW + extra, iterations=150, eval_interval=50
    )
    best = max(p for _, p in evals)
    final = dict(evals)[150]
    assert noisy is not None
    assert best >= noisy + margin, (
        f"{name}: best eval {best:.2f} dB < noisy {noisy:.2f} + {margin}; "
        f"evals={evals}"
    )
    # the run must not have collapsed after learning (guards the trainer
    # loop + optimizer coupling, not just the peak)
    assert final >= best - 1.5, (
        f"{name}: final {final:.2f} dB collapsed from best {best:.2f}; "
        f"evals={evals}"
    )


# ---------------------------------------------------------------- slow tier


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,extra,margin",
    [
        # graded configs 2-4 (VERDICT r2 item 7b): full-fidelity quality
        # gates — each must clearly beat its noisy input after 300 steps.
        # Margins are conservative vs the round-2 200-step on-chip smokes
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
