"""End-to-end PSNR regression gates (SURVEY.md §4 end-to-end row; VERDICT r1
item 5, r2 items 7a/7b): a short real training run must reach an eval PSNR
threshold that a blind-spot / estimator / preprocessing regression cannot.

Gate design (round 3, revised after the slow tier went red):

* **Streaming corpus** (`synthetic:inf:128`): every step trains on fresh
  deterministic images, so small-corpus memorization cannot shape the curve.

* **Eval at the training patch size** (32px eval images). The original
  gates trained at patch 32 and evaluated 128px images; that measures
  *size extrapolation*, not denoising quality, and it is unstable BY
  DESIGN of the architecture: trained at 32px the 5-level U-Net's deepest
  stages only ever see 1x1 maps, and as training proceeds they specialize
  to that degenerate regime — measured on-chip (full model, 300 steps,
  streaming corpus): eval at 128px collapses 24.2 -> 13.9 dB between steps
  100 and 300 while THE SAME weights score 28.9 dB on 32px inputs and the
  train-side mu-MSE sits at the noise floor. Adam eps=1e-3 (the round-1
  default) merely slowed the specialization, which is why the old gates
  were calibrated green and went red when the default moved to the
  reference's 1e-8. Production shapes (patch >= 64) do not hit this: the
  10k-step runs (README) eval 128-512px images monotonically. The gates
  now eval at the train size, which is the regime they are meant to gate;
  size extrapolation is covered by the patch-64 long-run evidence.

* Calibration (TPU v5e, seed 0, streaming corpus, batch 8, patch 32 —
  CPU-vs-chip bf16 drift measured at ~0.1-0.3 dB on these curves):
    fast tier (narrow 16/32 net, 250 steps, eval@250):
      gauss25 22.12 vs noisy 20.29 (+1.84); poisson30 21.07 vs 18.10
      (+2.97); impulse50 19.33 vs 12.40 (+6.93)
    slow tier (full model, 300 steps, eval@300):
      gauss25 24.63 (+4.35); poisson30 22.96 (+4.86); impulse50 21.36
      (+8.96); blind-sigma 22.39 vs 19.59 (+2.80)
  All curves are monotone; the gates also assert no post-peak collapse.

* **Fast tier** (default suite): narrow 16/32-feature net, 250 steps
  (~3 min per config on the 1-core box). Catches every *structural*
  failure class — broken blind spot (collapses to identity => PSNR ==
  noisy), broken posterior mean / NLL (at or below noisy), broken
  preprocessing or noise injection. Blind-sigma has no fast quality gate:
  the sigma-estimation phase transition needs full width (measured round
  3: the 16/32 net is below noisy at step 300) — its mechanical coverage
  is in test_train_step and its quality lives in the slow tier.

* **Slow tier** (`-m slow`, deselected by the default `addopts`; run it
  per-round and record results — see README "Testing"): the full-model
  gates with thresholds ~1 dB under calibration, tight enough to catch a
  ~1 dB quality regression (e.g. a subtly wrong Sigma path).
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
        "--workdir", str(wd), "--train-data", "synthetic:inf:128",
        "--eval-data", "synthetic:6:32", "--iterations", str(iterations),
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
        # margins are +1.84 / +2.97 / +6.93 (module docstring)
        ("gauss25", [], 1.0),
        ("poisson", ["--noise-style", "poisson30"], 1.8),
        ("impulse", ["--noise-style", "impulse50"], 4.5),
    ],
)
def test_fast_gate_beats_noisy(tmp_path, name, extra, margin):
    evals, noisy = _run_and_collect(
        tmp_path / name, NARROW + extra, iterations=250, eval_interval=50
    )
    best = max(p for _, p in evals)
    final = dict(evals)[250]
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


def test_fast_gate_blind_impulse_stability(tmp_path):
    """Regression gate for the blind-alpha runaway (round 3): before the
    scaled-sigmoid bound + log-barrier regularizer, impulse30_60 --blind
    NaN'd within 20 steps (alpha_hat raced to the 'everything corrupted'
    rail and log1p(-1) NaN'd the trunk) — a failure class only a multi-step
    trainer run catches. Calibration (CPU, narrow net, this exact shape):
    alpha_hat 0.49 at step 200 (injected range [0.3,0.6]), eval 18.8 dB vs
    noisy 13.3 (+5.5) at step 150."""
    wd = tmp_path / "impulse_blind"
    evals, noisy = _run_and_collect(
        wd, NARROW + ["--noise-style", "impulse30_60", "--blind"],
        iterations=250, eval_interval=50,
    )
    best = max(p for _, p in evals)
    final = dict(evals)[250]
    assert noisy is not None
    assert best >= noisy + 3.5, (
        f"blind impulse: best eval {best:.2f} dB < noisy {noisy:.2f} + 3.5; "
        f"evals={evals}"
    )
    assert final >= best - 1.5, (
        f"blind impulse: final {final:.2f} collapsed from best {best:.2f}"
    )
    # the alpha estimate must sit interior (rail race => ~0.98 or NaN)
    ah = [
        rec["alpha_hat"]
        for rec in map(json.loads, open(wd / "metrics.jsonl"))
        if "alpha_hat" in rec
    ]
    assert ah, "no alpha_hat in train metrics"
    assert 0.1 < ah[-1] < 0.9, f"alpha_hat off-rail check failed: {ah}"


# ----------------------------------------------------------------- mid tier


@pytest.mark.midtier
def test_midtier_full_model_gate(tmp_path):
    """Full-WIDTH quality gate in the DEFAULT suite (VERDICT r3 weak #5).

    The fast tier's narrow nets catch structural breakage but cannot see
    full-width quality drift (e.g. a subtly wrong Sigma path that costs
    ~1 dB at 48/96 features); the slow tier can, but is per-round manual —
    a regression introduced after the last -m slow run would ship. This
    gate is the cheap middle: the full 48/96 model, 150 steps, gauss25 —
    ~10-12 min on the 1-core box, in the default suite (opt out with
    -m "not midtier").

    Calibration (round 5, measured ON CPU — the platform the gate actually
    runs on; VERDICT r4 weak #4 asked for a CPU basis): seed 0, streaming
    corpus, batch 8, patch 32, eval synthetic:6:32 — step 50 -> 21.52,
    100 -> 22.25, 150 -> 23.27 dB (noisy 20.29). The round-4 on-chip curve
    was 21.92 / 23.17 / 23.35, i.e. <= 0.4 dB chip-vs-CPU drift and only
    0.08 dB at the gated step. Threshold 22.3 leaves ~1 dB slack below the
    CPU-measured 23.27 while catching a ~1 dB full-width regression.
    """
    evals, noisy = _run_and_collect(
        tmp_path / "midtier", [], iterations=150, eval_interval=50
    )
    best = max(p for _, p in evals)
    final = dict(evals)[150]
    assert noisy is not None
    assert best >= 22.3, (
        f"full-model best eval {best:.2f} dB < 22.3 (calibrated 23.35 at "
        f"step 150, noisy ~20.3); evals={evals}"
    )
    assert final >= best - 1.0, (
        f"full-model final {final:.2f} dB collapsed from best {best:.2f}; "
        f"evals={evals}"
    )


# ---------------------------------------------------------------- slow tier


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,extra,margin",
    [
        # graded configs 2-4 (VERDICT r2 item 7b): full-width quality gates
        # at the gate shape. Calibrated margins +2.80 / +4.86 / +8.96
        # (module docstring); thresholds leave ~1.2-2 dB slack.
        ("blind_sigma", ["--noise-style", "gauss5_50", "--blind"], 1.5),
        ("poisson", ["--noise-style", "poisson30"], 3.5),
        ("impulse", ["--noise-style", "impulse50"], 7.0),
    ],
)
def test_graded_config_beats_noisy(tmp_path, name, extra, margin):
    evals, noisy = _run_and_collect(tmp_path / name, extra)
    best = max(p for _, p in evals)
    final = evals[-1][1]
    assert noisy is not None
    assert best >= noisy + margin, (
        f"{name}: best eval {best:.2f} dB < noisy {noisy:.2f} + {margin}; "
        f"evals={evals}"
    )
    assert final >= best - 1.0, (
        f"{name}: final {final:.2f} dB collapsed from best {best:.2f}; "
        f"evals={evals}"
    )


@pytest.mark.slow
def test_short_training_reaches_psnr_threshold(tmp_path):
    evals, noisy = _run_and_collect(tmp_path / "psnr_reg", [])
    assert evals, "no eval records written"
    final = dict(evals)[300]
    best = max(p for _, p in evals)
    # calibrated 24.63 at step 300 on-chip (module docstring); 23.6 leaves
    # ~1 dB slack for run-to-run/backend drift while catching a ~1 dB
    # quality regression (e.g. a subtly wrong Sigma path)
    assert final >= 23.6, (
        f"eval PSNR regressed: {final:.2f} dB at step 300 "
        f"(threshold 23.6, calibrated 24.63, noisy ~20.3); evals={evals}"
    )
    assert best >= 23.6, (
        f"best eval PSNR {best:.2f} dB below 23.6; evals={evals}"
    )
    # posterior-mean-specific floor: a broken Sigma/posterior path can
    # leave mu healthy while the denoised output barely beats the input
    assert final >= noisy + 3.0, (
        f"denoised {final:.2f} dB < noisy {noisy:.2f} + 3.0"
    )
