"""Eval-quality early stop (TrainConfig.eval_patience): the measured
loss/eval disconnect (README parity table — loss healthy while eval PSNR
decays) means the loss-spike guard alone cannot end a degrading run; after
N consecutive evals > delta dB below the best, training stops and
ckpt_best keeps the best state."""

import json

import pytest

from ssdn_tpu.config import ModelConfig, TrainConfig, parse_noise_style
from ssdn_tpu.train.loop import Trainer

TINY_MODEL = dict(enc_features=8, dec_features=16, nin_a_features=32,
                  nin_b_features=16, compute_dtype="float32")


def patience_cfg(**kw):
    return TrainConfig(
        noise=parse_noise_style("gauss25"),
        model=ModelConfig(in_channels=3, **TINY_MODEL),
        patch_size=32,
        batch_size=2,
        iterations=20,
        eval_interval=2,
        snapshot_interval=10_000,
        guard_check=0,
        seed=3,
        **kw,
    )


def run_with_scripted_psnrs(tmp_path, psnrs, cfg, subdir="w"):
    tr = Trainer(cfg, str(tmp_path / subdir), train_data="synthetic:6:64",
                 eval_data="synthetic:2:64", log_interval=1000)
    seq = {"i": 0}

    def fake_eval(cfg_, params, dataset, **kw):
        v = psnrs[min(seq["i"], len(psnrs) - 1)]
        seq["i"] += 1
        return {"psnr_mean": v, "psnr_per_image": [v],
                "noisy_psnr_mean": 20.0, "n_images": 1}

    import ssdn_tpu.train.loop as loop_mod

    orig = loop_mod.evaluate_dataset
    loop_mod.evaluate_dataset = fake_eval
    try:
        state = tr.train(resume=False)
    finally:
        loop_mod.evaluate_dataset = orig
    return tr, state


def test_early_stop_on_sustained_degradation(tmp_path, capsys):
    # best 30 dB at eval 1; then > 1 dB below best for 3 consecutive evals
    cfg = patience_cfg(eval_patience=3, eval_patience_delta=1.0)
    tr, state = run_with_scripted_psnrs(
        tmp_path, [30.0, 28.0, 27.5, 27.0, 26.0, 25.0], cfg
    )
    out = capsys.readouterr().out
    assert "eval-patience" in out
    # stopped at the 4th eval (step 8), long before iterations=20
    assert int(state.step) == 8
    assert tr.best_psnr == 30.0
    # best checkpoint + metadata recorded at the peak
    with open(tmp_path / "w" / "best_psnr.json") as f:
        assert json.load(f)["psnr"] == 30.0


def test_recovery_resets_the_streak(tmp_path, capsys):
    # dips below best-delta twice, recovers, dips again — patience 3 never
    # sees 3 consecutive bad evals, so the run completes
    cfg = patience_cfg(eval_patience=3, eval_patience_delta=1.0)
    tr, state = run_with_scripted_psnrs(
        tmp_path,
        [30.0, 28.0, 28.0, 29.5, 28.0, 28.0, 29.6, 28.0, 29.5, 29.5],
        cfg,
    )
    out = capsys.readouterr().out
    assert "eval-patience" not in out
    assert int(state.step) == cfg.iterations


def test_disabled_by_default(tmp_path, capsys):
    cfg = patience_cfg()  # eval_patience = 0
    tr, state = run_with_scripted_psnrs(
        tmp_path, [30.0, 20.0, 20.0, 20.0, 20.0], cfg
    )
    assert "eval-patience" not in capsys.readouterr().out
    assert int(state.step) == cfg.iterations
