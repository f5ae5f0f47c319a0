"""Loss-spike rollback guard (SURVEY.md §5.3) — scale-aware margin.

The margin is guard_margin_k * EMA|deviation| (floored), so the guard must
catch spikes that are large *relative to the pipeline's own loss scale*:

* MSE-scale pipeline: losses ~1e-2 with ~1e-3 jitter — a +0.2 spike (which
  the old absolute 0.5 margin would have missed) must trigger.
* NLL-scale pipeline: losses can be negative — a -2.0 -> -1.6 spike must
  trigger too.

Scripted loss sequences drive the guard through a real Trainer so the
rollback/skip/early-stop machinery is exercised end to end.
"""

import dataclasses
import json
import os

import jax.numpy as jnp
import pytest

from ssdn_tpu.config import ModelConfig, TrainConfig, parse_noise_style
from ssdn_tpu.train.loop import Trainer

TINY_MODEL = dict(enc_features=8, dec_features=16, nin_a_features=32,
                  nin_b_features=16, compute_dtype="float32")


def guard_cfg(**kw):
    kw.setdefault("guard_check", 2)
    return TrainConfig(
        noise=parse_noise_style("gauss25"),
        model=ModelConfig(in_channels=3, **TINY_MODEL),
        patch_size=32,
        batch_size=2,
        iterations=16,
        eval_interval=10_000,
        snapshot_interval=10_000,
        seed=3,
        **kw,
    )


def run_with_scripted_losses(tmp_path, losses, cfg=None, subdir="w"):
    """Run Trainer.train with step_fn's loss overridden by a per-window
    script (one entry per guard window, cycled); returns captured stdout
    guard lines."""
    cfg = cfg or guard_cfg()
    tr = Trainer(cfg, str(tmp_path / subdir), train_data="synthetic:6:64",
                 log_interval=1000)
    real = tr.step_fn
    window = {"i": -1}

    def scripted(state, batch):
        state, m = real(state, batch)
        window["i"] += 1
        # one scripted value per guard window (the guard only reads the
        # window-boundary loss)
        per = max(cfg.guard_check, 1)
        val = losses[min(window["i"] // per, len(losses) - 1)]
        m = dict(m)
        m["loss"] = jnp.asarray(val, jnp.float32)
        return state, m

    tr.step_fn = scripted
    state = tr.train(resume=False)
    return state, tr


def test_guard_triggers_on_mse_scale_spike(tmp_path, capsys):
    # stable ~1e-2 losses with tiny jitter, then a +0.2 spike: relative
    # margin (6 * ~1e-3) catches it; the old absolute 0.5 margin would not
    losses = [0.010, 0.011, 0.010, 0.011, 0.010, 0.25, 0.010, 0.011]
    state, _ = run_with_scripted_losses(tmp_path, losses, subdir="mse")
    out = capsys.readouterr().out
    assert "[guard @" in out
    assert int(state.step) == 16  # skipped past the window, finished


def test_guard_triggers_on_negative_nll_spike(tmp_path, capsys):
    # NLL-style negative losses; +0.4 spike on a ~0.02-deviation stream
    losses = [-2.00, -1.99, -2.00, -2.01, -2.00, -1.60, -2.00, -2.00]
    state, _ = run_with_scripted_losses(tmp_path, losses, subdir="nll")
    out = capsys.readouterr().out
    assert "[guard @" in out
    assert int(state.step) == 16


def test_guard_no_false_trigger_on_normal_decrease(tmp_path, capsys):
    # ordinary noisy decreasing loss: no rollbacks
    losses = [1.0, 0.9, 0.85, 0.8, 0.78, 0.74, 0.7, 0.69]
    state, _ = run_with_scripted_losses(tmp_path, losses, subdir="ok")
    out = capsys.readouterr().out
    assert "[guard @" not in out
    assert int(state.step) == 16


def test_guard_disabled(tmp_path, capsys):
    cfg = guard_cfg(guard_check=0)
    losses = [0.01, 0.25, 0.01, 0.25]
    state, _ = run_with_scripted_losses(tmp_path, losses, cfg=cfg,
                                        subdir="off")
    out = capsys.readouterr().out
    assert "[guard @" not in out
    assert int(state.step) == 16


def test_best_psnr_persists_across_trainer_restart(tmp_path):
    cfg = guard_cfg()
    wd = str(tmp_path / "bp")
    tr = Trainer(cfg, wd, train_data="synthetic:6:64")
    assert tr.best_psnr == float("-inf")
    with open(os.path.join(wd, "best_psnr.json"), "w") as f:
        json.dump({"psnr": 30.5, "step": 8}, f)
    tr2 = Trainer(cfg, wd, train_data="synthetic:6:64")
    assert tr2.best_psnr == 30.5


def test_sampler_backend_pinned_across_restart(tmp_path):
    cfg = guard_cfg()
    wd = str(tmp_path / "sb")
    tr = Trainer(cfg, wd, train_data="synthetic:6:64")
    with open(os.path.join(wd, "sampler_backend.json")) as f:
        recorded = json.load(f)["backend"]
    assert recorded in ("native", "python")
    # second Trainer with auto resolves to the recorded backend
    tr2 = Trainer(cfg, wd, train_data="synthetic:6:64")
    from ssdn_tpu.native import NativePatchSampler

    resolved = (
        "native" if isinstance(tr2.sampler, NativePatchSampler) else "python"
    )
    assert resolved == recorded


def test_guard_rewinds_to_best_on_sustained_rollbacks(tmp_path, capsys):
    """Escalation (round-2 10k-step run: restore-and-skip re-spiked every
    window because the 50-step-old snapshot was already unstable): at
    guard_max_consecutive//2 consecutive rollbacks the trainer rewinds the
    weights to ckpt_best, keeping the step counter, and re-seeds the loss
    stats; sustained spiking still early-stops at the full limit."""
    import numpy as np

    from ssdn_tpu.train.step import init_state

    cfg = dataclasses.replace(
        guard_cfg(guard_max_consecutive=4), iterations=40
    )
    tr = Trainer(cfg, str(tmp_path / "resc"), train_data="synthetic:6:64",
                 log_interval=1000)
    # plant a recognizable best checkpoint
    best = init_state(cfg)
    marker = jnp.full_like(best.params["enc0"]["b"], 0.123)
    best = best.replace(
        params={**best.params,
                "enc0": {**best.params["enc0"], "b": marker}},
        step=jnp.asarray(6, jnp.int32),
    )
    captured = {}
    real = tr.step_fn
    window = {"i": -1}
    losses = [-2.0, -2.0, -2.0, 5.0]  # stable, then spike forever

    def scripted(state, batch):
        state, m = real(state, batch)
        window["i"] += 1
        if window["i"] == 0:
            # plant the best DURING the run (as _eval would): train() on a
            # fresh start rightly clears any pre-existing ckpt_best
            tr.best_ckpt.save(best, wait=True)
        per = max(cfg.guard_check, 1)
        val = losses[min(window["i"] // per, len(losses) - 1)]
        captured["enc0_b"] = np.asarray(state.params["enc0"]["b"])
        return state, {**m, "loss": jnp.asarray(val, jnp.float32)}

    tr.step_fn = scripted
    state = tr.train(resume=False)
    out = capsys.readouterr().out
    assert "rewinding weights to ckpt_best" in out
    assert "early-stopping" in out
    # the windows after the rewind trained FROM the planted best params
    np.testing.assert_allclose(captured["enc0_b"], 0.123, atol=0.05)


def test_all_intervals_disabled_still_trains(tmp_path):
    """guard_check=0 + log_interval=0 must not create zero-length windows
    (round-2 review finding: metrics=None crash before the first step)."""
    cfg = guard_cfg(guard_check=0)
    tr = Trainer(cfg, str(tmp_path / "nolog"), train_data="synthetic:6:64",
                 log_interval=0)
    state = tr.train(resume=False)
    assert int(state.step) == cfg.iterations


def test_fresh_run_discards_stale_best(tmp_path, capsys):
    """resume=False in a reused workdir clears best_psnr.json and ckpt_best
    so eval-patience / guard escalation can't act on a previous run's
    state (round-2 review finding)."""
    from ssdn_tpu.train.step import init_state

    cfg = guard_cfg()
    wd = str(tmp_path / "stale")
    tr = Trainer(cfg, wd, train_data="synthetic:6:64", log_interval=1000)
    tr.best_ckpt.save(init_state(cfg).replace(
        step=jnp.asarray(4, jnp.int32)), wait=True)
    with open(os.path.join(wd, "best_psnr.json"), "w") as f:
        json.dump({"psnr": 55.0, "step": 4}, f)
    tr2 = Trainer(cfg, wd, train_data="synthetic:6:64", log_interval=1000)
    assert tr2.best_psnr == 55.0  # loaded (resume case would keep it)
    tr2.train(resume=False)
    out = capsys.readouterr().out
    assert "discarding stale best" in out
    assert tr2.best_psnr != 55.0
    assert tr2.best_ckpt.latest_step() is None or \
        not os.path.exists(os.path.join(wd, "best_psnr.json"))
