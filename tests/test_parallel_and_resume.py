"""Distributed + persistence integration tests (SURVEY.md §4):

* DP on 8 virtual CPU devices == single-device run with the same global
  batch (gradient-psum equivalence).
* Checkpoint save -> restore -> continue == uninterrupted run (exact
  preemption-resume, SURVEY.md §5.3).
* The driver's dryrun_multichip contract.
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdn_tpu import parallel
from ssdn_tpu.config import ModelConfig, TrainConfig, parse_noise_style
from ssdn_tpu.data import PatchSampler, synthetic_dataset
from ssdn_tpu.train.step import init_state, make_train_step

TINY_MODEL = dict(enc_features=8, dec_features=16, nin_a_features=32,
                  nin_b_features=16, compute_dtype="float32")


def tiny_cfg(**kw):
    return TrainConfig(
        noise=parse_noise_style("gauss25"),
        model=ModelConfig(in_channels=3, **TINY_MODEL),
        patch_size=32,
        batch_size=8,
        iterations=100,
        lr=1e-3,
        seed=3,
        **kw,
    )


def batches(cfg, n):
    ds = synthetic_dataset(n=6, size=64, channels=3, seed=2)
    s = PatchSampler(ds, cfg.patch_size, cfg.batch_size, seed=cfg.seed)
    return [s.sample(i) for i in range(n)]


def test_dp_equals_single_device():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg = tiny_cfg()
    bs = batches(cfg, 3)

    step1 = jax.jit(make_train_step(cfg))
    s1 = init_state(cfg)
    for b in bs:
        s1, m1 = step1(s1, jnp.asarray(b))

    mesh = parallel.make_mesh(jax.devices()[:8])
    stepn = parallel.jit_data_parallel(make_train_step(cfg), mesh,
                                       donate_state=False)
    sn = jax.device_put(init_state(cfg), parallel.replicated(mesh))
    for b in bs:
        sn, mn = stepn(sn, parallel.put_batch(b, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(mn["loss"]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sn.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6
        )


def test_checkpoint_resume_exact(tmp_path):
    from ssdn_tpu.train.loop import CheckpointManager

    cfg = tiny_cfg()
    bs = batches(cfg, 6)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)

    # uninterrupted 6 steps
    s_full = init_state(cfg)
    for b in bs:
        s_full, _ = step(s_full, jnp.asarray(b))

    # 3 steps -> save -> restore -> 3 steps
    s = init_state(cfg)
    for b in bs[:3]:
        s, _ = step(s, jnp.asarray(b))
    ck = CheckpointManager(str(tmp_path), cfg)
    ck.save(s, wait=True)
    restored = ck.restore(init_state(cfg))
    assert int(restored.step) == 3
    for b in bs[3:]:
        restored, _ = step(restored, jnp.asarray(b))

    for a, b_ in zip(
        jax.tree.leaves(s_full.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_dryrun_multichip_contract():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_contract():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    assert out.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())
