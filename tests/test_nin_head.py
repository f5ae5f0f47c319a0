"""Differential tests for the fused 1x1-head Pallas kernel
(ops/pallas/nin_head.py) against the lax composition — forward and full
gradients, interpret mode (CI/CPU). The compiled (Mosaic) path is covered
on the chip by tests/test_pallas_tpu.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ssdn_tpu.ops.pallas.nin_head as NH
from ssdn_tpu.ops.pallas.nin_head import (
    fused_nin_head,
    lax_reference,
    nin_head_supported,
)


@pytest.fixture(autouse=True)
def _interpret_mode():
    NH.INTERPRET = True
    yield
    NH.INTERPRET = False


M, NA, NB = 512, 384, 96


def _inputs(n_out=9, dtype=jnp.float32, seed=0, k=4, ck=96):
    rng = np.random.default_rng(seed)
    xs = tuple(
        jnp.asarray(rng.standard_normal((M, ck)) * 0.5, dtype)
        for _ in range(k)
    )
    was = tuple(
        jnp.asarray(rng.standard_normal((ck, NA)) * 0.05, dtype)
        for _ in range(k)
    )
    ba = jnp.asarray(rng.standard_normal(NA) * 0.1, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((NA, NB)) * 0.05, dtype)
    bb = jnp.asarray(rng.standard_normal(NB) * 0.1, jnp.float32)
    wc = jnp.asarray(rng.standard_normal((NB, n_out)) * 0.1, dtype)
    bc = jnp.asarray(rng.standard_normal(n_out) * 0.1, jnp.float32)
    return xs, was, ba, wb, bb, wc, bc


@pytest.mark.parametrize("n_out,k", [(2, 1), (9, 4)])
def test_forward_matches_lax(n_out, k):
    args = _inputs(n_out, k=k)
    got = fused_nin_head(*args)
    ref = lax_reference(*args)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_lax():
    args = _inputs(9, seed=1)

    def loss_fused(*a):
        return jnp.sum(fused_nin_head(*a) ** 2)

    def loss_lax(*a):
        return jnp.sum(lax_reference(*a) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gl = jax.grad(loss_lax, argnums=tuple(range(7)))(*args)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gl)):
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b, np.float32)
        scale = max(np.abs(b32).max(), 1e-6)
        np.testing.assert_allclose(a32 / scale, b32 / scale, atol=2e-5)


def test_bf16_forward_close():
    args = _inputs(9, dtype=jnp.bfloat16, seed=2)
    got = fused_nin_head(*args)
    ref = lax_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_tile_picker():
    assert nin_head_supported(4096) and nin_head_supported(512)
    assert nin_head_supported(384 * 64 * 64)
    assert not nin_head_supported(100)


def test_model_head_backend_matches_lax():
    """apply(head_backend='pallas') == apply(head_backend='lax') end to
    end (interpret mode on CPU), square and non-square."""
    from ssdn_tpu.models import blindspot_unet

    params = blindspot_unet.init_params(jax.random.key(0), 1, 2,
                                        enc=8, dec=16, nin_a=32, nin_b=16)
    for shape in ((2, 32, 32, 1), (1, 32, 64, 1)):
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal(shape), jnp.float32)
        ref = blindspot_unet.apply(params, x, blindspot=True,
                                   compute_dtype=jnp.float32,
                                   head_backend="lax")
        got = blindspot_unet.apply(params, x, blindspot=True,
                                   compute_dtype=jnp.float32,
                                   head_backend="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_model_head_backend_grads_match():
    from ssdn_tpu.models import blindspot_unet

    params = blindspot_unet.init_params(jax.random.key(1), 1, 2,
                                        enc=8, dec=16, nin_a=32, nin_b=16)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 32, 32, 1)),
        jnp.float32)

    def loss(p, hb):
        return jnp.sum(
            blindspot_unet.apply(p, x, blindspot=True,
                                 compute_dtype=jnp.float32,
                                 head_backend=hb) ** 2
        )

    gp = jax.grad(loss)(params, "pallas")
    gl = jax.grad(loss)(params, "lax")
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gl)):
        a32, b32 = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b32).max(), 1e-6)
        np.testing.assert_allclose(a32 / scale, b32 / scale, atol=5e-5)
