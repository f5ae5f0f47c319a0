"""Differential tests: Pallas fused shifted-conv path == lax path, fwd and
bwd (SURVEY.md §4 integration row 2). On CPU the kernel runs in interpreter
mode; the real-TPU compiled path is exercised by bench.py / the driver."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdn_tpu.ops import conv2d, leaky_relu
from ssdn_tpu.ops.pallas import fused_shifted_conv, shifted_conv3x3_bias_act


def lax_reference(x, w, b, slope=0.1):
    return leaky_relu(conv2d(x, w, b, shifted=True), slope)


@pytest.mark.parametrize("cin,cout,h,wd", [(2, 5, 8, 8), (48, 96, 16, 16)])
def test_forward_matches_lax(cin, cout, h, wd):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, wd, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    got = shifted_conv3x3_bias_act(x, w, b, interpret=True)
    ref = lax_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match_lax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal(4) * 0.1, jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)

    def loss_pallas(x, w, b):
        out = fused_shifted_conv(x, w, b, 0.1, None, True)
        return jnp.sum((out - t) ** 2)

    def loss_lax(x, w, b):
        return jnp.sum((lax_reference(x, w, b) - t) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    gl = jax.grad(loss_lax, argnums=(0, 1, 2))(x, w, b)
    for a, r, name in zip(gp, gl, "xwb"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=2e-4, atol=1e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_blindspot_causality_preserved():
    # the fused kernel must keep the causal-up structure
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 3)) * 0.3, jnp.float32)
    b = jnp.zeros((3,), jnp.float32)
    base = np.asarray(shifted_conv3x3_bias_act(x, w, b, interpret=True))
    xb = np.asarray(x).copy()
    xb[0, 5] += 100.0  # bump row 5
    out = np.asarray(
        shifted_conv3x3_bias_act(jnp.asarray(xb), w, b, interpret=True)
    )
    diff = np.abs(out - base).max(axis=(0, 2, 3))
    assert np.all(diff[:5] == 0.0), "rows above the bump changed"
    assert np.any(diff[5:] != 0.0)


def test_bf16_path():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.3, jnp.float32)
    b = jnp.zeros((4,), jnp.float32)
    got = shifted_conv3x3_bias_act(x, w, b, interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = lax_reference(x, w, b)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(ref, dtype=np.float32),
        rtol=0.05, atol=0.05,
    )


def test_full_model_pallas_backend_matches_lax():
    from ssdn_tpu.models import apply, init_params

    params = init_params(jax.random.key(5), 1, 2, enc=8, dec=16,
                         nin_a=32, nin_b=16)
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, 32, 32, 1)), jnp.float32
    )
    ref = apply(params, x, compute_dtype=jnp.float32, conv_backend="lax")
    got = apply(params, x, compute_dtype=jnp.float32, conv_backend="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_bwd_mask_negative_zero_bf16():
    """-0.0 outputs must take the slope gradient branch (ADVICE r1).

    Scenario: pre-activation = -1.18e-38 (a normal fp32/bf16 value, so the
    forward takes the slope branch), leaky output = -1.18e-39 — an fp32
    subnormal that flush-to-zero turns into -0.0. A mask recovered with
    `out >= 0` then takes the positive branch (g) while the true local
    derivative is slope*g; signbit(-0.0) recovers the right branch."""
    x = jnp.full((1, 4, 4, 1), 0.0, jnp.bfloat16)
    x = x.at[0, 0, 0, 0].set(1.0)
    w = jnp.zeros((3, 3, 1, 1), jnp.bfloat16)
    # tap (2, 1) reads x[r, c] for out[r, c] under the causal-up pad
    w = w.at[2, 1, 0, 0].set(-1.18e-38)  # bf16 min normal, negative
    b = jnp.zeros((1,), jnp.bfloat16)

    def f(xv):
        out = fused_shifted_conv(xv, w, b, 0.1, None, True)
        return jnp.sum(out.astype(jnp.float32))

    out = fused_shifted_conv(x, w, b, 0.1, None, True)
    # confirm the scenario: the (0,0) output is a negative zero
    assert np.signbit(np.asarray(out, np.float32))[0, 0, 0, 0]
    g = jax.grad(f)(x)
    ref = jax.grad(
        lambda xv: jnp.sum(lax_reference(xv, w, b).astype(jnp.float32))
    )(x)
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-45)


def test_large_image_dispatches_to_lax():
    """Per-program blocks beyond the VMEM budget take the lax path instead
    of failing Mosaic compilation (ADVICE r1): same values, no error."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 512, 768, 48)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 48, 96)) * 0.1, jnp.float32)
    b = jnp.zeros((96,), jnp.float32)
    from ssdn_tpu.ops.pallas.shifted_conv import _VMEM_BUDGET, _vmem_bytes

    assert _vmem_bytes(512, 768, 48, 96, x.dtype, x.dtype) > _VMEM_BUDGET
    got = shifted_conv3x3_bias_act(x, w, b)
    ref = lax_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
