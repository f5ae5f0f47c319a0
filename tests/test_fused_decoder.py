"""Differential tests for the phase-decomposed decoder rewrite.

ops.shifted_upsample_concat_conv must be EXACTLY the same math as
upsample -> concat -> shifted conv (SURVEY.md §2.4 decoder stages); the
fused decoder_mode="fused" model path must match decoder_mode="naive"
with the same parameters, and must preserve the blind-spot invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdn_tpu.models import blindspot_unet
from ssdn_tpu.ops import (
    conv2d,
    shifted_upsample_concat_conv,
    upsample_2x_nearest,
)


def _naive(h, skip, w, b):
    x = jnp.concatenate([upsample_2x_nearest(h), skip], axis=-1)
    return conv2d(x, w, b, shifted=True)


@pytest.mark.parametrize("cup,cskip", [(96, 48), (96, 3), (48, 48), (7, 5)])
def test_op_matches_naive_composition(cup, cskip):
    rng = np.random.default_rng(0)
    n, hc, wc = 2, 8, 8
    h = jnp.asarray(rng.standard_normal((n, hc, wc, cup)), jnp.float32)
    skip = jnp.asarray(
        rng.standard_normal((n, 2 * hc, 2 * wc, cskip)), jnp.float32
    )
    w = jnp.asarray(
        rng.standard_normal((3, 3, cup + cskip, 96)) * 0.1, jnp.float32
    )
    b = jnp.asarray(rng.standard_normal((96,)) * 0.1, jnp.float32)
    got = shifted_upsample_concat_conv(h, skip, w, b)
    want = _naive(h, skip, w, b)
    # fp32 HIGHEST on both paths; the only difference is the order of tap
    # additions (collapsed-kernel sums), so agreement is at rounding level.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_op_matches_naive_nonsquare():
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.standard_normal((1, 4, 10, 24)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((1, 8, 20, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 16)) * 0.1, jnp.float32)
    b = jnp.zeros((16,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(shifted_upsample_concat_conv(h, skip, w, b)),
        np.asarray(_naive(h, skip, w, b)),
        rtol=1e-5, atol=1e-5,
    )


def test_op_gradients_match_naive():
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.standard_normal((1, 4, 4, 12)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((1, 8, 8, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 18, 10)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((10,)) * 0.1, jnp.float32)

    def loss_fused(args):
        h, skip, w, b = args
        return jnp.sum(jnp.sin(shifted_upsample_concat_conv(h, skip, w, b)))

    def loss_naive(args):
        h, skip, w, b = args
        return jnp.sum(jnp.sin(_naive(h, skip, w, b)))

    g1 = jax.grad(loss_fused)((h, skip, w, b))
    g2 = jax.grad(loss_naive)((h, skip, w, b))
    for a, c in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def test_model_fused_matches_naive_fp32():
    rng = np.random.default_rng(3)
    params = blindspot_unet.init_params(jax.random.key(0), 3, 9)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 64, 64, 3)), jnp.float32)
    kw = dict(blindspot=True, compute_dtype=jnp.float32,
              conv_precision="highest")
    got = blindspot_unet.apply(params, x, decoder_mode="fused", **kw)
    want = blindspot_unet.apply(params, x, decoder_mode="naive", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_model_fused_matches_naive_nonsquare():
    rng = np.random.default_rng(4)
    params = blindspot_unet.init_params(jax.random.key(0), 3, 9)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 32, 64, 3)), jnp.float32)
    kw = dict(blindspot=True, compute_dtype=jnp.float32,
              conv_precision="highest")
    got = blindspot_unet.apply(params, x, decoder_mode="fused", **kw)
    want = blindspot_unet.apply(params, x, decoder_mode="naive", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_blindspot_invariant_under_fused_decoder():
    """North-star invariant (SURVEY.md §2.4): d out[r,c] / d in[r,c] == 0,
    neighbors nonzero — on the fused decoder path."""
    params = blindspot_unet.init_params(jax.random.key(1), 1, 2)
    r, c = 13, 21

    def probe(x):
        out = blindspot_unet.apply(
            params, x, blindspot=True, compute_dtype=jnp.float32,
            decoder_mode="fused",
        )
        return out[0, r, c, 0]

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
    g = np.asarray(jax.grad(probe)(x))[0, :, :, 0]
    assert g[r, c] == 0.0
    for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        assert g[r + dr, c + dc] != 0.0
