"""Exactness tests for the r3 performance rewrites: LeakyReLU<->maxpool
commutation and the shift_down fold into dec1b's conv padding. Both must be
bit-exact rewrites of the literal composition (they change op order, not
math)."""

import jax
import jax.numpy as jnp
import numpy as np

from ssdn_tpu.models import blindspot_unet
from ssdn_tpu.ops import conv2d, leaky_relu, shift_down, shifted_maxpool_2x2
from ssdn_tpu.ops.shifted import maxpool_2x2


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


def test_lrelu_commutes_with_maxpool():
    x = _rand((2, 16, 16, 4))
    np.testing.assert_array_equal(
        np.asarray(maxpool_2x2(leaky_relu(x))),
        np.asarray(leaky_relu(maxpool_2x2(x))),
    )
    np.testing.assert_array_equal(
        np.asarray(shifted_maxpool_2x2(leaky_relu(x))),
        np.asarray(leaky_relu(shifted_maxpool_2x2(x))),
    )


def test_down_shift_fold_equals_shift_down():
    x = _rand((2, 16, 16, 3), seed=1)
    w = _rand((3, 3, 3, 5), seed=2) * 0.2
    b = _rand((5,), seed=3)
    lit = shift_down(conv2d(x, w, b, shifted=True), 1)
    fold = conv2d(x, w, b, shifted=True, down_shift=1)
    np.testing.assert_allclose(np.asarray(lit), np.asarray(fold),
                               rtol=1e-6, atol=1e-6)
    # and through the gradient
    g1 = jax.grad(lambda xx: jnp.sum(
        shift_down(conv2d(xx, w, b, shifted=True), 1) ** 2))(x)
    g2 = jax.grad(lambda xx: jnp.sum(
        conv2d(xx, w, b, shifted=True, down_shift=1) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_model_apply_matches_literal_composition():
    """apply() (with both rewrites active) == the literal reference
    composition: explicit shift_down + lrelu-before-pool, built from the
    same parameters via the naive decoder + a hand-built branch."""
    import ssdn_tpu.ops.rotation as R

    params = blindspot_unet.init_params(jax.random.key(0), 1, 2,
                                        enc=8, dec=16, nin_a=32, nin_b=16)
    x = _rand((2, 64, 64, 1), seed=4)

    got = blindspot_unet.apply(params, x, blindspot=True,
                               compute_dtype=jnp.float32,
                               decoder_mode="naive")

    def lit_conv(name, h):
        p = params[name]
        return leaky_relu(conv2d(h, p["w"], p["b"], shifted=True,
                                 out_dtype=jnp.float32))

    def lit_branch(h):
        skips = [h]
        h = lit_conv("enc1", lit_conv("enc0", h))
        h = shifted_maxpool_2x2(h)
        skips.append(h)
        for i in (2, 3, 4):
            h = shifted_maxpool_2x2(lit_conv(f"enc{i}", h))
            skips.append(h)
        h = shifted_maxpool_2x2(lit_conv("enc5", h))
        h = lit_conv("enc6", h)
        from ssdn_tpu.ops import upsample_2x_nearest

        for stage, skip in zip((5, 4, 3, 2, 1), reversed(skips)):
            h = upsample_2x_nearest(h)
            h = jnp.concatenate([h, skip], axis=-1)
            h = lit_conv(f"dec{stage}a", h)
            h = lit_conv(f"dec{stage}b", h)
        return h

    f = R.rotation_stack(x)
    f = lit_branch(f)
    f = shift_down(f, 1)
    f = R.rotation_unstack(f)
    f = leaky_relu(conv2d(f, params["nin_a"]["w"], params["nin_a"]["b"],
                          out_dtype=jnp.float32))
    f = leaky_relu(conv2d(f, params["nin_b"]["w"], params["nin_b"]["b"],
                          out_dtype=jnp.float32))
    want = conv2d(f, params["nin_c"]["w"], params["nin_c"]["b"],
                  out_dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
