"""TPU-gated differential tests for the COMPILED (Mosaic) Pallas kernel
(VERDICT r1 item 4; SURVEY.md §4 "Pallas conv path == lax path" row).

The main suite forces CPU (conftest), where the kernel runs interpreted;
these tests only run against a real TPU chip. Run manually before a bench:

    cd /root/repo && python -m pytest tests/test_pallas_tpu.py -q -p no:cacheprovider --noconftest

(--noconftest so the CPU-forcing conftest does not hide the chip.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="needs a real TPU chip (Mosaic-compiled kernel)",
)


def _lax_ref(x, w, b, slope=0.1):
    from ssdn_tpu.ops import conv2d, leaky_relu

    return leaky_relu(conv2d(x, w, b, shifted=True), slope)


@requires_tpu
@pytest.mark.parametrize("cin,cout", [(48, 48), (96, 96), (3, 48)])
def test_compiled_forward_matches_lax(cin, cout):
    from ssdn_tpu.ops.pallas import shifted_conv3x3_bias_act

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.bfloat16)
    got = jax.jit(
        lambda x, w, b: shifted_conv3x3_bias_act(x, w, b)
    )(x, w, b)
    ref = _lax_ref(x, w, b)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.08, atol=0.08,  # bf16 rounding; both paths accumulate fp32
    )


@requires_tpu
def test_compiled_backward_matches_lax():
    from ssdn_tpu.ops.pallas import fused_shifted_conv

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 48)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 48, 48)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(48) * 0.1, jnp.bfloat16)

    def loss_p(x, w, b):
        return jnp.sum(fused_shifted_conv(x, w, b).astype(jnp.float32) ** 2)

    def loss_l(x, w, b):
        return jnp.sum(_lax_ref(x, w, b).astype(jnp.float32) ** 2)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(x, w, b)
    gl = jax.jit(jax.grad(loss_l, argnums=(0, 1, 2)))(x, w, b)
    for a, c in zip(gp, gl):
        a32, c32 = np.asarray(a, np.float32), np.asarray(c, np.float32)
        scale = max(np.abs(c32).max(), 1e-6)
        np.testing.assert_allclose(a32 / scale, c32 / scale, atol=0.05)


@requires_tpu
def test_compiled_nin_head_matches_lax():
    """Fused 1x1-head kernel (Mosaic-compiled): fwd + grads vs the lax
    composition."""
    from ssdn_tpu.ops.pallas.nin_head import fused_nin_head, lax_reference

    rng = np.random.default_rng(3)
    M, CK, NA, NB, NC = 4096, 96, 384, 96, 9
    xs = tuple(jnp.asarray(rng.standard_normal((M, CK)) * 0.5, jnp.bfloat16)
               for _ in range(4))
    was = tuple(
        jnp.asarray(rng.standard_normal((CK, NA)) * 0.05, jnp.bfloat16)
        for _ in range(4))
    ba = jnp.asarray(rng.standard_normal(NA) * 0.1, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((NA, NB)) * 0.05, jnp.bfloat16)
    bb = jnp.asarray(rng.standard_normal(NB) * 0.1, jnp.float32)
    wc = jnp.asarray(rng.standard_normal((NB, NC)) * 0.1, jnp.bfloat16)
    bc = jnp.asarray(rng.standard_normal(NC) * 0.1, jnp.float32)
    args = (xs, was, ba, wb, bb, wc, bc)
    got = jax.jit(fused_nin_head)(*args)
    ref = jax.jit(lax_reference)(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref, np.float32),
                               rtol=0.06, atol=0.06)

    gf = jax.jit(jax.grad(lambda *a: jnp.sum(fused_nin_head(*a) ** 2),
                          argnums=tuple(range(7))))(*args)
    gl = jax.jit(jax.grad(lambda *a: jnp.sum(lax_reference(*a) ** 2),
                          argnums=tuple(range(7))))(*args)
    for a, c in zip(jax.tree.leaves(gf), jax.tree.leaves(gl)):
        a32, c32 = np.asarray(a, np.float32), np.asarray(c, np.float32)
        scale = max(np.abs(c32).max(), 1e-6)
        np.testing.assert_allclose(a32 / scale, c32 / scale, atol=0.05)


@requires_tpu
def test_compiled_full_model_matches_lax_backend():
    """conv_backend='pallas' (compiled) == 'lax' end to end on the chip."""
    from ssdn_tpu.models import blindspot_unet

    rng = np.random.default_rng(2)
    params = blindspot_unet.init_params(jax.random.key(0), 3, 9)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 64, 64, 3)), jnp.float32)
    f = jax.jit(
        lambda p, x, bk: blindspot_unet.apply(
            p, x, blindspot=True, compute_dtype=jnp.bfloat16, conv_backend=bk
        ),
        static_argnums=2,
    )
    got = f(params, x, "pallas")
    ref = f(params, x, "lax")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.1, atol=0.1)
