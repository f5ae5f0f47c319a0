"""North-star model tests (SURVEY.md §2.4, §4 unit row 1).

The defining invariant: with blindspot=True, d out(r,c) / d in(r,c) == 0
exactly for every pixel, while all four immediate neighbors have influence.
Influence is probed with finite +100 bumps, not gradients — max-pool
gradients are argmax-sparse and false-negative (see .claude/skills/verify).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdn_tpu.models import apply, init_params, param_count


def make_net(channels, n_out, blindspot=True, dtype=jnp.float32, seed=0):
    params = init_params(
        jax.random.key(seed), channels, n_out, blindspot=blindspot
    )
    fn = jax.jit(
        lambda x: apply(params, x, blindspot=blindspot, compute_dtype=dtype)
    )
    return params, fn


def test_param_count_matches_paper_scale():
    # SURVEY.md §2.4: total approx 1.0-1.3 M for the RGB net.
    params = init_params(jax.random.key(0), 3, 9)
    n = param_count(params)
    assert 1_000_000 <= n <= 1_300_000, n


def test_blindspot_invariant_and_neighbor_coverage():
    _, fn = make_net(1, 2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), jnp.float32)
    base = np.asarray(fn(x))
    assert np.isfinite(base).all()

    pixels = [(0, 0), (0, 31), (31, 0), (31, 31), (15, 17), (16, 16)]
    pixels += [tuple(rng.integers(0, 32, 2)) for _ in range(10)]
    for r, c in pixels:
        xb = np.asarray(x).copy()
        xb[0, r, c, 0] += 100.0
        out = np.asarray(fn(jnp.asarray(xb)))
        assert np.all(out[0, r, c] == base[0, r, c]), f"blind spot leak at {(r, c)}"
        assert np.any(out != base), f"bump at {(r, c)} had no effect anywhere"

    r, c = 15, 17
    for dr, dc in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        xb = np.asarray(x).copy()
        xb[0, r + dr, c + dc, 0] += 100.0
        out = np.asarray(fn(jnp.asarray(xb)))
        assert np.any(out[0, r, c] != base[0, r, c]), (
            f"neighbor ({dr},{dc}) has no influence — shift/rotation broken"
        )


def test_blindspot_invariant_exact_gradient():
    # gradient at the center pixel must be exactly zero (structural zero)
    _, fn = make_net(1, 2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), jnp.float32)
    g = jax.grad(lambda xx: jnp.sum(fn(xx)[0, 9, 21] ** 2))(x)
    assert float(jnp.abs(g[0, 9, 21, 0])) == 0.0


def test_blindspot_invariant_bf16():
    # invariant is structural: holds in the bf16 fast path too
    _, fn = make_net(1, 2, dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), jnp.float32)
    base = np.asarray(fn(x))
    xb = np.asarray(x).copy()
    xb[0, 10, 10, 0] += 100.0
    out = np.asarray(fn(jnp.asarray(xb)))
    assert np.all(out[0, 10, 10] == base[0, 10, 10])


def test_output_shape_rgb():
    _, fn = make_net(3, 10)  # 3 mu + 6 cov + 1 sigma channel
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    assert fn(x).shape == (2, 64, 64, 10)
    assert fn(x).dtype == jnp.float32


def test_baseline_unet_sees_center():
    _, fn = make_net(3, 3, blindspot=False)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    base = np.asarray(fn(x))
    xb = np.asarray(x).copy()
    xb[0, 12, 12, :] += 100.0
    out = np.asarray(fn(jnp.asarray(xb)))
    assert np.any(out[0, 12, 12] != base[0, 12, 12])


def test_baseline_unet_nonsquare_ok():
    _, fn = make_net(3, 3, blindspot=False)
    x = jnp.zeros((1, 32, 64, 3), jnp.float32)
    assert fn(x).shape == (1, 32, 64, 3)


def test_rejects_bad_spatial_dims():
    params = init_params(jax.random.key(0), 1, 2)
    with pytest.raises(ValueError):
        apply(params, jnp.zeros((1, 48, 48, 1)))


def test_deterministic_across_jit_invocations():
    params, fn = make_net(1, 2)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 32, 32, 1)),
                    jnp.float32)
    a = np.asarray(fn(x))
    b = np.asarray(
        jax.jit(lambda xx: apply(params, xx, compute_dtype=jnp.float32))(x)
    )
    np.testing.assert_array_equal(a, b)
