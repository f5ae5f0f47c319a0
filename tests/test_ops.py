"""Unit tests for the shifted ops (SURVEY.md §4 unit rows 1-2).

Each shifted op must preserve the invariant: output row r depends only on
input rows <= r. Verified with exact jacobian-vector products and with a
hand-typed torch-CPU oracle for the pad-shift-crop conv (SURVEY.md §0
verification protocol step 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdn_tpu.ops import (
    conv2d,
    rot90,
    rotation_stack,
    rotation_unstack,
    shift_down,
    shifted_maxpool_2x2,
    upsample_2x_nearest,
)


def causal_rows_ok(fn, in_shape, first_out_row, dropped_rows=(), seed=0):
    """Bump input row r0 by +100 (wins any max); assert output rows
    < first_out_row(r0) are untouched and rows >= it are affected.
    Rows in `dropped_rows` must have no effect at all (cropped by the shift).
    """
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(in_shape), jnp.float32)
    base = np.asarray(fn(x))
    h = in_shape[1]
    for r0 in [0, 1, h // 2, h - 1]:
        bump = np.zeros(in_shape, np.float32)
        bump[:, r0] = 100.0
        diff = np.asarray(fn(x + jnp.asarray(bump))) - base
        if r0 in dropped_rows:
            assert np.all(diff == 0.0), f"dropped row {r0} leaked"
            continue
        out_r = first_out_row(r0)
        assert np.all(diff[:, :out_r] == 0.0), f"row {r0} leaked upward"
        assert np.any(diff[:, out_r:] != 0.0), f"row {r0} had no effect at all"


def test_shift_down_semantics():
    x = jnp.arange(2 * 4 * 3 * 1, dtype=jnp.float32).reshape(2, 4, 3, 1)
    y = shift_down(x, 1)
    assert np.allclose(np.asarray(y)[:, 0], 0.0)
    assert np.allclose(np.asarray(y)[:, 1:], np.asarray(x)[:, :-1])


def test_shifted_conv_is_causal_up():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 5)) * 0.2, jnp.float32)
    b = jnp.zeros((5,), jnp.float32)
    causal_rows_ok(
        lambda x: conv2d(x, w, b, shifted=True), (1, 8, 8, 2),
        first_out_row=lambda r0: r0,
    )


def test_shifted_conv_vs_pad_crop_formulation():
    """Fused asymmetric-padding conv == explicit pad-top-2 / SAME / crop."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4)) * 0.2, jnp.float32)
    fused = conv2d(x, w, shifted=True)
    xpad = jnp.pad(x, [(0, 0), (1, 0), (0, 0), (0, 0)])
    ref = conv2d(xpad, w, shifted=False)[:, : x.shape[1]]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


def test_shifted_conv_vs_torch_oracle():
    """Differential test against a hand-typed PyTorch-CPU conv oracle
    (SURVEY.md §4 unit row 2): fused shifted conv == pad-top(k-1) + conv
    'same-width' + take the causal rows."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 3, 6)) * 0.3).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)

    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                             shifted=True))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)  # OIHW
    bt = torch.from_numpy(b)
    xt = torch.nn.functional.pad(xt, (1, 1, 2, 0))  # (wl, wr, top, bottom)
    ref = torch.nn.functional.conv2d(xt, wt, bt)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_shifted_conv_grad_vs_torch_oracle():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 2, 3)) * 0.3).astype(np.float32)

    def loss(xj, wj):
        return jnp.sum(conv2d(xj, wj, shifted=True) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
    wt = torch.from_numpy(w).permute(3, 2, 0, 1).requires_grad_(True)
    out = torch.nn.functional.conv2d(
        torch.nn.functional.pad(xt, (1, 1, 2, 0)), wt
    )
    out.pow(2).sum().backward()
    np.testing.assert_allclose(
        np.asarray(gx), xt.grad.permute(0, 2, 3, 1).numpy(), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gw), wt.grad.permute(2, 3, 1, 0).numpy(), rtol=2e-4, atol=1e-3
    )


def test_unshifted_conv_matches_same_padding():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 2)), jnp.float32)
    got = conv2d(x, w, shifted=False)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_shifted_maxpool_causal():
    # pooled row R covers input rows (2R-1, 2R): first affected R = ceil(r0/2);
    # the bottom input row is cropped by the shift and must have no effect.
    causal_rows_ok(
        shifted_maxpool_2x2, (1, 16, 16, 3),
        first_out_row=lambda r0: (r0 + 1) // 2, dropped_rows=(15,), seed=6,
    )


def test_shifted_maxpool_windows():
    # pooled row R must cover input rows (2R-1, 2R); width pools (2c, 2c+1)
    x = np.full((1, 6, 4, 1), -100.0, np.float32)
    x[0, 2, 0, 0] = 5.0  # should land in pooled row ceil(2/2)=1? -> rows(1,2)->R=1
    y = np.asarray(shifted_maxpool_2x2(jnp.asarray(x)))
    assert y.shape == (1, 3, 2, 1)
    assert y[0, 1, 0, 0] == 5.0
    assert y[0, 0, 0, 0] == -100.0  # row 0 pools rows (-inf pad, 0)


def test_upsample_causal_composition():
    def pool_up(x):
        return upsample_2x_nearest(shifted_maxpool_2x2(x))

    causal_rows_ok(
        pool_up, (1, 16, 16, 2),
        first_out_row=lambda r0: r0, dropped_rows=(15,), seed=7,
    )


def test_upsample_values():
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 2, 2, 1)
    y = np.asarray(upsample_2x_nearest(x))[0, :, :, 0]
    np.testing.assert_array_equal(
        y, [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]]
    )


def test_rot90_matches_numpy():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 5, 5, 3)).astype(np.float32)
    for k in range(-4, 5):
        got = np.asarray(rot90(jnp.asarray(x), k))
        ref = np.rot90(x, k, axes=(1, 2))
        np.testing.assert_array_equal(got, ref)


def test_rotation_roundtrip():
    rng = np.random.default_rng(9)
    x = rng.standard_normal((3, 8, 8, 4)).astype(np.float32)
    stacked = rotation_stack(jnp.asarray(x))
    assert stacked.shape == (12, 8, 8, 4)
    un = np.asarray(rotation_unstack(stacked))
    assert un.shape == (3, 8, 8, 16)
    for k in range(4):
        np.testing.assert_array_equal(un[..., k * 4 : (k + 1) * 4], x)


def test_rotation_stack_rejects_nonsquare():
    with pytest.raises(ValueError):
        rotation_stack(jnp.zeros((1, 4, 6, 1)))
