"""Shifted ("causal-upward") spatial ops — the blind-spot building blocks.

The reference realizes Laine et al.'s receptive-field restriction with
pad-shift-crop convolutions (`ShiftConv2d`/`Crop2d` [R], SURVEY.md §2.4):
every op here preserves the invariant

    output at row r depends only on input rows <= r.

TPU-first design decisions (vs. the reference's separate pad -> conv -> crop
modules): the shift is folded into the convolution itself as *asymmetric
padding* of `lax.conv_general_dilated`, so XLA lowers one conv onto the MXU
with no materialized pad/crop; layout is NHWC (TPU-native); accumulation is
fp32 via `preferred_element_type` even when activations are bf16.

All functions are pure and jit-safe (static shapes only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def leaky_relu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    """LeakyReLU(0.1) used after every conv except the final 1x1 [P][N2N]."""
    return jnp.where(x >= 0, x, negative_slope * x)


def shift_down(x: jax.Array, rows: int = 1) -> jax.Array:
    """Move content down `rows` pixels: out[:, r] = x[:, r - rows] (zero fill).

    Used (a) to offset the max-pool windows and (b) as the final +1px shift
    that turns "rows <= r" into "rows < r", creating the blind spot
    (SURVEY.md §2.4).
    """
    if rows == 0:
        return x
    pad = [(0, 0), (rows, 0), (0, 0), (0, 0)]
    return jnp.pad(x, pad)[:, : x.shape[1], :, :]


def _resolve_precision(dtype, precision):
    """fp32 inputs pin true-fp32 conv math (XLA's default silently
    downgrades fp32 convs to bf16-class); precision tiers only apply to
    fp32. Returns (preferred_element_type, lax.Precision)."""
    if dtype == jnp.float32:
        if precision is None:
            precision = lax.Precision.HIGHEST
        elif isinstance(precision, str):
            precision = {
                "default": lax.Precision.DEFAULT,
                "high": lax.Precision.HIGH,
                "highest": lax.Precision.HIGHEST,
            }[precision]
        return jnp.float32, precision
    return None, None if isinstance(precision, str) else precision


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    shifted: bool = False,
    down_shift: int = 0,
    out_dtype: jnp.dtype | None = None,
    precision: lax.Precision | str | None = None,
) -> jax.Array:
    """2-D conv, NHWC x HWIO -> NHWC, SAME width padding, fp32 accumulation.

    shifted=True applies the pad-shift-crop trick in-conv: for a KhxKw kernel
    the height padding becomes (Kh - 1, 0) instead of SAME, so output row r
    reads input rows r-(Kh-1) .. r — only rows <= r. Equivalent to the
    reference's pad-top / conv / crop-bottom pipeline but fused into a single
    XLA convolution.

    down_shift=k (shifted only) additionally folds shift_down(out, k) into
    the SAME convolution via asymmetric padding (Kh-1+k, -k) — XLA supports
    negative window padding, so the blind-spot's final +1 px shift costs
    nothing instead of a full-tensor pad+slice (measured ~2 ms/step on the
    r3 profile, ops/rotation.py cluster).

    Precision contract: fp32 inputs compute in true fp32 (XLA's default
    silently downgrades fp32 convs to bf16-class math). bf16 inputs take the
    fast MXU path — the MXU accumulates in fp32 internally and rounds the
    output to bf16; requesting an fp32 output via preferred_element_type
    instead breaks autodiff (the transposed conv in the VJP then mixes
    bf16 weights with fp32 cotangents).
    """
    preferred, precision = _resolve_precision(x.dtype, precision)
    kh, kw = w.shape[0], w.shape[1]
    if shifted:
        hpad = (kh - 1 + down_shift, -down_shift)
    else:
        if down_shift:
            raise ValueError("down_shift requires shifted=True")
        hpad = ((kh - 1) // 2, kh // 2)
    wpad = ((kw - 1) // 2, kw // 2)
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=(hpad, wpad),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=preferred,
        precision=precision,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    if down_shift:
        # shift_down zero-fills the top rows AFTER bias; the folded conv
        # would leave `b` there. A (1,H,1,1) mask multiply fuses into the
        # conv epilogue (vs the full-tensor pad+slice being replaced).
        row = jnp.arange(out.shape[1], dtype=jnp.int32)[None, :, None, None]
        out = out * (row >= down_shift).astype(out.dtype)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def shifted_maxpool_2x2(x: jax.Array) -> jax.Array:
    """2x2/2 max-pool with the one-row downward offset.

    A plain 2x2 pool lets pooled row R (covering input rows 2R, 2R+1) leak
    row-(r+1) information into output row r after upsampling. Shifting the
    input down one row first makes pooled row R cover rows (2R-1, 2R), so
    every upsampled row r still only sees rows <= r (SURVEY.md §2.4).

    Padding value is -inf so the virtual row never wins the max.
    """
    neg = jnp.asarray(-jnp.inf, x.dtype)
    x = jnp.pad(x, [(0, 0), (1, 0), (0, 0), (0, 0)], constant_values=neg)
    x = x[:, : x.shape[1] - 1, :, :]
    return maxpool_2x2(x)


@jax.custom_vjp
def matmul_acc_f32(x: jax.Array, w: jax.Array) -> jax.Array:
    """(..., K) @ (K, N) -> fp32, with low-precision (e.g. bf16) operands
    and fp32 MXU accumulation.

    Exists because plain `preferred_element_type=f32` on bf16 operands
    breaks reverse-mode autodiff (the transposed op mixes an fp32 cotangent
    with bf16 weights). The custom VJP casts cotangents back to the operand
    dtype and accumulates dw in fp32 — the standard mixed-precision recipe.
    Used for the final 1x1 head conv so mu/Sigma leave the network in fp32.
    """
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _mm_fwd(x, w):
    return matmul_acc_f32(x, w), (x, w)


def _mm_bwd(res, g):
    x, w = res
    gl = g.astype(x.dtype)
    dx = jnp.dot(gl, w.T.astype(x.dtype))
    k = x.shape[-1]
    dw = jnp.dot(
        x.reshape(-1, k).T,
        gl.reshape(-1, g.shape[-1]),
        preferred_element_type=jnp.float32,
    )
    return dx, dw


matmul_acc_f32.defvjp(_mm_fwd, _mm_bwd)


def _collapse_upsample_kernel(w_up: jax.Array) -> jax.Array:
    """Collapse a 3x3 kernel meant for nearest-2x-upsampled input into the
    equivalent (2, 3, Cin, 4*Cout) coarse-resolution kernel.

    Derivation (shifted geometry: out[R, C] = sum_{i,j} u[R-2+i, C-1+j] W[i,j]
    with u[Y, X] = h[Y//2, X//2]). Writing R = 2r+pr, C = 2c+pc, each fine
    output phase (pr, pc) reads a 2x2 window of h whose effective weights are
    sums of the original taps:

        rows  (offset r-1+a):  pr=0: a=0 <- W[0]+W[1], a=1 <- W[2]
                               pr=1: a=0 <- W[0],      a=1 <- W[1]+W[2]
        cols  (offset c-1+b):  pc=0: b=0 <- W[:,0], b=1 <- W[:,1]+W[:,2], b=2 <- 0
                               pc=1: b=0 <- 0, b=1 <- W[:,0]+W[:,1], b=2 <- W[:,2]

    Stacking the four phases along output channels gives one dense 2x3 conv
    at coarse resolution: 4/9 of the fine-resolution MACs and a 4*Cout lane
    dimension that fills the 128-wide MXU (SURVEY.md §2.2; the fine-res
    original runs 96-out-channel convs at 75% lane fill).
    """
    # row collapse: (3, ...) -> (pr, a, ...)
    r0 = jnp.stack([w_up[0] + w_up[1], w_up[2]])          # pr=0: (a, 3, Ci, Co)
    r1 = jnp.stack([w_up[0], w_up[1] + w_up[2]])          # pr=1
    rows = jnp.stack([r0, r1])                            # (pr, a, 3, Ci, Co)
    # col collapse: (..., 3, Ci, Co) -> (pc, ..., b, Ci, Co)
    z = jnp.zeros_like(rows[:, :, 0])
    c0 = jnp.stack([rows[:, :, 0], rows[:, :, 1] + rows[:, :, 2], z], axis=2)
    c1 = jnp.stack([z, rows[:, :, 0] + rows[:, :, 1], rows[:, :, 2]], axis=2)
    wc = jnp.stack([c0, c1])                              # (pc, pr, a, b, Ci, Co)
    # -> (a, b, Ci, pr, pc, Co) -> (2, 3, Ci, 4*Co)
    wc = jnp.transpose(wc, (2, 3, 4, 1, 0, 5))
    a, b, ci, pr, pc, co = wc.shape
    return wc.reshape(a, b, ci, pr * pc * co)


def _transposed_upsample_kernel(w_up: jax.Array) -> jax.Array:
    """Remap the collapsed phase kernel into the (4, 6, Cin, Cout) kernel of
    an equivalent stride-2 transposed conv (lhs_dilation=2, padding
    ((3, 1), (3, 3))).

    The transposed conv computes out[R, C] = sum_kh,kw
    h_dilated[R - 3 + kh, C - 3 + kw] * Wt[kh, kw] with h at even positions;
    writing R = 2r + pr recovers each phase's 2x2 collapsed window at
    kh = 2a + 3 - ... : (pr=0, a) -> kh in {1, 3}; (pr=1, a) -> {0, 2};
    (pc=0, b) -> kw in {1, 3, 5}; (pc=1, b) -> {0, 2, 4}. Distinct taps per
    phase, so one dense kernel serves all four phases. XLA's TPU lowering
    phase-decomposes lhs-dilated convs internally — measured faster than
    materializing the depth-to-space interleave (no layout copies) and than
    the literal upsample+concat path.
    """
    kc = _collapse_upsample_kernel(w_up)  # (2, 3, Ci, 4*Co), phases (pr,pc)
    ci, co = w_up.shape[2], w_up.shape[3]
    kc = kc.reshape(2, 3, ci, 2, 2, co)   # (a, b, Ci, pr, pc, Co)
    rows = []
    for kh in range(4):
        pr, a = {0: (1, 0), 1: (0, 0), 2: (1, 1), 3: (0, 1)}[kh]
        cols = []
        for kw in range(6):
            pc, b = (1, kw // 2) if kw % 2 == 0 else (0, kw // 2)
            cols.append(kc[a, b, :, pr, pc, :])
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # (4, 6, Ci, Co)


def shifted_upsample_concat_conv(
    h: jax.Array,
    skip: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    out_dtype: jnp.dtype | None = None,
    precision: lax.Precision | str | None = None,
) -> jax.Array:
    """conv2d(concat([upsample_2x_nearest(h), skip], -1), w, b, shifted=True)
    computed exactly, without materializing the upsample or the concat.

    h: (N, Hc, Wc, Cup) coarse features; skip: (N, 2Hc, 2Wc, Cskip);
    w: (3, 3, Cup + Cskip, Cout) — the SAME parameters as the unfused path
    (split internally), so checkpoints are interchangeable between paths.

    The upsampled part runs as one coarse-resolution 2x3 conv with 4*Cout
    output channels (see _collapse_upsample_kernel) followed by a
    depth-to-space interleave; the skip part is a standard fine-resolution
    shifted conv. Both accumulate into the same output. This is the TPU-first
    rewrite of the reference's upsample->concat->conv decoder stages [R]
    (SURVEY.md §2.4): ~0.67x the MACs at ~100% MXU lane fill for the
    dominant branch.
    """
    cup = h.shape[-1]
    w_up = w[:, :, :cup, :]
    w_skip = w[:, :, cup:, :]
    wt = _transposed_upsample_kernel(w_up)

    preferred, prec = _resolve_precision(h.dtype, precision)

    up_part = lax.conv_general_dilated(
        h,
        wt.astype(h.dtype),
        window_strides=(1, 1),
        padding=((3, 1), (3, 3)),
        lhs_dilation=(2, 2),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=preferred,
        precision=prec,
    )  # (N, 2*Hc, 2*Wc, Cout), phases interleaved in place

    skip_part = conv2d(
        skip.astype(h.dtype), w_skip, None, shifted=True,
        out_dtype=None, precision=precision,
    )
    out = up_part + skip_part
    if b is not None:
        out = out + b.astype(out.dtype)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def maxpool_2x2(x: jax.Array) -> jax.Array:
    """2x2/2 max-pool via lax.reduce_window (TPU pooling custom-call; its
    reverse-mode select_and_scatter is hardware-lowered too). Measured
    r3 on-chip vs the old reshape-max formulation: 148.7 -> 135.8 ms/step
    on the bench config — the reshape-max's 5-D temps forced bad tilings
    and a compare/broadcast backward chain. Literal -inf init is required
    (a traced init value kills the autodiff rule). Unshifted form is the
    baseline U-Net path (N2C/N2N)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def upsample_2x_nearest(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample. Output row r reads pooled row floor(r/2),
    which covers input rows <= r under the shifted pool — no extra shift
    needed (SURVEY.md §2.4)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
