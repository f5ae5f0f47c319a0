"""Pallas TPU kernel: fused shifted 3x3 conv + bias + LeakyReLU.

STATUS (measured rounds 2-3, unchanged round 4): this kernel is correct,
custom-VJP'd, and differentially gated on-chip, but it is NOT the
production hot path — `bench.py ab` measures the full train step at
lax 2818 vs pallas 571 patches/s. The best Mosaic conv formulation
reached 39 TF/s against XLA's 107 on the same shape because Mosaic
rejects the lane-dim concat/reshape the faster formulations need
(README "throughput campaign" for the full closure). It ships as
(a) the flag-selectable `conv_backend="pallas"` alternate backend,
(b) the differential-test reference for the fused multi-op head kernel
(ops/pallas/nin_head.py), and (c) the ready vehicle if a future Mosaic
lifts the lane-dim restriction. The [B] target it was built for —
"four 90-degree-rotated input branches fused into one batched Pallas
conv path"; SURVEY.md §2.2 table row 1 — is met for correctness (the
four branches are batch-folded by the model, so one kernel instance
sees the whole (4B, H, W, C) tensor) but not for speed; the default
conv backend stays lax/XLA.

Formulation: a 3x3 conv is nine shifted (H*W, Cin) x (Cin, Cout) matmuls
accumulated in fp32 — tap-accumulation keeps everything MXU-shaped without
materializing an im2col buffer. The pad-shift-crop ("causal up") geometry is
baked into the XLA pre-pad (top 2 rows / symmetric width) so the kernel body
is shift-agnostic. Bias add + LeakyReLU fuse into the epilogue.

Grid: one program per batch element; the padded image block, the weights,
and the fp32 accumulator all live in VMEM (fine for training patches).
Images whose per-program footprint would exceed the VMEM budget dispatch
to the lax fallback (_VMEM_BUDGET below) — e.g. full-resolution Kodak
eval with 96-channel activations, which would fail Mosaic compilation.

Backward: custom_vjp. dx is the mirrored transposed conv, dw a per-tap
contraction — both expressed as XLA convs/dots, which the TPU compiler
already emits optimally; the LeakyReLU mask is recovered from the output's
sign (leaky_relu preserves sign), so no extra residuals are stored.

Differential tests vs the lax path: tests/test_pallas.py.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# Per-program VMEM budget for the single-batch-element grid: padded input
# block + fp32 accumulator + output block must fit comfortably inside the
# 16 MiB default scoped-vmem allowance (measured limit on v5e; exceeding
# it is a Mosaic compile error, not a slow path).
_VMEM_BUDGET = 12 * 1024 * 1024


def _vmem_bytes(h, width, cin, cout, in_dtype, out_dtype) -> int:
    inp = (h + 2) * (width + 2) * cin * jnp.dtype(in_dtype).itemsize
    acc = h * width * cout * 4
    out = h * width * cout * jnp.dtype(out_dtype).itemsize
    return inp + acc + out


def _kernel(x_ref, w_ref, b_ref, out_ref, *, H, W, Cin, Cout, slope):
    import jax.experimental.pallas as pl  # noqa: F401  (imported for clarity)

    acc = jnp.zeros((H * W, Cout), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            window = x_ref[0, dh : dh + H, dw : dw + W, :]
            lhs = window.reshape(H * W, Cin)
            acc += jnp.dot(
                lhs, w_ref[dh, dw], preferred_element_type=jnp.float32
            )
    acc += b_ref[:].astype(jnp.float32)
    acc = jnp.where(acc >= 0, acc, slope * acc)
    out_ref[0] = acc.reshape(H, W, Cout).astype(out_ref.dtype)


def shifted_conv3x3_bias_act(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    negative_slope: float = 0.1,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Fused causal-up 3x3 conv + bias + LeakyReLU via Pallas.

    x: (N, H, W, Cin); w: (3, 3, Cin, Cout) (HWIO); b: (Cout,).
    Equivalent to ops.leaky_relu(ops.conv2d(x, w, b, shifted=True)).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic kernels only compile for TPU; anywhere else (CPU tests, the
    # 8-device virtual mesh) fall back to the interpreter automatically.
    # Check the device platform, not jax.default_backend(): the remote-TPU
    # plugin registers under its own backend name ("axon") while its
    # devices still report platform "tpu".
    interpret = interpret or jax.devices()[0].platform != "tpu"
    n, h, width, cin = x.shape
    cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    if _vmem_bytes(h, width, cin, cout, x.dtype, out_dtype) > _VMEM_BUDGET:
        # per-program block would not fit VMEM (large inference images):
        # take the lax path, which tiles freely (ADVICE r1)
        return _fwd_lax(x, w, b, negative_slope, out_dtype)
    # shift geometry: top pad 2 / bottom 0 (causal up), symmetric width
    xpad = jnp.pad(x, [(0, 0), (2, 0), (1, 1), (0, 0)])

    kern = functools.partial(
        _kernel, H=h, W=width, Cin=cin, Cout=cout, slope=negative_slope
    )
    flops = 2 * n * h * width * 9 * cin * cout
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, h + 2, width + 2, cin),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, width, cout), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, width, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xpad.size * xpad.dtype.itemsize
            + w.size * w.dtype.itemsize
            + n * h * width * cout * np.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xpad, w.astype(x.dtype), b)


def _fwd_lax(x, w, b, negative_slope, out_dtype):
    """Reference composition on the lax path (also the fallback)."""
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        (1, 1),
        ((2, 0), (1, 1)),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    out = out + b.astype(out.dtype)
    out = jnp.where(out >= 0, out, negative_slope * out)
    return out.astype(out_dtype or x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_shifted_conv(x, w, b, negative_slope=0.1, out_dtype=None,
                       interpret=False):
    """Differentiable fused shifted-conv3x3 + bias + LeakyReLU (Pallas fwd,
    XLA-conv bwd)."""
    return shifted_conv3x3_bias_act(
        x, w, b, negative_slope=negative_slope, out_dtype=out_dtype,
        interpret=interpret,
    )


def _fused_fwd(x, w, b, negative_slope, out_dtype, interpret):
    out = shifted_conv3x3_bias_act(
        x, w, b, negative_slope=negative_slope, out_dtype=out_dtype,
        interpret=interpret,
    )
    return out, (x, w, out)


def _fused_bwd(negative_slope, out_dtype, interpret, res, g):
    x, w, out = res
    g = g.astype(jnp.float32)
    # LeakyReLU mask from the output's sign (leaky preserves sign).
    # signbit, not `out >= 0`: a negative pre-activation that rounds to
    # -0.0 in bf16 satisfies -0.0 >= 0 and would take the wrong branch
    # (ADVICE r1); signbit(-0.0) is True, matching the forward's slope side
    # up to the measure-zero exact-0 boundary where both branches agree.
    dpre = jnp.where(jnp.signbit(out), negative_slope * g, g)
    dpre = dpre.astype(x.dtype)
    # dx: correlate grads with 180-degree-rotated, IO-transposed weights and
    # the mirrored shift (forward out row r reads in rows r-2..r, so in row
    # r feeds out rows r..r+2 -> pad bottom 2)
    w_rot = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3).astype(x.dtype)
    dx = lax.conv_general_dilated(
        dpre, w_rot, (1, 1), ((0, 2), (1, 1)),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # dw[dh, dw']: contraction of the padded input window with dpre
    xpad = jnp.pad(x, [(0, 0), (2, 0), (1, 1), (0, 0)])
    n, h, width, _ = x.shape
    taps = []
    for dh in range(3):
        row = []
        for dwi in range(3):
            win = lax.dynamic_slice(
                xpad, (0, dh, dwi, 0), (n, h, width, x.shape[-1])
            )
            row.append(
                lax.dot_general(
                    win, dpre,
                    ((((0, 1, 2), (0, 1, 2))), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps).astype(w.dtype)
    db = jnp.sum(dpre.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw, db


fused_shifted_conv.defvjp(_fused_fwd, _fused_bwd)
