"""Fused 1x1 combiner head as a single Pallas kernel (VERDICT r2 item 1:
multi-op stage fusion with VMEM-resident activations).

Replaces the lax tail of ``blindspot_unet.apply``:

    f   = concat(lrelu(x_0) .. lrelu(x_{k-1}), channels)
    h1  = lrelu(f  @ Wa + ba)     # (M, 384) -> (M, 384)
    h2  = lrelu(h1 @ Wb + bb)     # (M, 384) -> (M, 96)
    out = h2 @ Wc + bc            # (M, 96)  -> (M, n_out)  fp32

The xs are the PRE-activation dec1b outputs: LeakyReLU is elementwise so
it commutes with the derotation permutation, and absorbing it here removes
the full-resolution activation op AND its backward compare/select pass
(measured 7.25 ms/step in the r3 profile) — the backward kernel recomputes
the mask from the xs tiles it already reads.

with one kernel per M-tile. The channel concat never materializes (each
branch tensor is its own kernel operand; Wa is split into per-branch row
blocks, so concat+matmul becomes a sum of matmuls), h2 lives only in VMEM,
bias + LeakyReLU ride the matmul epilogues, and the fp32 output needs no
separate convert pass. The backward kernel recomputes h2 from the saved h1
tile (cheap vs. storing it) and produces per-branch dx plus all weight/
bias grads in one pass, accumulating weight grads in VMEM across the
(sequential) TPU grid.

Why this shape of kernel can win where single-conv kernels lost (round-2
finding): these are pure pixelwise matmuls with K, N in {96, 384} — full
MXU lane occupancy, no conv geometry for Mosaic to mis-tile — and the win
comes from eliminating the inter-op HBM round-trips (concat, h2, LeakyReLU
backward masks, bwd concat-slicing), not from beating XLA's matmul itself.

Differentially tested against the lax composition (fwd + grads) in
tests/test_nin_head.py (interpret mode in CI, compiled on the chip via
tests/test_pallas_tpu.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLOPE = 0.1

# Interpreter-mode switch for CPU/CI differential tests (jax.custom_vjp
# does not take keyword or extra static args cleanly).
INTERPRET = False


def _lrelu(x):
    # the compare runs in fp32: Mosaic rejects bf16 vector cmpf
    # ("Target does not support this comparison")
    return jnp.where(_nonneg(x), x, SLOPE * x)


def _nonneg(x):
    return x.astype(jnp.float32) >= 0


def _pick_tile(m: int) -> int:
    # 2048 rows: ~9 MB live VMEM with double-buffered row blocks (tm=4096
    # OOMed the 16 MB scoped-vmem limit on v5e — do not re-add it)
    for tm in (2048, 1024, 512, 256):
        if m % tm == 0:
            return tm
    return 0


def nin_head_supported(m: int) -> bool:
    return _pick_tile(m) > 0


# ------------------------------ forward ------------------------------


def _make_fwd_kernel(k: int, save_h1: bool):
    def kernel(*refs):
        x_refs = refs[:k]
        wa_refs = refs[k:2 * k]
        if save_h1:
            (ba_ref, wb_ref, bb_ref, wc_ref, bc_ref,
             out_ref, h1_ref) = refs[2 * k:]
        else:
            ba_ref, wb_ref, bb_ref, wc_ref, bc_ref, out_ref = refs[2 * k:]
        dt = x_refs[0].dtype
        acc = jnp.dot(_lrelu(x_refs[0][:]), wa_refs[0][:],
                      preferred_element_type=jnp.float32)
        for i in range(1, k):
            acc += jnp.dot(_lrelu(x_refs[i][:]), wa_refs[i][:],
                           preferred_element_type=jnp.float32)
        h1 = _lrelu(acc + ba_ref[:].astype(jnp.float32)).astype(dt)
        if save_h1:
            h1_ref[:] = h1
        h2 = _lrelu(
            jnp.dot(h1, wb_ref[:], preferred_element_type=jnp.float32)
            + bb_ref[:].astype(jnp.float32)
        ).astype(dt)
        out_ref[:] = (
            jnp.dot(h2, wc_ref[:], preferred_element_type=jnp.float32)
            + bc_ref[:].astype(jnp.float32)
        )

    return kernel


def _fwd_call(xs, was, ba, wb, bb, wc, bc, *, tm: int, interpret: bool,
              save_h1: bool = True):
    """save_h1=False is the no-grad/inference variant: XLA cannot DCE one
    output of a custom call, so the primal must not allocate the (M, Na)
    residual only the VJP needs (at full-image eval that is ~100s of MB of
    HBM writes per forward)."""
    k = len(xs)
    m = xs[0].shape[0]
    na, nb, nc = was[0].shape[1], wb.shape[1], wc.shape[1]
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    in_specs = (
        [pl.BlockSpec((tm, x.shape[1]), row, memory_space=pltpu.VMEM)
         for x in xs]
        + [pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM)
           for w in was]
        + [
            pl.BlockSpec((1, na), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((na, nb), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nc), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc), const, memory_space=pltpu.VMEM),
        ]
    )
    out_specs = [pl.BlockSpec((tm, nc), row, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((m, nc), jnp.float32)]
    if save_h1:
        out_specs.append(pl.BlockSpec((tm, na), row,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((m, na), xs[0].dtype))
    outs = pl.pallas_call(
        _make_fwd_kernel(k, save_h1),
        grid=(m // tm,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*xs, *was, ba, wb, bb, wc, bc)
    return (outs[0], outs[1]) if save_h1 else (outs[0], None)


# ------------------------------ backward ------------------------------


def _make_bwd_kernel(k: int):
    def kernel(*refs):
        x_refs = refs[:k]
        wa_refs = refs[k:2 * k]
        h1_ref, wb_ref, bb_ref, wc_ref, g_ref = refs[2 * k:2 * k + 5]
        outs = refs[2 * k + 5:]
        dx_refs = outs[:k]
        dwa_refs = outs[k:2 * k]
        dba_ref, dwb_ref, dbb_ref, dwc_ref, dbc_ref = outs[2 * k:]

        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            for r in (*dwa_refs, dba_ref, dwb_ref, dbb_ref, dwc_ref,
                      dbc_ref):
                r[:] = jnp.zeros_like(r)

        h1 = h1_ref[:]
        dt = h1.dtype
        g = g_ref[:]
        g_lp = g.astype(dt)

        # recompute h2 (lrelu preserves sign, so the saved post-activation
        # h1 carries the exact mask information for layer a, and pre2's
        # sign gives layer b's mask)
        pre2 = (
            jnp.dot(h1, wb_ref[:], preferred_element_type=jnp.float32)
            + bb_ref[:].astype(jnp.float32)
        )
        h2 = _lrelu(pre2).astype(dt)

        # --- layer c ---
        dwc_ref[:] += jax.lax.dot_general(
            h2, g_lp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbc_ref[:] += jnp.sum(g, axis=0, keepdims=True)
        dh2 = jnp.dot(g_lp, wc_ref[:].T, preferred_element_type=jnp.float32)

        dpre2 = jnp.where(pre2 >= 0, dh2, SLOPE * dh2).astype(dt)

        # --- layer b ---
        dwb_ref[:] += jax.lax.dot_general(
            h1, dpre2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbb_ref[:] += jnp.sum(dpre2.astype(jnp.float32), axis=0,
                              keepdims=True)
        dh1 = jnp.dot(dpre2, wb_ref[:].T, preferred_element_type=jnp.float32)

        dpre1 = jnp.where(_nonneg(h1), dh1, SLOPE * dh1).astype(dt)

        # --- layer a, per branch (input lrelu absorbed: activation and
        # mask both recomputed from the pre-activation tile) ---
        dba_ref[:] += jnp.sum(dpre1.astype(jnp.float32), axis=0,
                              keepdims=True)
        for i in range(k):
            xi = x_refs[i][:]
            dwa_refs[i][:] += jax.lax.dot_general(
                _lrelu(xi), dpre1, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dxi = jnp.dot(
                dpre1, wa_refs[i][:].T, preferred_element_type=jnp.float32
            )
            dx_refs[i][:] = jnp.where(_nonneg(xi), dxi,
                                      SLOPE * dxi).astype(dt)

    return kernel


def _bwd_call(xs, was, h1, wb, bb, wc, g, *, tm: int, interpret: bool):
    k = len(xs)
    m = xs[0].shape[0]
    na, nb, nc = was[0].shape[1], wb.shape[1], wc.shape[1]
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    in_specs = (
        [pl.BlockSpec((tm, x.shape[1]), row, memory_space=pltpu.VMEM)
         for x in xs]
        + [pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM)
           for w in was]
        + [
            pl.BlockSpec((tm, na), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((na, nb), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nc), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, nc), row, memory_space=pltpu.VMEM),
        ]
    )
    out_specs = (
        tuple(pl.BlockSpec((tm, x.shape[1]), row, memory_space=pltpu.VMEM)
              for x in xs)
        + tuple(pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM)
                for w in was)
        + (
            pl.BlockSpec((1, na), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((na, nb), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nc), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc), const, memory_space=pltpu.VMEM),
        )
    )
    out_shape = (
        tuple(jax.ShapeDtypeStruct(x.shape, x.dtype) for x in xs)
        + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in was)
        + (
            jax.ShapeDtypeStruct((1, na), jnp.float32),
            jax.ShapeDtypeStruct((na, nb), jnp.float32),
            jax.ShapeDtypeStruct((1, nb), jnp.float32),
            jax.ShapeDtypeStruct((nb, nc), jnp.float32),
            jax.ShapeDtypeStruct((1, nc), jnp.float32),
        )
    )
    return pl.pallas_call(
        _make_bwd_kernel(k),
        grid=(m // tm,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*xs, *was, h1, wb, bb, wc, g)


# ------------------------------ public op ------------------------------


@jax.custom_vjp
def fused_nin_head(xs, was, ba, wb, bb, wc, bc):
    """lrelu(lrelu(concat(xs)@concat(was)+ba)@wb+bb)@wc+bc -> (M, n) fp32.

    xs: tuple of 1..4 (M, Ck) tensors (bf16/f32) — the derotated branch
    outputs, channel-concat NOT materialized; was: matching tuple of
    (Ck, Na) weight row-blocks in xs dtype; ba/bb/bc fp32; wb (Na, Nb) and
    wc (Nb, Nc) in xs dtype. M must satisfy nin_head_supported.
    """
    out, _ = _fwd_call(
        tuple(xs), tuple(was), ba.reshape(1, -1), wb, bb.reshape(1, -1),
        wc, bc.reshape(1, -1), tm=_pick_tile(xs[0].shape[0]),
        interpret=INTERPRET, save_h1=False,
    )
    return out


def _head_fwd(xs, was, ba, wb, bb, wc, bc):
    out, h1 = _fwd_call(
        tuple(xs), tuple(was), ba.reshape(1, -1), wb, bb.reshape(1, -1),
        wc, bc.reshape(1, -1), tm=_pick_tile(xs[0].shape[0]),
        interpret=INTERPRET,
    )
    return out, (tuple(xs), tuple(was), h1, wb, bb, wc)


def _head_bwd(res, g):
    xs, was, h1, wb, bb, wc = res
    # the bwd kernel holds ~2x the live intermediates (dh1/dpre1 chains);
    # half the fwd tile keeps it under the 16 MB scoped-vmem limit
    outs = _bwd_call(
        xs, was, h1, wb, bb.reshape(1, -1), wc, g,
        tm=max(_pick_tile(xs[0].shape[0]) // 2, 256), interpret=INTERPRET,
    )
    k = len(xs)
    dxs = outs[:k]
    dwas = tuple(d.astype(w.dtype) for d, w in zip(outs[k:2 * k], was))
    dba, dwb, dbb, dwc, dbc = outs[2 * k:]
    return (
        tuple(dxs),
        dwas,
        dba.reshape(-1),
        dwb.astype(wb.dtype),
        dbb.reshape(-1),
        dwc.astype(wc.dtype),
        dbc.reshape(-1),
    )


fused_nin_head.defvjp(_head_fwd, _head_bwd)


def lax_reference(xs, was, ba, wb, bb, wc, bc) -> jax.Array:
    """The unfused composition (differential-test oracle; mirrors the
    model's lax tail including the fp32 final accumulation). xs are
    pre-activations — the input lrelu is part of the op contract."""
    x = _lrelu(jnp.concatenate(list(xs), axis=-1))
    wa = jnp.concatenate(list(was), axis=0)
    h1 = _lrelu(jnp.dot(x, wa) + ba.astype(x.dtype))
    h2 = _lrelu(jnp.dot(h1, wb) + bb.astype(x.dtype))
    return (
        jnp.dot(h2, wc, preferred_element_type=jnp.float32)
        + bc.astype(jnp.float32)
    )
