"""Per-level halo exchange: exact sharded tiled inference at real image
sizes (SURVEY.md §5.7 option (a); [B] config 5 "halo exchange across tiles").

The clamped-window modes in ``infer/tiled.py`` ship a 320-column halo in ONE
exchange before the forward, so they only beat gather-the-whole-image when
the image is wider than ``n * 2 * 320`` px — Kodak/BSD68/Set14 never are
(VERDICT r3 missing #4). This module exchanges context *inside* the trunk
instead: a <=2-column halo per convolution at that convolution's resolution,
so every device computes a strip-sized window at every level and per-device
input stays ~strip + 2 columns regardless of image width. Communication is
~60 one-hop `ppermute` messages of a few KB each — noise on ICI.

Design (one jitted shard_map program over the ``tile`` axis):

  * The image's W axis is sharded into ``n`` strips. Each rotated branch's
    input is assembled shard-locally: rot180/rot90 of a W-sharded image is
    (local rotation) + (device-order reversal), so one reversal `ppermute`
    plus local `rot90` produces all four branch strips — no gather.
  * Branches rot0/rot180 run the trunk in **W-mode**: the sharded axis is
    the tensor's W, so each 3x3 conv needs a 1-column halo per side
    (symmetric). Pool/upsample windows are 32-aligned and never cross
    shards; the causal (H) axis is local.
  * Branches rot90/rot270 run in **H-mode**: the sharded axis is the
    tensor's causal H axis, so each conv needs 2 rows from the lower-index
    neighbor only (the shifted conv reads rows <= r), the offset pool needs
    1 row, and the final blind-spot shift needs 1 row. Communication is
    one-directional — causality made physical.
  * `ppermute` delivers zeros to devices with no source, which IS the zero
    padding of the untiled conv at the true image edge; only the offset
    pool's -inf fill needs an explicit edge fix.
  * Both modes batch their two branches into one trunk call (the same
    two-call structure as the non-square fold in models/blindspot_unet.py).
  * The 1x1 head and the posterior mean are pixel-local. Blind noise
    estimates are *image-global* spatial means, so the per-strip means are
    `pmean`'d over the mesh axis before the estimator runs — bit-matching
    the untiled estimate (strips are equal width, so the mean of per-strip
    means is the image mean).

The trunk here is the literal pool(lrelu(conv)) / upsample->concat->conv
program: at eval-time strip sizes the fused-decoder rewrite buys nothing,
and the literal form keeps every halo a 3x3 conv's. Exactness vs the
untiled forward is pinned by tests/test_halo.py on a 768-px-wide image
over 8 virtual devices — the Kodak shape where the old exchange mode
degenerated to all_gather.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssdn_tpu import estimator
from ssdn_tpu.config import NoiseModel, NoiseValue, Pipeline, TrainConfig
from ssdn_tpu.estimator.core import _ALPHA_HI, _ALPHA_LO
from ssdn_tpu.infer.full import runtime_noise_params
from ssdn_tpu.models.blindspot_unet import STRIDE
from ssdn_tpu.ops import leaky_relu, rot90, upsample_2x_nearest
from ssdn_tpu.ops.shifted import (
    _resolve_precision,
    matmul_acc_f32,
    maxpool_2x2,
)


def _fwd(n):  # to higher device index; device 0 receives zeros (image edge)
    return [(i, i + 1) for i in range(n - 1)]


def _bwd(n):  # to lower device index; device n-1 receives zeros
    return [(i + 1, i) for i in range(n - 1)]


def _rev(n):  # device-order reversal (rotated-branch strip assembly)
    return [(i, n - 1 - i) for i in range(n)]


def _conv(x, w, b, hpad, wpad, precision):
    """3x3 conv with explicit padding (halos already materialized on the
    sharded axis); dtype/precision contract identical to ops.conv2d."""
    preferred, prec = _resolve_precision(x.dtype, precision)
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), (hpad, wpad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred, precision=prec,
    )
    return out + b.astype(out.dtype)


def _branch_w(params, x, axis, n, precision):
    """Trunk in W-mode: sharded axis = tensor W. Each conv swaps one
    column per side; everything else is local."""

    def conv(name, h):
        p = params[name]
        left = lax.ppermute(h[:, :, -1:], axis, _fwd(n))
        right = lax.ppermute(h[:, :, :1], axis, _bwd(n))
        he = jnp.concatenate([left, h, right], axis=2)
        return leaky_relu(_conv(he, p["w"], p["b"], (2, 0), (0, 0), precision))

    def pool(h):
        # offset pool along the LOCAL causal axis; W windows are 2-aligned
        # inside the 32-multiple strip, so no W halo is needed
        neg = jnp.asarray(-jnp.inf, h.dtype)
        h = jnp.pad(h, [(0, 0), (1, 0), (0, 0), (0, 0)], constant_values=neg)
        return maxpool_2x2(h[:, :-1])

    return _trunk(params, x, conv, pool)


def _branch_h(params, x, axis, n, precision):
    """Trunk in H-mode: sharded axis = tensor H = the causal axis. Convs
    pull 2 rows, the offset pool 1 row, from the lower-index neighbor only."""

    def conv(name, h):
        p = params[name]
        if h.shape[1] >= 2:
            top = lax.ppermute(h[:, -2:], axis, _fwd(n))
        else:
            # deepest level with strip == STRIDE: local H is 1, so the
            # 2-row history spans TWO neighbors — fetch the second row
            # with a 2-hop ppermute (devices 0/1 get zeros = image edge)
            near = lax.ppermute(h[:, -1:], axis, _fwd(n))
            far = lax.ppermute(h[:, -1:], axis,
                               [(i, i + 2) for i in range(n - 2)])
            top = jnp.concatenate([far, near], axis=1)
        he = jnp.concatenate([top, h], axis=1)
        return leaky_relu(_conv(he, p["w"], p["b"], (0, 0), (1, 1), precision))

    idx = lax.axis_index(axis)

    def pool(h):
        top = lax.ppermute(h[:, -1:], axis, _fwd(n))
        # the untiled offset pool's virtual row is -inf; ppermute's edge
        # fill is zeros, which could wrongly win the max over negative
        # activations — fix device 0 explicitly
        top = jnp.where(idx == 0, jnp.asarray(-jnp.inf, h.dtype), top)
        he = jnp.concatenate([top, h[:, :-1]], axis=1)
        return maxpool_2x2(he)

    return _trunk(params, x, conv, pool)


def _trunk(params, x, conv, pool):
    """Shared literal U-Net program over mode-specific conv/pool."""
    skips = [x]
    h = pool(conv("enc1", conv("enc0", x)))
    skips.append(h)
    for i in (2, 3, 4):
        h = pool(conv(f"enc{i}", h))
        skips.append(h)
    h = pool(conv("enc5", h))
    h = conv("enc6", h)
    for stage, skip in zip((5, 4, 3, 2, 1), reversed(skips)):
        h = upsample_2x_nearest(h)
        h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
        h = conv(f"dec{stage}a", h)
        h = conv(f"dec{stage}b", h)
    return h


def _shift_down_h(x, axis, n):
    """Blind-spot +1px shift when the causal axis is sharded: 1 row from
    the lower-index neighbor (zeros at the image edge — shift_down's fill)."""
    top = lax.ppermute(x[:, -1:], axis, _fwd(n))
    return jnp.concatenate([top, x[:, :-1]], axis=1)


def _blind_eval_cfg(noise, out, c, axis):
    """Image-global blind noise estimate under sharding: pmean the
    per-strip spatial mean, then hand the estimator a KNOWN config whose
    parameter is the estimate — the BLIND posterior closed forms are
    exactly the KNOWN ones evaluated at the estimated parameter."""
    t = c * (c + 1) // 2
    noise_ch = out[..., c + t]
    if noise.model == NoiseModel.IMPULSE:
        m = lax.pmean(jnp.mean(jax.nn.sigmoid(noise_ch), axis=(1, 2)), axis)
        alpha = _ALPHA_LO + (_ALPHA_HI - _ALPHA_LO) * m
        return (dataclasses.replace(noise, value=NoiseValue.KNOWN),
                {"alpha": alpha})
    s = lax.pmean(jnp.mean(jax.nn.softplus(noise_ch), axis=(1, 2)), axis)
    if noise.model == NoiseModel.POISSON:
        # var_blind = max(mu+1/2, 1e-3) * 2 s^2 == var_known at lam = 0.5/s^2
        return (dataclasses.replace(noise, value=NoiseValue.KNOWN),
                {"lam": 0.5 / (s * s)})
    return (dataclasses.replace(noise, value=NoiseValue.KNOWN), {"sigma": s})


def perlevel_supported(cfg: TrainConfig) -> bool:
    """The per-level program implements the blind-spot forward on the lax
    backends; other pipelines/backends use the clamped-window modes."""
    return (
        cfg.pipeline in (Pipeline.SSDN, Pipeline.SSDN_MSE)
        and cfg.model.conv_backend == "lax"
        and cfg.model.head_backend == "lax"
    )


@functools.lru_cache(maxsize=8)
def make_per_level_fn(cfg: TrainConfig, mesh: Mesh, axis: str = "tile"):
    """Jitted (params, image[1,H,W,C] sharded on W, noise_vec) -> denoised,
    every device holding one strip end to end."""
    if cfg.pipeline not in (Pipeline.SSDN, Pipeline.SSDN_MSE):
        raise ValueError(
            "per-level halo exchange implements the blind-spot forward; "
            f"pipeline {cfg.pipeline} has no rotated branches — use the "
            "clamped-window modes"
        )
    if cfg.model.conv_backend != "lax" or cfg.model.head_backend != "lax":
        raise ValueError("per-level mode supports the lax backends only")
    n = int(mesh.devices.size)
    compute_dtype = jnp.dtype(cfg.model.compute_dtype)
    precision = cfg.model.conv_precision

    def strip_fn(params, strip, noise_vec):
        x = strip.astype(compute_dtype)
        rev = lax.ppermute(x, axis, _rev(n))
        # branch strips, shard-local (module docstring): W-mode pair
        # (rot0, rot180), H-mode pair (rot90, rot270)
        aw = jnp.concatenate([x, rot90(rev, 2)], axis=0)
        ah = jnp.concatenate([rot90(rev, 1), rot90(x, 3)], axis=0)
        fw = _branch_w(params, aw, axis, n, precision)
        fh = _branch_h(params, ah, axis, n, precision)
        # +1px blind-spot shift in each branch's own frame
        fw = jnp.pad(fw, [(0, 0), (1, 0), (0, 0), (0, 0)])[:, :-1]
        fh = _shift_down_h(fh, axis, n)
        b = strip.shape[0]
        parts = [
            fw[:b],
            lax.ppermute(rot90(fh[:b], -1), axis, _rev(n)),
            lax.ppermute(rot90(fw[b:], 2), axis, _rev(n)),
            rot90(fh[b:], -3),
        ]
        f = jnp.concatenate(parts, axis=-1).astype(compute_dtype)
        # 1x1 head, pixel-local (mirrors models/blindspot_unet.apply)
        f = leaky_relu(_conv(f, params["nin_a"]["w"], params["nin_a"]["b"],
                             (0, 0), (0, 0), precision))
        f = leaky_relu(_conv(f, params["nin_b"]["w"], params["nin_b"]["b"],
                             (0, 0), (0, 0), precision))
        p = params["nin_c"]
        out = matmul_acc_f32(f, p["w"][0, 0].astype(compute_dtype))
        out = out + p["b"].astype(jnp.float32)
        if cfg.pipeline != Pipeline.SSDN:
            return estimator.mu_only(out, strip.shape[-1])
        c = strip.shape[-1]
        if cfg.noise.value == NoiseValue.BLIND:
            noise_cfg, noise_params = _blind_eval_cfg(cfg.noise, out, c, axis)
        else:
            noise_cfg = cfg.noise
            noise_params = runtime_noise_params(cfg.noise, params, noise_vec)
        return estimator.posterior_mean(out, strip.astype(jnp.float32),
                                        noise_cfg, noise_params,
                                        bound=cfg.bound_outputs)

    sharded = jax.shard_map(
        strip_fn,
        mesh=mesh,
        in_specs=(P(), P(None, None, axis, None), P()),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return jax.jit(sharded)


def tiled_denoise_perlevel(
    cfg: TrainConfig,
    params,
    noisy: np.ndarray,
    noise_param,
    mesh: Mesh,
    axis: str = "tile",
) -> np.ndarray:
    """Denoise one (H, W, C) image with per-level halo exchange.

    Padding convention: W pads (reflect) to a multiple of STRIDE * n so
    strips split evenly. Output equals the untiled forward EXACTLY when
    that equals the untiled STRIDE-multiple padding — true for Kodak
    (768 = 32*8*3), BSD68/Set14 at n=8 — and differs only in right-edge
    context (both valid denoisings) when the image is narrower than
    STRIDE * n forces extra pad.
    """
    from ssdn_tpu.utils.images import pad_to_multiple

    from ssdn_tpu.infer.tiled import _replicate_params

    params = _replicate_params(params, mesh)
    n = int(mesh.devices.size)
    padded, (h, w) = pad_to_multiple(noisy, STRIDE, multiple_w=STRIDE * n)
    fn = make_per_level_fn(cfg, mesh, axis)
    y = jax.device_put(
        jnp.asarray(padded)[None],
        NamedSharding(mesh, P(None, None, axis, None)),
    )
    out = np.asarray(fn(params, y, jnp.asarray(noise_param)))[0]
    return out[:h, :w]
