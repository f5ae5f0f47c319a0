"""Full-image inference and PSNR evaluation (SURVEY.md §3.2).

Eval flow per reference ``evaluate.py`` [R]: load clean eval image, inject
noise at the eval setting (deterministic per-image key), pad to meet the
U-Net's stride-32 divisibility (and squareness, for the rotation fold),
forward once — the four rotated branches ARE the "4-rotation ensembling"
[B config 5] — take the Bayesian posterior mean, crop, PSNR vs clean.

Jitted denoise programs are cached per (shape, dtype); eval sets with one
image geometry (Kodak 768x512, BSD68 481x321) compile once.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssdn_tpu import estimator
from ssdn_tpu.config import NoiseConfig, Pipeline, TrainConfig
from ssdn_tpu.models import blindspot_unet
from ssdn_tpu.noise import add_noise
from ssdn_tpu.train.step import pipeline_blindspot
from ssdn_tpu.utils.images import pad_to_multiple, psnr, to_internal


def make_denoise_fn(cfg: TrainConfig):
    """Jitted (params, noisy_batch, noise_param_vec) -> denoised, specialized
    per input shape via jit's shape cache."""
    blindspot = pipeline_blindspot(cfg.pipeline)
    compute_dtype = jnp.dtype(cfg.model.compute_dtype)

    @jax.jit
    def denoise(params, y, sigma_or_param):
        out = blindspot_unet.apply(
            params, y, blindspot=blindspot, compute_dtype=compute_dtype,
            conv_backend=cfg.model.conv_backend,
            conv_precision=cfg.model.conv_precision,
            decoder_mode=cfg.model.decoder_mode,
            head_backend=cfg.model.head_backend,
        )
        if cfg.pipeline == Pipeline.SSDN:
            noise_params = runtime_noise_params(cfg.noise, params,
                                                sigma_or_param)
            return estimator.posterior_mean(out, y, cfg.noise, noise_params,
                                            bound=cfg.bound_outputs)
        c = y.shape[-1]
        return estimator.mu_only(out, c)

    return denoise


def _noise_param_dict(noise: NoiseConfig, vec):
    from ssdn_tpu.config import NoiseModel

    if noise.model == NoiseModel.GAUSSIAN:
        return {"sigma": vec}
    if noise.model == NoiseModel.POISSON:
        return {"lam": vec}
    return {"alpha": vec}


def runtime_noise_params(noise: NoiseConfig, params, vec):
    """Estimator noise_params for inference: the CLI/true param vec, plus —
    for BLIND_CONST models — the learned free scalar from the checkpointed
    params (which the estimator reads instead of the vec)."""
    from ssdn_tpu.config import NoiseValue

    d = _noise_param_dict(noise, vec)
    if noise.value == NoiseValue.BLIND_CONST:
        d["raw_scale"] = params["noise_scalar"]["raw"]
    return d


def _true_param(noise: NoiseConfig, injected: Dict) -> jax.Array:
    from ssdn_tpu.config import NoiseModel

    if noise.model == NoiseModel.GAUSSIAN:
        return injected["sigma"]
    if noise.model == NoiseModel.POISSON:
        return injected["lam"]
    return injected["alpha"]


def denoise_image(
    denoise_fn,
    params,
    noisy: np.ndarray,
    noise_param,
    *,
    square: bool = False,
) -> np.ndarray:
    """Denoise one full-resolution image (H, W, C float32 internal range).

    Pads (reflect) to stride-32 divisibility, runs the jitted program, crops
    back. square=True additionally pads to a square (only needed to force
    the single-4x-batch rotation fold; the model handles non-square natively).
    """
    padded, (h, w) = pad_to_multiple(noisy, blindspot_unet.STRIDE, square=square)
    y = jnp.asarray(padded)[None]
    out = denoise_fn(params, y, noise_param)
    return np.asarray(out)[0, :h, :w]


def evaluate_dataset(
    cfg: TrainConfig,
    params,
    dataset,
    *,
    eval_noise: Optional[NoiseConfig] = None,
    seed: int = 0x5EED,
    mode: str = "full",
    mesh=None,
    halo: int = 320,
    tile_w: int = 512,
    return_images: int = 0,
    eval_batch: int = 1,
) -> Dict:
    """Reference evaluate.py flow over a dataset: returns mean/per-image
    PSNR of the denoised estimates plus the noisy-input baseline PSNR.

    mode: "full" (whole image at once), "sharded" (tiled over a device
    mesh with halo exchange, [B] config 5) or "sequential" (overlap tiles
    looped on one device).

    eval_batch > 1 (mode "full" only) groups same-shaped images into one
    forward — identical per-image math (every op is batch-independent and
    the noise key is per-image), but a single full-image forward is
    latency-bound on TPU so batching raises eval throughput. With a mesh,
    the batch additionally shards over the data axis (data-parallel eval:
    each chip denoises different images; GSPMD partitions the same jitted
    program from the input sharding alone)."""
    noise = eval_noise or cfg.noise
    if getattr(dataset, "streaming", False):
        raise ValueError(
            "evaluation needs a finite dataset; 'synthetic:inf' is for "
            "training — use 'synthetic:N[:size]' for eval"
        )
    # API misuse guards (ADVICE r2): these combinations would otherwise
    # silently fall back to serial single-image eval
    if eval_batch > 1 and mode != "full":
        raise ValueError(
            f"eval_batch={eval_batch} requires mode='full' (got {mode!r}); "
            "tiled modes process one image at a time"
        )
    if mesh is not None and mode == "full" and eval_batch <= 1:
        raise ValueError(
            "a mesh with mode='full' needs eval_batch > 1 (data-parallel "
            "eval shards the image batch); pass eval_batch=len(devices)"
        )
    denoise_fn = make_denoise_fn(cfg) if mode == "full" else None
    if mesh is not None and mode != "full":
        # hoist the params broadcast out of the per-image loop (the tiled
        # entry points would otherwise re-transfer per image)
        from ssdn_tpu.infer.tiled import _replicate_params

        params = _replicate_params(params, mesh)
    n = len(dataset)
    psnrs: List[Optional[float]] = [None] * n
    noisy_psnrs: List[Optional[float]] = [None] * n
    images: Dict[int, Dict] = {}

    def handle_one(i, clean, y_np, den):
        psnrs[i] = psnr(den, clean)
        noisy_psnrs[i] = psnr(y_np, clean)
        if i < return_images:
            images[i] = {"noisy": y_np, "denoised": den, "clean": clean}

    def noisy_for(i, clean):
        key = jax.random.fold_in(jax.random.key(seed), i)
        y, injected = add_noise(key, jnp.asarray(clean)[None], noise)
        # KNOWN: the true injected parameter feeds the estimator; BLIND:
        # the estimator reads its own estimate and ignores this value
        return np.asarray(y)[0], _true_param(noise, injected)

    if mode == "full" and eval_batch > 1:
        n_dev = mesh.devices.size if mesh is not None else 1
        if mesh is not None:
            from ssdn_tpu import parallel

            params = jax.device_put(params, parallel.replicated(mesh))

        def flush(chunk):
            """chunk: list of (i, clean); one batched forward."""
            ys, ps = zip(*(noisy_for(i, c) for i, c in chunk))
            padded = [pad_to_multiple(y, blindspot_unet.STRIDE) for y in ys]
            stack = [p[0] for p in padded]
            pv = [np.asarray(p).reshape(-1) for p in ps]
            # pad the chunk to a device multiple (duplicates dropped)
            while len(stack) % n_dev:
                stack.append(stack[-1])
                pv.append(pv[-1])
            batch = jnp.asarray(np.stack(stack))
            pvec = jnp.asarray(np.concatenate(pv))
            if mesh is not None:
                from ssdn_tpu import parallel

                sh = parallel.batch_sharded(mesh, mesh.axis_names[0])
                batch = jax.device_put(batch, sh)
                pvec = jax.device_put(pvec, sh)
            out = np.asarray(denoise_fn(params, batch, pvec))
            for k, (i, clean) in enumerate(chunk):
                h, w = padded[k][1]
                handle_one(i, clean, ys[k], out[k, :h, :w])

        # stream the dataset: buffer per shape, flush full chunks — host
        # memory stays O(#shapes * eval_batch images), not O(dataset)
        pending: Dict[tuple, list] = {}
        for i in range(n):
            clean = to_internal(dataset[i])
            buf = pending.setdefault(clean.shape, [])
            buf.append((i, clean))
            if len(buf) == eval_batch:
                flush(buf)
                buf.clear()
        for buf in pending.values():
            if buf:
                flush(buf)
    else:
        for i in range(n):
            clean = to_internal(dataset[i])
            y_np, param = noisy_for(i, clean)
            if mode == "full":
                den = denoise_image(denoise_fn, params, y_np, param)
            elif mode in ("sharded", "sharded-window"):
                from ssdn_tpu.infer.tiled import tiled_denoise_sharded

                strategy = "window" if mode == "sharded-window" else "auto"
                den = tiled_denoise_sharded(cfg, params, y_np, param, mesh,
                                            halo=halo, strategy=strategy)
            elif mode == "sequential":
                from ssdn_tpu.infer.tiled import tiled_denoise_sequential

                den = tiled_denoise_sequential(cfg, params, y_np, param,
                                               tile_w=tile_w, halo=halo)
            else:
                raise ValueError(mode)
            handle_one(i, clean, y_np, den)
    out = {
        "psnr_mean": float(np.mean(psnrs)),
        "psnr_per_image": psnrs,
        "noisy_psnr_mean": float(np.mean(noisy_psnrs)),
        "n_images": n,
    }
    if return_images:
        out["images"] = [images[i] for i in sorted(images)]
    return out
