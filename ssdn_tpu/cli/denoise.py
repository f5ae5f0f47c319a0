"""Denoise real images with a trained checkpoint.

The reference's evaluate.py only scores synthetic-noise PSNR against clean
images (SURVEY.md §3.2); this is the production counterpart: the inputs are
treated as ALREADY-NOISY photographs, denoised with the model's Bayesian
posterior mean, and written back out.

Examples:
  # gaussian model, noise level known (sigma in 0..255 units)
  python -m ssdn_tpu.cli.denoise --workdir /tmp/run \
      --input noisy_photos/ --output denoised/ --param 25

  # blind model (network estimates the noise level itself)
  python -m ssdn_tpu.cli.denoise --workdir /tmp/blindrun \
      --input shot.png --output out/

  # bounded-memory tiling for huge scans
  python -m ssdn_tpu.cli.denoise ... --tiled sequential --tile-w 512
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ssdn_tpu.config import NoiseModel


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default=None,
                   help="training workdir containing config.json and ckpt/")
    p.add_argument("--pretrained", default=None,
                   help="bundled pretrained model name (see "
                        "ssdn_tpu.zoo.available()) or an exported .npz "
                        "path — denoise without a training workdir")
    p.add_argument("--input", required=True,
                   help="a noisy image file or a folder of them")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--param", type=float, default=None,
                   help="noise parameter for KNOWN-noise models: gaussian "
                        "sigma in 0..255 units / poisson lambda / impulse "
                        "alpha (default: the training config's value); "
                        "ignored by BLIND models, which estimate it")
    p.add_argument("--which", default="auto",
                   choices=["auto", "best", "latest"])
    p.add_argument("--tiled", default="full",
                   choices=["full", "sequential", "sharded"],
                   help="'sequential' bounds memory on one device; "
                        "'sharded' spreads W-strips over all devices")
    p.add_argument("--halo", type=int, default=320)
    p.add_argument("--tile-w", type=int, default=512)
    p.add_argument("--suffix", default="_denoised",
                   help="appended to each output filename stem")
    return p


def default_param(cfg) -> float:
    n = cfg.noise
    if n.model == NoiseModel.GAUSSIAN:
        return 0.5 * (n.sigma_min + n.sigma_max)
    if n.model == NoiseModel.POISSON:
        return n.lam
    return n.alpha


def to_internal_param(cfg, value: float) -> np.ndarray:
    """CLI-unit noise parameter -> the estimator's internal vector (the
    same convention the injector records: gaussian sigma is stored in the
    [0,1] image range)."""
    if cfg.noise.model == NoiseModel.GAUSSIAN:
        value = value / 255.0
    return np.full((1,), value, np.float32)


def main(argv=None) -> None:
    import jax.numpy as jnp

    from ssdn_tpu.cli.evaluate import _load_model
    from ssdn_tpu.infer import denoise_image, make_denoise_fn
    from ssdn_tpu.utils import list_images, load_image, save_image
    from ssdn_tpu.utils.images import to_internal

    args = build_parser().parse_args(argv)
    cfg, params, step = _load_model(args)
    print(f"checkpoint step: {step}")
    print(f"noise model:     {cfg.noise.describe()}")

    if os.path.isdir(args.input):
        paths = list_images(args.input)
    else:
        paths = [args.input]
    if not paths:
        raise FileNotFoundError(f"no images under {args.input!r}")
    value = args.param if args.param is not None else default_param(cfg)
    param = jnp.asarray(to_internal_param(cfg, value))

    fn = make_denoise_fn(cfg) if args.tiled == "full" else None
    mesh = None
    if args.tiled == "sharded":
        from ssdn_tpu import parallel

        mesh = parallel.make_mesh(axis=parallel.TILE_AXIS)
    os.makedirs(args.output, exist_ok=True)
    emitted = set()
    for path in paths:
        noisy = to_internal(load_image(path, grayscale=cfg.grayscale))
        if args.tiled == "full":
            den = denoise_image(fn, params, noisy, param)
        elif args.tiled == "sequential":
            from ssdn_tpu.infer.tiled import tiled_denoise_sequential

            den = tiled_denoise_sequential(cfg, params, noisy, param,
                                           tile_w=args.tile_w,
                                           halo=args.halo)
        else:
            from ssdn_tpu.infer.tiled import tiled_denoise_sharded

            den = tiled_denoise_sharded(cfg, params, noisy, param,
                                        mesh, halo=args.halo)
        stem, ext = os.path.splitext(os.path.basename(path))
        out_path = os.path.join(args.output, f"{stem}{args.suffix}.png")
        if out_path in emitted:
            # img.png and img.jpg in one input folder must not overwrite
            # each other's output (ADVICE r2): uniquify with the original
            # extension. Keyed on outputs written THIS run — an
            # os.path.exists check would treat a previous run's file as a
            # collision and silently redirect the re-run's fresh result
            # away from the canonical path.
            out_path = os.path.join(
                args.output, f"{stem}_{ext.lstrip('.')}{args.suffix}.png"
            )
        emitted.add(out_path)
        save_image(out_path, den)
        print(f"  {path} -> {out_path} ({den.shape[1]}x{den.shape[0]})")


if __name__ == "__main__":
    main()
