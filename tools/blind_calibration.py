"""Blind noise-parameter calibration sweep (VERDICT r3 missing #5; [P]
§3.1's estimation-accuracy claim): feed a variable-blind model images
corrupted at KNOWN parameter values across its trained range and report
estimate-vs-truth per value, plus the denoised PSNR.

Usage:
  python tools/blind_calibration.py WORKDIR_OR_PRETRAINED \
      [--values 5,15,25,40,50] [--images 8] [--size 128] [--seed 7]

Values are in the noise style's native units (sigma/alpha in 0-255-percent
units like the CLI styles: gauss sigma 5..50, impulse alpha percent;
poisson lambda is the event count).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model", help="training workdir or pretrained name/.npz")
    p.add_argument("--values", default=None,
                   help="comma list of true parameter values to sweep")
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--json-out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssdn_tpu.config import NoiseModel, NoiseValue
    from ssdn_tpu.data import open_dataset
    from ssdn_tpu.estimator import posterior_mean
    from ssdn_tpu.estimator.core import _ALPHA_HI, _ALPHA_LO, estimate_sigma
    from ssdn_tpu.models import blindspot_unet
    from ssdn_tpu.noise import add_noise
    from ssdn_tpu.train.step import pipeline_blindspot
    from ssdn_tpu.utils.images import psnr, to_internal

    import dataclasses
    import os

    if os.path.isdir(args.model):
        from ssdn_tpu.train.loop import load_config
        from ssdn_tpu.train.step import init_state

        cfg = load_config(args.model)
        ns = argparse.Namespace(workdir=args.model, which="auto",
                                pretrained=None)
        from ssdn_tpu.cli.evaluate import _restore

        params = _restore(ns, cfg, init_state(cfg)).params
        step = "workdir"
    else:
        from ssdn_tpu import zoo

        cfg, params, meta = zoo.load(args.model)
        step = meta.get("step", "?")
    if cfg.noise.value != NoiseValue.BLIND:
        raise SystemExit(f"model is {cfg.noise.value}, need variable-blind")

    model = cfg.noise.model
    if args.values:
        values = [float(v) for v in args.values.split(",")]
    else:
        values = {
            NoiseModel.GAUSSIAN: [5, 15, 25, 40, 50],
            NoiseModel.POISSON: [5, 15, 30, 40, 50],
            NoiseModel.IMPULSE: [30, 40, 50, 60],
        }[model]

    # clean eval images from the deterministic procedural corpus
    ds = open_dataset(f"synthetic:{args.images}:{args.size}",
                      grayscale=cfg.grayscale)
    cleans = [to_internal(ds[i]) for i in range(len(ds))]

    c = cleans[0].shape[-1]
    t = c * (c + 1) // 2

    @jax.jit
    def forward(params, y):
        return blindspot_unet.apply(
            params, y, blindspot=pipeline_blindspot(cfg.pipeline),
            compute_dtype=jnp.dtype(cfg.model.compute_dtype),
            conv_backend=cfg.model.conv_backend,
            conv_precision=cfg.model.conv_precision,
            decoder_mode=cfg.model.decoder_mode,
            head_backend=cfg.model.head_backend,
        )

    def estimates(out):
        """(B,) native-unit estimates from the blind channel."""
        ch = out[..., c + t]
        if model == NoiseModel.GAUSSIAN:
            return np.asarray(estimate_sigma(ch)) * 255.0
        if model == NoiseModel.POISSON:
            s = np.asarray(estimate_sigma(ch))
            return 0.5 / (s ** 2 + 1e-8)
        m = np.asarray(jnp.mean(jax.nn.sigmoid(ch), axis=(1, 2)))
        return (_ALPHA_LO + (_ALPHA_HI - _ALPHA_LO) * m) * 100.0

    rows = []
    for v in values:
        # fix the parameter by collapsing the config's range to [v, v]
        # (sigma_min/max are in 0..255 units; alpha styles are percent)
        if model == NoiseModel.GAUSSIAN:
            fixed = dataclasses.replace(cfg.noise, sigma_min=v, sigma_max=v)
        elif model == NoiseModel.POISSON:
            fixed = dataclasses.replace(cfg.noise, lam=v, lam_max=None)
        else:
            fixed = dataclasses.replace(cfg.noise, alpha=v / 100,
                                        alpha_max=None)
        ests, psnrs = [], []
        for i, clean in enumerate(cleans):
            key = jax.random.fold_in(jax.random.key(args.seed), i)
            y, _ = add_noise(key, jnp.asarray(clean)[None], fixed)
            out = forward(params, y)
            ests.append(float(estimates(out)[0]))
            den = posterior_mean(out, y, cfg.noise,
                                 {"sigma": 0.0, "lam": 1.0, "alpha": 0.5},
                                 bound=cfg.bound_outputs)
            psnrs.append(psnr(np.asarray(den)[0], clean))
        rows.append({
            "true": v,
            "est_mean": round(float(np.mean(ests)), 3),
            "est_std": round(float(np.std(ests)), 3),
            "psnr": round(float(np.mean(psnrs)), 3),
        })

    unit = {NoiseModel.GAUSSIAN: "sigma (0-255)",
            NoiseModel.POISSON: "lambda",
            NoiseModel.IMPULSE: "alpha %"}[model]
    print(f"model: {args.model} (step {step}), noise {cfg.noise.describe()}")
    print(f"| true {unit} | estimate (mean ± std, {args.images} images) "
          f"| denoised PSNR |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['true']:g} | {r['est_mean']:.2f} ± {r['est_std']:.2f} "
              f"| {r['psnr']:.2f} dB |")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
