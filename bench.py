"""Headline benchmark: SSDN training throughput in patches/sec/chip
(BASELINE.json "metric") on the flagship config — blind-spot U-Net, RGB
Gaussian sigma=25, 64x64 patches, bf16 conv path, fused on-device
preprocessing — on whatever device JAX reports (the real TPU chip under the
driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline note: the reference repo's own throughput is unpublished and the
mount was empty (SURVEY.md §0, §6); BASELINE.json "published" is {}. The
baseline used here is the paper-era reference setup's commonly-achievable
~1000 patches/sec on a 2019 GPU — an order-of-magnitude anchor only, fixed
so the ratio is comparable across rounds.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_PATCHES_PER_SEC = 1000.0  # order-of-magnitude anchor, see docstring


def bench_inference(batch: int = 16, *, square: bool = False,
                    head_backend: str = "lax", quiet: bool = False) -> float:
    """Secondary headline metric: full-image denoise megapixels/sec
    (Kodak-shaped 768x512 RGB, posterior mean included).
    Run: python bench.py inference [batch] [square] [pallas-head]

    Round-4 campaign knobs (VERDICT r3 item 1): `batch` sweeps the eval
    batch; `square=True` pads the image to 768x768 and uses the one-call
    4x-batch rotation fold instead of the two-call non-square fold (1.5x
    the pixels, half the launches); `head_backend="pallas"` runs the
    no-grad fused 1x1 head kernel. Only the *real* 512x768 pixels count
    toward MP/s in square mode."""
    import jax
    import jax.numpy as jnp

    from ssdn_tpu.config import ModelConfig, TrainConfig, parse_noise_style
    from ssdn_tpu.infer import make_denoise_fn
    from ssdn_tpu.models import init_params

    cfg = TrainConfig(
        noise=parse_noise_style("gauss25"),
        model=ModelConfig(in_channels=3, compute_dtype="bfloat16",
                          head_backend=head_backend),
    )
    params = init_params(jax.random.key(0), 3, 9)
    fn = make_denoise_fn(cfg)
    rng = np.random.default_rng(0)
    B = batch
    h, w = (768, 768) if square else (512, 768)
    y = jnp.asarray(rng.uniform(-0.5, 0.5, (B, h, w, 3)), jnp.float32)
    sigma = jnp.full((B,), 25 / 255, jnp.float32)
    out = fn(params, y, sigma)
    float(out.ravel()[0])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(params, y, sigma)
    float(out.ravel()[0])
    dt = time.perf_counter() - t0
    mps = n * B * (512 * 768) / dt / 1e6
    if not quiet:
        print(
            json.dumps(
                {
                    "metric": "ssdn_inference_throughput",
                    "value": round(mps, 2),
                    "unit": "megapixels/sec (768x512 RGB full-image posterior mean)",
                    "vs_baseline": round(mps / 2.0, 3),  # ~2 MP/s 2019-GPU anchor
                    "config": {"eval_batch": B, "square_fold": square,
                               "head_backend": head_backend},
                }
            )
        )
    return mps


def _pallas_differential_gate() -> None:
    """Run the compiled-kernel differential tests on the chip before any
    A/B that reports a pallas number (VERDICT r2 item 6: a bench must not
    report a backend whose kernel fails its differential). Aborts the
    process on mismatch."""
    import os
    import re
    import subprocess
    import sys

    test_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tests", "test_pallas_tpu.py")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", test_path, "-q",
         "-p", "no:cacheprovider", "--noconftest", "-x"],
        capture_output=True, text=True,
    )
    tail = (r.stdout or "") + (r.stderr or "")
    if r.returncode != 0:
        sys.stderr.write(tail[-2000:])
        raise SystemExit(
            "compiled Pallas kernel failed its differential tests — "
            "refusing to report a pallas bench number"
        )
    m = re.search(r"(\d+) passed", tail)
    if m is None or int(m.group(1)) == 0:
        # Every test skipped (e.g. TPU plugin failed to attach and the
        # requires_tpu guard fired) => the gate proved nothing; a vacuous
        # pass must not authorize a pallas bench number.
        sys.stderr.write(tail[-2000:])
        raise SystemExit(
            "pallas differential gate ran 0 tests (all skipped — no TPU?) "
            "— refusing to report a pallas bench number"
        )
    print("# pallas compiled differential gate: passed", flush=True)


def _time_train_step(cfg, n_warm: int = 4, n_steps: int = 20) -> float:
    """Resident-batch patches/sec for one TrainConfig (value-fetch barrier)."""
    import jax
    import jax.numpy as jnp

    from ssdn_tpu.train.step import init_state, make_train_step

    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    state = init_state(cfg)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.integers(
        0, 256, (cfg.batch_size, cfg.patch_size, cfg.patch_size,
                 cfg.model.in_channels), dtype=np.uint8))
    for _ in range(n_warm):
        state, m = step(state, b)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, b)
    float(m["loss"])
    return n_steps * cfg.batch_size / (time.perf_counter() - t0)


def bench_ab() -> None:
    """A/B the conv backends on the bench training shape (VERDICT r1 item 3:
    record both numbers). Runs the compiled-kernel differential gate first.
    Run: python bench.py ab"""
    from ssdn_tpu.config import ModelConfig, TrainConfig, parse_noise_style

    _pallas_differential_gate()

    out = {}
    for backend in ("lax", "pallas"):
        cfg = TrainConfig(
            noise=parse_noise_style("gauss25"),
            model=ModelConfig(in_channels=3, conv_backend=backend),
            patch_size=64,
            batch_size=128,
            iterations=10_000,
        )
        out[backend] = round(_time_train_step(cfg), 2)
    print(json.dumps({
        "metric": "ssdn_train_throughput_conv_backend_ab",
        "value": out,
        "unit": "patches/sec/chip per conv backend (64x64 RGB)",
        "vs_baseline": round(max(out.values()) / REFERENCE_PATCHES_PER_SEC, 3),
    }))


def bench_train_arms() -> None:
    """Record the training step rate of BOTH objective arms at the headline
    shape (VERDICT r4 next #4): the production default (stabilized, bf16)
    and the reference-parity configuration — `objective=reference` with an
    explicit bf16 dtype, which round 4 measured at full quality parity
    (33.14 vs 33.10 dB at 10k steps) — plus the conservative fp32 resolve
    of `compute_dtype="auto"` under the reference objective.
    Run: python bench.py arms"""
    from ssdn_tpu.config import ModelConfig, TrainConfig, parse_noise_style

    arms = {
        "stabilized_bf16_default": ("stabilized", "auto"),
        "reference_bf16_parity": ("reference", "bfloat16"),
        "reference_fp32_auto": ("reference", "auto"),
    }
    out = {}
    for name, (objective, dtype) in arms.items():
        cfg = TrainConfig(
            noise=parse_noise_style("gauss25"),
            model=ModelConfig(in_channels=3, compute_dtype=dtype),
            objective=objective,
            patch_size=64,
            batch_size=384,
            iterations=10_000,
        )
        out[name] = round(_time_train_step(cfg, n_steps=30), 2)
    print(json.dumps({
        "metric": "ssdn_train_throughput_objective_arms",
        "value": out,
        "unit": "patches/sec/chip (64x64 RGB, batch 384, resident batch)",
        "vs_baseline": round(
            out["reference_bf16_parity"] / REFERENCE_PATCHES_PER_SEC, 3),
    }))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ssdn_tpu import parallel
    from ssdn_tpu.config import ModelConfig, TrainConfig, parse_noise_style
    from ssdn_tpu.train.step import init_state, make_train_step

    batch = 384  # best patches/sec in the measured 8..512 sweep (round 2)
    cfg = TrainConfig(
        noise=parse_noise_style("gauss25"),
        model=ModelConfig(in_channels=3),  # production default numerics
        patch_size=64,
        batch_size=batch,
        iterations=10_000,
    )
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    state = init_state(cfg)
    rng = np.random.default_rng(0)
    batch_u8 = jnp.asarray(
        rng.integers(0, 256, (batch, 64, 64, 3), dtype=np.uint8)
    )

    # warmup (compile) + 3 steps; the barrier must FETCH a value —
    # block_until_ready on the remote-TPU (axon) platform returns once the
    # execution is enqueued through the tunnel, not when it finishes
    for _ in range(4):
        state, metrics = step(state, batch_u8)
    float(metrics["loss"])

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch_u8)
    float(metrics["loss"])  # value fetch = true barrier (chained steps)
    dt = time.perf_counter() - t0

    pps = n_steps * batch / dt
    print(
        json.dumps(
            {
                "metric": "ssdn_train_throughput",
                "value": round(pps, 2),
                "unit": "patches/sec/chip (64x64 RGB, fused step, default numerics)",
                "vs_baseline": round(pps / REFERENCE_PATCHES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    import argparse
    import sys

    # argparse CLI (ADVICE r4: the old positional parsing crashed on
    # `bench.py inference square`). Bare `python bench.py` stays the
    # driver's headline entry. Legacy bare-word flags are accepted.
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", nargs="?", default="train",
                    choices=["train", "inference", "ab", "arms"])
    ap.add_argument("rest", nargs="*",
                    help="inference mode: [batch] [square] [pallas-head]")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--square", action="store_true")
    ap.add_argument("--pallas-head", action="store_true")
    args = ap.parse_args()

    if args.mode == "inference":
        batch = args.batch
        for tok in args.rest:  # legacy positional/bare-word forms
            if tok.isdigit() and batch is None:
                batch = int(tok)
            elif tok == "square":
                args.square = True
            elif tok == "pallas-head":
                args.pallas_head = True
            else:
                ap.error(f"unrecognized inference arg {tok!r}")
        bench_inference(batch if batch is not None else 16,
                        square=args.square,
                        head_backend="pallas" if args.pallas_head else "lax")
    elif args.mode == "ab":
        bench_ab()
    elif args.mode == "arms":
        bench_train_arms()
    else:
        main()
