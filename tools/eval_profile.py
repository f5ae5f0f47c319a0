"""Per-op profile + donation A/B of the full-image eval step (VERDICT r4
next #5: give the inference ceiling the training-closure treatment).

Measures, on the Kodak eval shape (768x512 RGB, batch 16):
  donate_ab  — MP/s with and without donating the noisy-image buffer
               (donated arm chains out->in, so the output buffer is
               reused and nothing round-trips the host)
  profile    — one xplane device trace of the eval step; prints the
               top ops by self-time (the per-op accounting the training
               closure used, README round-3 campaign)

Usage: python tools/eval_profile.py [--batch 16] [--top 25]
Prints ONE JSON line at the end.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def top_ops_from_xplane(trace_dir: str, top: int):
    """Parse the newest .xplane.pb under trace_dir -> [(op, total_ms, n)]."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        return None
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    acc = defaultdict(lambda: [0.0, 0])
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id].name
                acc[meta][0] += ev.duration_ps / 1e9  # ps -> ms
                acc[meta][1] += 1
    rows = sorted(acc.items(), key=lambda kv: -kv[1][0])[:top]
    return [{"op": k[:120], "ms": round(v[0], 3), "n": v[1]}
            for k, v in rows]


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ssdn_tpu.config import ModelConfig, TrainConfig, parse_noise_style
    from ssdn_tpu.infer.full import make_denoise_fn
    from ssdn_tpu.models import init_params
    from ssdn_tpu.train.step import pipeline_blindspot

    cfg = TrainConfig(
        noise=parse_noise_style("gauss25"),
        model=ModelConfig(in_channels=3, compute_dtype="bfloat16"),
    )
    params = init_params(jax.random.key(0), 3, 9)
    rng = np.random.default_rng(0)
    B, h, w = args.batch, 512, 768
    y = jnp.asarray(rng.uniform(-0.5, 0.5, (B, h, w, 3)), jnp.float32)
    sigma = jnp.full((B,), 25 / 255, jnp.float32)
    out = {"batch": B, "shape": [h, w]}

    fn = make_denoise_fn(cfg)
    o = fn(params, y, sigma)
    float(o.ravel()[0])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(params, y, sigma)
    float(o.ravel()[0])
    base = n * B * h * w / (time.perf_counter() - t0) / 1e6
    out["mps_plain"] = round(base, 2)

    # donated arm: chain the output back as the next input (same
    # shape/dtype, so XLA can reuse the noisy buffer for the output)
    blindspot = pipeline_blindspot(cfg.pipeline)
    compute_dtype = jnp.dtype(cfg.model.compute_dtype)
    from ssdn_tpu import estimator
    from ssdn_tpu.models import blindspot_unet

    def _denoise(params, yy, s):
        outl = blindspot_unet.apply(
            params, yy, blindspot=blindspot, compute_dtype=compute_dtype)
        return estimator.posterior_mean(outl, yy, cfg.noise, {"sigma": s},
                                        bound=cfg.bound_outputs)

    denoise_nodonate_chain = jax.jit(_denoise)
    denoise_donate = jax.jit(_denoise, donate_argnums=1)

    for name, f in (("chain_nodonate", denoise_nodonate_chain),
                    ("chain_donate", denoise_donate)):
        yy = jnp.asarray(np.asarray(y))
        yy = f(params, yy, sigma)
        float(yy.ravel()[0])
        yy = jnp.asarray(np.asarray(y))
        t0 = time.perf_counter()
        for _ in range(n):
            yy = f(params, yy, sigma)
        float(yy.ravel()[0])
        out[f"mps_{name}"] = round(
            n * B * h * w / (time.perf_counter() - t0) / 1e6, 2)

    # xplane trace of 3 plain eval steps
    trace_dir = tempfile.mkdtemp(prefix="eval_prof_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        o = fn(params, y, sigma)
    float(o.ravel()[0])
    jax.profiler.stop_trace()
    try:
        rows = top_ops_from_xplane(trace_dir, args.top)
    except Exception as e:
        rows = [{"error": str(e)}]
    out["profile_trace_dir"] = trace_dir
    out["top_ops_3steps"] = rows

    print(json.dumps({"metric": "eval_step_profile", **out}))


if __name__ == "__main__":
    main()
