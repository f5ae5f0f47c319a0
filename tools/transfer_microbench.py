"""Host->device transfer microbench (VERDICT r4 weak #1 / next #1).

The round-4 sustained-vs-resident gap (1856 vs 2955 patches/s) was
*attributed* to axon-tunnel transfer jitter from window variance alone.
This tool measures the attribution directly, per stage:

  sample    — C++/python patch-sampler latency for one batch (no JAX)
  put       — jax.device_put latency distribution for the same-shaped
              uint8 batch (the Prefetcher's transform), serial
  put_kx    — K concurrent device_put threads: per-transfer latency and
              aggregate batches/sec (does concurrency absorb jitter?)
  overlap   — device_put latency while the chip is busy running the
              train step (does transfer overlap compute on this
              platform, or serialize behind it?)

Usage: python tools/transfer_microbench.py [--batch 384] [--n 120]
Prints ONE JSON line with all distributions (p10/p50/p90/p99/max).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def dist(xs):
    xs = np.asarray(sorted(xs))
    q = lambda p: float(np.quantile(xs, p))
    return {
        "n": len(xs),
        "p10_ms": round(q(0.10) * 1e3, 2),
        "p50_ms": round(q(0.50) * 1e3, 2),
        "p90_ms": round(q(0.90) * 1e3, 2),
        "p99_ms": round(q(0.99) * 1e3, 2),
        "max_ms": round(float(xs[-1]) * 1e3, 2),
        "mean_ms": round(float(xs.mean()) * 1e3, 2),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=384)
    p.add_argument("--patch", type=int, default=64)
    p.add_argument("--n", type=int, default=120)
    p.add_argument("--threads", type=int, nargs="*", default=[2, 4])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    shape = (args.batch, args.patch, args.patch, 3)
    nbytes = int(np.prod(shape))
    rng = np.random.default_rng(0)
    # distinct host buffers so no caching layer can alias transfers
    bufs = [rng.integers(0, 256, shape, dtype=np.uint8) for _ in range(8)]
    out = {"batch_shape": list(shape), "mb": round(nbytes / 1e6, 2)}

    # --- stage: sampler (host only) ------------------------------------
    from ssdn_tpu.data import open_dataset
    from ssdn_tpu.native import make_sampler

    ds = open_dataset("synthetic:256:256")
    sampler = make_sampler(ds, args.patch, args.batch, seed=0)
    ts = []
    for s in range(min(args.n, 60)):
        t0 = time.perf_counter()
        sampler.sample(s)
        ts.append(time.perf_counter() - t0)
    out["sample"] = dist(ts)

    # --- stage: serial device_put --------------------------------------
    def put_one(i):
        t0 = time.perf_counter()
        x = jax.device_put(bufs[i % len(bufs)], dev)
        x.block_until_ready()
        # On axon, block_until_ready can return at enqueue; a value fetch
        # is the only true barrier (README measurement note).
        _ = np.asarray(jax.tree.leaves(x)[0].ravel()[0])
        return time.perf_counter() - t0

    put_one(0)  # warm any lazy init
    out["put_serial"] = dist([put_one(i) for i in range(args.n)])

    # --- stage: K concurrent device_put threads ------------------------
    for k in args.threads:
        lat, lock = [], threading.Lock()
        per = max(args.n // k, 10)

        def worker():
            ls = [put_one(i) for i in range(per)]
            with lock:
                lat.extend(ls)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=worker) for _ in range(k)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        d = dist(lat)
        d["agg_batches_per_sec"] = round(k * per / wall, 1)
        out[f"put_{k}x"] = d

    # --- stage: device_put while the chip runs train steps -------------
    from ssdn_tpu.config import ModelConfig, TrainConfig, parse_noise_style
    from ssdn_tpu.train.step import init_state, make_train_step

    cfg = TrainConfig(noise=parse_noise_style("gauss25"),
                      model=ModelConfig(in_channels=3),
                      patch_size=args.patch, batch_size=args.batch,
                      iterations=10_000)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    state = init_state(cfg)
    dev_batch = jnp.asarray(bufs[0])
    for _ in range(3):
        state, m = step(state, dev_batch)
    float(m["loss"])
    # time n steps with no transfers (baseline step time)
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, dev_batch)
    float(m["loss"])
    step_ms = (time.perf_counter() - t0) / 10 * 1e3
    out["step_ms"] = round(step_ms, 2)

    stop = threading.Event()
    lat = []

    def putter():
        i = 0
        while not stop.is_set():
            lat.append(put_one(i))
            i += 1

    th = threading.Thread(target=putter)
    th.start()
    t0 = time.perf_counter()
    for _ in range(40):
        state, m = step(state, dev_batch)
    float(m["loss"])
    busy_wall = time.perf_counter() - t0
    stop.set()
    th.join()
    out["overlap"] = {
        "step_ms_while_transferring": round(busy_wall / 40 * 1e3, 2),
        "put_while_busy": dist(lat) if lat else None,
    }

    print(json.dumps({"metric": "transfer_microbench", **out}))


if __name__ == "__main__":
    main()
