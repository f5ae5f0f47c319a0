"""Host-sustained vs resident-batch training throughput (VERDICT r3 item 5).

Measures BOTH numbers in one session on the same chip:
  resident  — `bench.main()`'s jitted step on a device-resident batch
              (the headline `bench.py` number),
  sustained — the real `Trainer` loop at the same config (C++ patch
              sampler -> threaded prefetch/device_put -> step), from the
              steady-state `patches_per_sec` windows of metrics.jsonl.

Usage:  python tools/sustained_bench.py [--steps 300] [--corpus synthetic:256:256]
Prints ONE JSON line {"resident", "sustained", "ratio", ...}.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--corpus", default="synthetic:256:256")
    p.add_argument("--workdir", default="/tmp/sustained_bench")
    p.add_argument("--prefetch-threads", type=int, default=4,
                   help="concurrent sample+device_put workers (Trainer "
                        "default 4; probe higher values for tunnel-jitter "
                        "headroom)")
    p.add_argument("--prefetch-depth", type=int, default=12)
    args = p.parse_args()

    import bench
    from ssdn_tpu.cli.train import main as train_main

    # resident-batch headline (prints its own JSON line; capture it)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    resident = json.loads(buf.getvalue().strip().splitlines()[-1])["value"]
    print(f"# resident-batch: {resident} patches/s", flush=True)

    shutil.rmtree(args.workdir, ignore_errors=True)
    train_main([
        "--workdir", args.workdir, "--train-data", args.corpus,
        "--eval-data", "synthetic:4", "--noise-style", "gauss25",
        "--batch-size", "384", "--patch-size", "64",
        "--iterations", str(args.steps), "--eval-interval", "0",
        "--snapshot-interval", str(args.steps),
        "--log-interval", "25", "--seed", "0",
        "--prefetch-threads", str(args.prefetch_threads),
        "--prefetch-depth", str(args.prefetch_depth),
    ])
    windows = []
    with open(os.path.join(args.workdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "patches_per_sec" in rec:
                windows.append(rec["patches_per_sec"])
    # drop the compile window(s): first two log windows
    steady = sorted(windows[2:])
    sustained = steady[len(steady) // 2] if steady else 0.0
    print(json.dumps({
        "metric": "ssdn_train_throughput_sustained_vs_resident",
        "resident": round(resident, 1),
        "sustained": round(sustained, 1),
        "ratio": round(sustained / resident, 4) if resident else None,
        "unit": "patches/sec/chip (64x64 RGB, batch 384)",
        "prefetch_threads": args.prefetch_threads,
        "prefetch_depth": args.prefetch_depth,
        "windows": [round(w, 1) for w in windows],
    }))


if __name__ == "__main__":
    main()
