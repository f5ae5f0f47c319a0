"""Round-4 inference-throughput campaign (VERDICT r3 item 1).

Sweeps the three knobs `bench.bench_inference` exposes — eval batch,
square-fold vs non-square two-trunk fold, lax vs no-grad fused Pallas
head — on the real chip, and writes every measured point plus the best
configuration to BENCH_DETAIL_r4.json at the repo root.

Usage:  python tools/inference_campaign.py [--out BENCH_DETAIL_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_inference  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL_r4.json"))
    p.add_argument("--batches", default="8,16,32,64")
    args = p.parse_args()

    points = []

    def run(batch, square, head):
        try:
            mps = bench_inference(batch, square=square, head_backend=head,
                                  quiet=True)
        except Exception as e:  # HBM OOM at large batches is a data point
            pt = {"batch": batch, "square_fold": square,
                  "head_backend": head, "mps": None,
                  "error": type(e).__name__}
            print(json.dumps(pt), flush=True)
            points.append(pt)
            return 0.0
        pt = {"batch": batch, "square_fold": square, "head_backend": head,
              "mps": round(mps, 2)}
        print(json.dumps(pt), flush=True)
        points.append(pt)
        return mps

    def ok(ps):
        return [p for p in ps if p["mps"]]

    batches = [int(b) for b in args.batches.split(",")]
    # stage 1: batch sweep at default knobs
    for b in batches:
        run(b, False, "lax")
    best_b = max(ok(points), key=lambda p: p["mps"])["batch"]
    # stage 2: square-fold A/B at the best batch
    run(best_b, True, "lax")
    # stage 3: no-grad fused Pallas head A/B at the best (batch, fold)
    best_fold = max(ok(points), key=lambda p: p["mps"])
    run(best_fold["batch"], best_fold["square_fold"], "pallas")

    best = max(ok(points), key=lambda p: p["mps"])
    out = {
        "metric": "ssdn_inference_throughput",
        "unit": "megapixels/sec (768x512 RGB full-image posterior mean)",
        "value": best["mps"],
        "vs_baseline": round(best["mps"] / 2.0, 3),
        "best_config": best,
        "campaign_points": points,
        "round": 4,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
