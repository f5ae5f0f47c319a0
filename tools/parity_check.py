"""Parity measurement: stabilized default arm (bf16, Huber+bounds+beta-NLL)
vs the TRUE reference-objective arm (--objective reference: raw NLL,
unbounded outputs, beta=0, Adam eps 1e-8, fp32/HIGHEST) on identical
data/seeds. Runs both arms via the real CLI on whatever device JAX picks
(TPU under the driver), then prints the PSNR-vs-step table.

Usage: python tools/parity_check.py [steps] [train_spec] [eval_spec]
Defaults: 3000 synthetic:64 synthetic:8; pass e.g.
`python tools/parity_check.py 10000 synthetic:inf:256 synthetic:8` for the
non-memorizable streaming corpus (VERDICT r2 item 3)."""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssdn_tpu.cli.train import main as train_main

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
TRAIN = sys.argv[2] if len(sys.argv) > 2 else "synthetic:64"
EVAL = sys.argv[3] if len(sys.argv) > 3 else "synthetic:8"
EVERY = max(STEPS // 40, 250)
arms = {
    "stabilized_bf16": [],
    "reference_objective": ["--objective", "reference"],
}
table = {}
for name, extra in arms.items():
    wd = f"/tmp/parity_{name}"
    shutil.rmtree(wd, ignore_errors=True)
    print(f"=== arm {name} ===", flush=True)
    train_main([
        "--workdir", wd, "--train-data", TRAIN,
        "--eval-data", EVAL, "--iterations", str(STEPS),
        "--batch-size", "64", "--eval-interval", str(EVERY),
        "--snapshot-interval", str(STEPS), "--log-interval", str(EVERY),
        "--seed", "0",
    ] + extra)
    evals = {}
    with open(f"{wd}/metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("prefix") == "eval" and "psnr" in rec:
                evals[rec["step"]] = rec["psnr"]
    table[name] = evals
    print(name, evals, flush=True)

steps = sorted({s for e in table.values() for s in e})
print("\n| step | " + " | ".join(table) + " |", flush=True)
for s in steps:
    row = " | ".join(f"{table[a].get(s, float('nan')):.3f}" for a in table)
    print(f"| {s} | {row} |", flush=True)
