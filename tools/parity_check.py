"""Parity measurement: default arm (bf16, beta-NLL=1)
vs reference-numerics arm (fp32, HIGHEST, beta=0) on identical data/seeds.
Runs both arms via the real CLI on whatever device JAX picks (TPU here),
then prints the PSNR-vs-step table."""
import json
import shutil
import sys

from ssdn_tpu.cli.train import main as train_main

STEPS = 3000
EVERY = 500
arms = {
    "default_bf16_beta1": [],
    "reference_fp32_beta0": ["--compute-dtype", "float32", "--nll-beta", "0",
                             "--conv-precision", "highest"],
}
table = {}
for name, extra in arms.items():
    wd = f"/tmp/parity_{name}"
    shutil.rmtree(wd, ignore_errors=True)
    print(f"=== arm {name} ===", flush=True)
    train_main([
        "--workdir", wd, "--train-data", "synthetic:64",
        "--eval-data", "synthetic:8", "--iterations", str(STEPS),
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
