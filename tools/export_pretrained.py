"""Export a training workdir's checkpoint as a single-file pretrained
artifact for ssdn_tpu.zoo (params + config + provenance, no optimizer
state — ~5 MB for the paper-size net vs ~16 MB of Orbax state).

Usage:
  python tools/export_pretrained.py WORKDIR OUT.npz \
      [--which auto|best|latest] [--note "..."]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    import jax

    # plain export is pure host work; never touch (or wait on) the TPU
    # tunnel. With --eval the full-model forward runs — leave the platform
    # alone so it lands on the chip (the 1-core CPU takes ~10 min/image).
    # Match BOTH spellings, `--eval DATASET` and `--eval=DATASET`
    # (ADVICE r4: the substring check missed the = form and sent the
    # eval to the 1-core host).
    if not any(tok == "--eval" or tok.startswith("--eval=")
               for tok in (argv or sys.argv[1:])):
        jax.config.update("jax_platforms", "cpu")

    from ssdn_tpu import zoo
    from ssdn_tpu.cli.evaluate import _restore
    from ssdn_tpu.train.loop import load_config
    from ssdn_tpu.train.step import init_state

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("workdir")
    p.add_argument("out", help="output .npz path")
    p.add_argument("--which", default="auto",
                   choices=["auto", "best", "latest"])
    p.add_argument("--note", default="", help="free-form provenance note")
    p.add_argument("--eval", default=None, metavar="DATASET",
                   help="evaluate the checkpoint on this dataset spec "
                        "(e.g. 'bundled') and record the PSNR in the "
                        "artifact meta (zoo provenance, SURVEY.md §3.4)")
    args = p.parse_args(argv)

    cfg = load_config(args.workdir)
    state = _restore(args, cfg, init_state(cfg))
    meta = {
        "step": int(state.step),
        "noise": cfg.noise.describe(),
        "which": args.which,
        "note": args.note,
    }
    if args.eval:
        from ssdn_tpu.data import open_dataset
        from ssdn_tpu.infer import evaluate_dataset

        res = evaluate_dataset(
            cfg, state.params,
            open_dataset(args.eval, grayscale=cfg.grayscale),
        )
        meta["eval"] = {
            args.eval: {
                "psnr_mean": round(res["psnr_mean"], 3),
                "noisy_psnr_mean": round(res["noisy_psnr_mean"], 3),
                "noise": cfg.noise.describe(),
            }
        }
        print(f"eval {args.eval}: {res['psnr_mean']:.3f} dB "
              f"(noisy {res['noisy_psnr_mean']:.3f})")
    zoo.save(args.out, cfg, state.params, meta)
    n = sum(v.size for v in jax.tree_util.tree_leaves(state.params))
    print(f"wrote {args.out}: step {meta['step']}, {n} params, "
          f"noise {meta['noise']}")


if __name__ == "__main__":
    sys.exit(main())
