"""ssdn_tpu — TPU-native self-supervised image denoising framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
`COMP6248-Reproducability-Challenge/selfsupervised-denoising` (a PyTorch
reproduction of Laine et al., "High-Quality Self-Supervised Deep Image
Denoising", NeurIPS 2019).

Provenance note: the reference mount was empty during the survey session
(see SURVEY.md §0), so parity claims cite SURVEY.md sections (themselves
tagged with [B] = BASELINE.json, [P] = the paper, [R] = recalled repo
structure) instead of reference file:line.

Layout (SURVEY.md §7.1):
  ops/        shifted conv / pool / upsample, rotation fold/unfold (pure fns)
  ops/pallas/ fused TPU kernels + lax fallback dispatch
  models/     blind-spot U-Net and baseline U-Net (pure-pytree params)
  estimator/  per-noise-model NLL losses + Bayesian posterior means (fp32)
  noise/      jittable synthetic-noise injectors
  data/       datasets (folder / HDF5 / synthetic), patch sampling, prefetch
  parallel/   mesh + sharding helpers, DP train sharding, halo-tiled inference
  train/      train state, jitted step, LR schedule, trainer loop, checkpoints
  infer/      full-image padded inference + tiled inference
  utils/      PSNR, image I/O, logging
  cli/        train / evaluate / denoise / dataset tool entry points
  zoo.py      pretrained single-file artifacts (bundled: pretrained/)
"""

__version__ = "0.1.0"
