"""Trainer: iteration loop, checkpoint/resume, eval hooks, metrics
(reference ``DenoiserTrainer`` [R]; SURVEY.md §2.1 trainer row, §5.3-5.5).

Checkpointing is Orbax (async-capable, keep-last-K). The loader needs no
saved state beyond the step counter — batches are a pure function of
(seed, step) (data/sampler.py) — so preemption-resume is exact
(SURVEY.md §5.3).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssdn_tpu import parallel
from ssdn_tpu.config import TrainConfig, to_json, train_config_from_json
from ssdn_tpu.data import Prefetcher, open_dataset
from ssdn_tpu.infer import evaluate_dataset
from ssdn_tpu.train.step import TrainState, init_state, make_train_step


def save_config(workdir: str, cfg: TrainConfig) -> None:
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.json"), "w") as f:
        f.write(to_json(cfg))


def load_config(workdir: str) -> TrainConfig:
    with open(os.path.join(workdir, "config.json")) as f:
        return train_config_from_json(f.read())


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for the TrainState pytree.

    subdir "ckpt" holds the rolling keep-K snapshots; subdir "ckpt_best"
    (see Trainer._eval) holds the single best-by-eval-PSNR state — the one
    users generally want, since NLL loss health does not guarantee eval
    quality (README numerics notes).
    """

    def __init__(self, workdir: str, cfg: TrainConfig, subdir: str = "ckpt",
                 max_to_keep: Optional[int] = None):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.cfg = cfg
        self.dir = os.path.abspath(os.path.join(workdir, subdir))
        self.mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep or cfg.keep_checkpoints, create=True
            ),
        )

    def save(self, state: TrainState, wait: bool = False) -> None:
        self.mgr.save(
            int(state.step), args=self._ocp.args.StandardSave(state)
        )
        if wait:
            self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, target: TrainState) -> TrainState:
        step = self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.dir}")
        return self.mgr.restore(
            step, args=self._ocp.args.StandardRestore(target)
        )

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()


class MetricsLogger:
    """CSV + stdout scalars; TensorBoard when tensorboardX is importable
    (SURVEY.md §5.5)."""

    def __init__(self, workdir: str):
        os.makedirs(workdir, exist_ok=True)
        self.jsonl_path = os.path.join(workdir, "metrics.jsonl")
        self.tb = None
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(os.path.join(workdir, "tb"))
        except Exception:
            pass

    def log(self, step: int, scalars: Dict[str, float], prefix: str = "train"):
        scalars = {k: float(v) for k, v in scalars.items()}
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps({"step": step, "prefix": prefix, **scalars}) + "\n")
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(f"{prefix}/{k}", v, step)

    def log_image(self, step: int, tag: str, img) -> None:
        """img: (H, W, C) float internal range — reference-style eval image
        grids (SURVEY.md §5.5)."""
        if self.tb is None:
            return
        import numpy as np

        from ssdn_tpu.utils.images import from_internal

        self.tb.add_image(tag, from_internal(np.asarray(img)), step,
                          dataformats="HWC")

    def close(self):
        if self.tb is not None:
            self.tb.close()


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        workdir: str,
        train_data: str = "synthetic:64:128",
        eval_data: Optional[str] = None,
        mesh: Optional[object] = None,
        log_interval: int = 100,
        sampler_backend: str = "auto",
        profile_dir: Optional[str] = None,
        profile_window: tuple = (10, 15),
        prefetch_depth: int = 12,
        prefetch_threads: int = 4,
    ):
        # profiling (SURVEY.md §5.1): capture an XLA device trace over
        # profile_window steps into profile_dir (TensorBoard profile plugin)
        self.profile_dir = profile_dir
        self.profile_window = profile_window
        self.cfg = cfg
        self.workdir = workdir
        self.mesh = mesh
        self.log_interval = log_interval
        self.prefetch_depth = prefetch_depth
        self.prefetch_threads = prefetch_threads
        save_config(workdir, cfg)
        self.dataset = open_dataset(train_data, grayscale=cfg.grayscale)
        self.eval_dataset = (
            open_dataset(eval_data, grayscale=cfg.grayscale)
            if eval_data
            else None
        )
        if getattr(self.eval_dataset, "streaming", False):
            # Fail fast: evaluate_dataset rejects streaming datasets, but
            # only at the FIRST eval — with the default eval_interval that
            # would be 10k steps of wasted chip time before the error.
            raise ValueError(
                f"eval_data={eval_data!r} is a streaming (unbounded) "
                "dataset; evaluation needs a fixed finite set — use e.g. "
                "'synthetic:8' or an image folder"
            )
        # Measured guardrail (round 3, tests/test_psnr_regression.py
        # docstring): a 5-level U-Net trained on patches < 64 px does not
        # extrapolate to larger inference sizes — its deepest stages only
        # ever see 1x1/2x2 maps and specialize to that degenerate regime,
        # so eval PSNR on larger images DEGRADES as training proceeds
        # (measured: 24.2 -> 13.9 dB over steps 100-300 at patch 32 / eval
        # 128, while the same weights score 28.9 dB at 32px inputs).
        if self.eval_dataset is not None and cfg.patch_size < 64:
            try:
                eh, ew = self.eval_dataset[0].shape[:2]
            except Exception:
                eh = ew = 0
            if max(eh, ew) > cfg.patch_size:
                print(
                    f"[warn] training patch {cfg.patch_size}px is smaller "
                    f"than the eval images ({eh}x{ew}) and below the ~64px "
                    f"size-generalization floor of the 5-level U-Net: eval "
                    f"PSNR on larger images will degrade as deep stages "
                    f"specialize to tiny training maps. Train with "
                    f"--patch-size >= 64 for full-size inference.",
                    flush=True,
                )
        from ssdn_tpu.native import NativePatchSampler, make_sampler

        # Pin the sampler backend across resumes: 'auto' re-decided per
        # environment would silently change the (deterministic) crop stream
        # mid-run if the native build outcome differs, breaking the
        # (seed, step) exact-resume contract (ADVICE r1). The first run
        # records the resolved backend; later runs reuse it.
        backend_path = os.path.join(workdir, "sampler_backend.json")
        if sampler_backend == "auto" and os.path.exists(backend_path):
            with open(backend_path) as f:
                sampler_backend = json.load(f)["backend"]
        self.sampler = make_sampler(
            self.dataset, cfg.patch_size, cfg.batch_size, seed=cfg.seed,
            backend=sampler_backend,
        )
        resolved = (
            "native" if isinstance(self.sampler, NativePatchSampler)
            else "python"
        )
        if not os.path.exists(backend_path):
            with open(backend_path, "w") as f:
                json.dump({"backend": resolved}, f)
        else:
            with open(backend_path) as f:
                recorded = json.load(f)["backend"]
            if recorded != resolved:
                print(
                    f"[warn] sampler backend changed across resume: "
                    f"recorded={recorded} resolved={resolved} — the crop "
                    f"stream will differ from the original run",
                    flush=True,
                )
        self.step_fn = parallel.jit_data_parallel(
            make_train_step(cfg), mesh
        )
        self.ckpt = CheckpointManager(workdir, cfg)
        self.best_ckpt = CheckpointManager(workdir, cfg, subdir="ckpt_best",
                                           max_to_keep=1)
        # best_psnr persists across preemption-resume so a post-restart eval
        # can't overwrite ckpt_best with a worse state (ADVICE r1).
        self._best_path = os.path.join(workdir, "best_psnr.json")
        self.eval_bad_streak = 0
        self.best_psnr = float("-inf")
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                self.best_psnr = float(json.load(f)["psnr"])
        self.logger = MetricsLogger(workdir)

    def _eval(self, state: TrainState, step: int) -> Optional[float]:
        if self.eval_dataset is None:
            return None
        res = evaluate_dataset(
            self.cfg, state.params, self.eval_dataset, return_images=2,
            eval_batch=4,  # same-shaped eval sets batch per forward
        )
        self.logger.log(
            step,
            {"psnr": res["psnr_mean"], "noisy_psnr": res["noisy_psnr_mean"]},
            prefix="eval",
        )
        for i, trio in enumerate(res.get("images", [])):
            self.logger.log_image(step, f"eval/{i}/noisy", trio["noisy"])
            self.logger.log_image(step, f"eval/{i}/denoised", trio["denoised"])
        print(
            f"[eval @ {step}] psnr {res['psnr_mean']:.3f} dB "
            f"(noisy {res['noisy_psnr_mean']:.3f})",
            flush=True,
        )
        if res["psnr_mean"] > self.best_psnr:
            self.best_psnr = res["psnr_mean"]
            self.best_ckpt.save(state)
            with open(self._best_path, "w") as f:
                json.dump({"psnr": self.best_psnr, "step": step}, f)
        # eval-quality degradation streak (TrainConfig.eval_patience)
        if res["psnr_mean"] < self.best_psnr - self.cfg.eval_patience_delta:
            self.eval_bad_streak += 1
        else:
            self.eval_bad_streak = 0
        return res["psnr_mean"]

    def train(self, resume: bool = True) -> TrainState:
        cfg = self.cfg
        state = init_state(cfg)
        if resume and self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
            print(f"resumed from step {int(state.step)}", flush=True)
        else:
            # No checkpoint to resume => this run starts from step 0 even
            # with resume=True (reused workdir whose ckpt/ was cleared but
            # best_psnr.json kept, ADVICE r2): stale best state applies
            # to neither case.
            # fresh run in a reused workdir: a stale best_psnr.json /
            # ckpt_best from the previous run would falsely trip
            # eval-patience and feed old weights to the guard escalation
            if self.best_psnr != float("-inf"):
                print(
                    f"[fresh run] discarding stale best (psnr "
                    f"{self.best_psnr:.3f}) from a previous run in this "
                    "workdir",
                    flush=True,
                )
                self.best_psnr = float("-inf")
                self.eval_bad_streak = 0
                if os.path.exists(self._best_path):
                    os.remove(self._best_path)
            for s_ in list(self.best_ckpt.mgr.all_steps()):
                self.best_ckpt.mgr.delete(s_)
        if self.mesh is not None:
            state = jax.device_put(state, parallel.replicated(self.mesh))
        start = int(state.step)
        todo = cfg.iterations - start
        if todo <= 0:
            return state
        step = start  # python-side mirror of state.step: fetching
        # int(state.step) per iteration would synchronize every step

        # Loss-spike rollback guard (SURVEY.md §5.3 failure detection):
        # the NLL objective can nucleate a runaway from a specific
        # (weights, batch) interaction (README numerics notes). Every
        # guard_check steps the loss scalar is fetched; a spike above the
        # EMA + margin (or non-finite) restores the last good state and
        # SKIPS past the offending data window (the sampler is step-indexed,
        # so skipping is just advancing the counter). The margin is scale-
        # aware — guard_margin_k times the EMA of the loss's absolute
        # deviation — so the same knobs fit NLL (negative, noise-model-
        # dependent scale) and MSE (~1e-2 scale) pipelines.
        guard_on = cfg.guard_check > 0
        # window length when the guard is off: the log cadence, with a
        # positive floor — guard_check=0 + log_interval=0 must not create
        # zero-length windows (metrics=None crash)
        guard_check = (
            cfg.guard_check if guard_on
            else (self.log_interval if self.log_interval > 0 else 100)
        )
        guard_max_consecutive = cfg.guard_max_consecutive
        guard_loss_ema = None
        guard_dev_ema = None  # EMA of |loss - ema|; sets the relative margin
        guard_streak = 0
        guard_escalated = False  # rewind-to-best fires once per streak
        good_state = jax.tree.map(jnp.copy, state)

        def guard_margin():
            if guard_dev_ema is None:
                return cfg.guard_margin_floor
            return max(cfg.guard_margin_floor,
                       cfg.guard_margin_k * guard_dev_ema)

        # ONE prefetch pipeline spans the whole run (round 5): per-window
        # pipelines drained and refilled at every guard/log boundary,
        # paying a pipeline-depth stall each time; a persistent pipeline
        # keeps `prefetch_threads` transfers continuously in flight, which
        # is what absorbs remote-tunnel transfer jitter (measured in
        # tools/transfer_microbench.py; see Prefetcher docstring). The
        # guard's "skip the offending window" semantics are unchanged:
        # windows tile [start, iterations) contiguously and a rollback
        # advances the step counter to window_end, so the iterator stays
        # aligned with the step counter either way.
        prefetch = Prefetcher(
            self.sampler, start, todo,
            depth=self.prefetch_depth, n_threads=self.prefetch_threads,
            transform=lambda b: parallel.put_batch(b, self.mesh),
        )
        batches = iter(prefetch)

        def run_window(state, from_step, to_step, profiled=[False]):
            if (
                self.profile_dir is not None
                and not profiled[0]
                and from_step <= start + self.profile_window[0] < to_step
            ):
                profiled[0] = True
                jax.profiler.start_trace(self.profile_dir)
                try:
                    state, metrics = run_window(state, from_step, to_step)
                    jax.block_until_ready(state.params)
                finally:
                    jax.profiler.stop_trace()
                return state, metrics
            metrics = None
            for _ in range(to_step - from_step):
                state, metrics = self.step_fn(state, next(batches))
            return state, metrics

        t0, tn0 = time.time(), start
        try:
            while step < cfg.iterations:
                window_end = min(step + guard_check, cfg.iterations)
                # align windows to log/eval/snapshot boundaries
                for iv in (self.log_interval, cfg.eval_interval,
                           cfg.snapshot_interval):
                    if iv > 0:  # interval <= 0 disables the hook
                        nxt = (step // iv + 1) * iv
                        window_end = min(window_end, nxt)
                state, metrics = run_window(state, step, window_end)
                loss = float(metrics["loss"])
                if not np.isfinite(loss) or (
                    guard_on
                    and guard_loss_ema is not None
                    and loss > guard_loss_ema + guard_margin()
                ):
                    print(
                        f"[guard @ {window_end}] loss {loss:.3f} vs ema "
                        f"{guard_loss_ema if guard_loss_ema is None else round(guard_loss_ema, 3)}"
                        f" (margin {guard_margin():.3g})"
                        f" — rolling back and skipping the window",
                        flush=True,
                    )
                    # restore last good params/opt state; skip the window's
                    # data by advancing the step counter without training
                    state = jax.tree.map(jnp.copy, good_state)
                    state = state.replace(
                        step=jnp.asarray(window_end, jnp.int32)
                    )
                    step = window_end
                    guard_streak += 1
                    # Escalation (measured necessity: in the round-2 10k-step
                    # run every restore-and-skip re-spiked — the 50-step-old
                    # snapshot was already inside the unstable basin): halfway
                    # to the early-stop limit, rewind the WEIGHTS to the
                    # best-by-eval-PSNR checkpoint while keeping the current
                    # step counter, so training resumes from a known-good
                    # basin on fresh data.
                    # `>=` + fired-once flag (not `==`): if ckpt_best does
                    # not exist at the exact halfway streak (first eval
                    # lands later), re-check on every subsequent rollback
                    # instead of never escalating (ADVICE r2)
                    if (
                        not guard_escalated
                        and guard_streak >= max(guard_max_consecutive // 2, 1)
                        and self.best_ckpt.latest_step() is not None
                    ):
                        guard_escalated = True
                        print(
                            f"[guard @ {window_end}] {guard_streak} consecutive "
                            "rollbacks — rewinding weights to ckpt_best "
                            "(step counter keeps advancing)",
                            flush=True,
                        )
                        # await any in-flight async best-save first:
                        # max_to_keep=1 garbage-collects the old step during
                        # finalize, which could race the restore
                        self.best_ckpt.mgr.wait_until_finished()
                        best = self.best_ckpt.restore(init_state(cfg))
                        if self.mesh is not None:
                            best = jax.device_put(
                                best, parallel.replicated(self.mesh)
                            )
                        state = best.replace(
                            step=jnp.asarray(window_end, jnp.int32)
                        )
                        good_state = jax.tree.map(jnp.copy, state)
                        # keep the loss EMA/deviation stats: they describe
                        # the healthy basin being rewound to, so continued
                        # spiking still counts toward the early-stop limit
                    if guard_streak >= guard_max_consecutive:
                        print(
                            f"[guard] {guard_streak} consecutive rollbacks — "
                            "training has reached an unstable region; "
                            "early-stopping at the last good state",
                            flush=True,
                        )
                        self.ckpt.save(state)
                        break
                    continue
                guard_streak = 0
                guard_escalated = False
                if guard_loss_ema is None:
                    guard_loss_ema = loss
                else:
                    dev = abs(loss - guard_loss_ema)
                    guard_dev_ema = (
                        dev if guard_dev_ema is None
                        else 0.9 * guard_dev_ema + 0.1 * dev
                    )
                    guard_loss_ema = 0.9 * guard_loss_ema + 0.1 * loss
                good_state = jax.tree.map(jnp.copy, state)
                step = next_step = window_end
                if (self.log_interval > 0 and next_step % self.log_interval == 0) or next_step == cfg.iterations:
                    m = {k: float(v) for k, v in metrics.items()}
                    dt = time.time() - t0
                    m["patches_per_sec"] = (
                        (next_step - tn0) * cfg.batch_size / max(dt, 1e-9)
                    )
                    t0, tn0 = time.time(), next_step
                    self.logger.log(next_step, m)
                    print(
                        f"[{next_step}/{cfg.iterations}] loss {m['loss']:.4f} "
                        f"({m['patches_per_sec']:.1f} patches/s)",
                        flush=True,
                    )
                if cfg.eval_interval > 0 and next_step % cfg.eval_interval == 0:
                    self._eval(state, next_step)
                    if (
                        cfg.eval_patience > 0
                        and self.eval_bad_streak >= cfg.eval_patience
                    ):
                        print(
                            f"[eval-patience @ {next_step}] {self.eval_bad_streak} "
                            f"consecutive evals > {cfg.eval_patience_delta:g} dB "
                            f"below the best ({self.best_psnr:.3f}) — early "
                            "stop; ckpt_best holds the best state",
                            flush=True,
                        )
                        break
                if (
                    (cfg.snapshot_interval > 0
                     and next_step % cfg.snapshot_interval == 0)
                    or next_step == cfg.iterations
                ):
                    self.ckpt.save(state)
            # unconditional final save — a guard rollback on the last
            # window would otherwise skip the final snapshot
            if self.ckpt.latest_step() != int(state.step):
                self.ckpt.save(state)
        finally:
            prefetch.close()
            self.ckpt.mgr.wait_until_finished()
            # the best-PSNR manager saves asynchronously too; an unawaited
            # save at process exit schedules futures during interpreter
            # shutdown (observed flaky RuntimeError in the graded-config
            # smokes when the FINAL eval improved the best)
            self.best_ckpt.mgr.wait_until_finished()
            self.logger.close()
        return state
