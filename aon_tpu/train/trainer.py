"""Training orchestration (the TPU replacement for Lightning Trainer).

Reference behavior reproduced (``run.py:86-166``):
  * epochs of ``steps_per_epoch`` batches, hard step cap ``run_max_steps``;
  * validation every ``check_val_every_n_epoch`` epochs over at most
    ``limit_val_batches`` full frames, logging val/psnr (+ val/psnr_obj for
    articulated runs) and a [GT|pred|depth|opacity] grid image;
  * checkpoints: last every epoch + val/psnr-ranked top-k every
    ``ckpt_every_n_epochs``;
  * NaN detection on the host loss (the reference runs Lightning with
    ``detect_anomaly=True``).

TPU specifics: ray batches stream from the host as fixed-shape numpy and are
device_put with a ray sharding over the mesh; the PRNG key is folded with
the global step so results are independent of epoch re-chunking.
"""

from __future__ import annotations

import math
import os
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from aon_tpu.data import dataset_dict
from aon_tpu.eval import metrics as M
from aon_tpu.eval.render import render_frame
from aon_tpu.parallel import get_mesh, shard_ray_batch
from aon_tpu.train.checkpoint import CheckpointManager
from aon_tpu.train.logging import MetricLogger
from aon_tpu.train.systems import build_system
from aon_tpu.utils.config import Config
from aon_tpu.utils.viz import val_grid


class TrainingCollapsed(RuntimeError):
    """The model has collapsed to a constant render; resuming is useless."""


class TrainingPlateaued(RuntimeError):
    """Val quality has stalled below the configured floor; resuming is useless."""


class CollapseSentinel:
    """Abort hopeless runs instead of burning hours of unattended TPU time.

    A collapsed NeRF (e.g. density melted to empty by the opacity-BCE
    pressure under AABB interval tightening — see BASELINE.md, AE rows)
    renders pure background on the seed-fixed val frames, so the
    full-precision val/psnr mean repeats BIT-IDENTICALLY epoch after epoch;
    a healthy run never repeats it even once.  ``limit`` consecutive equal
    values raise :class:`TrainingCollapsed` — deliberately NOT the watchdog
    exit 17: scripts/train_resilient.py must not relaunch, because resume
    would restore the same dead basin from last.ckpt.
    """

    def __init__(self, limit: int):
        self.limit = int(limit)
        self._prev: Optional[float] = None
        self._run = 1  # length of the current equal-value run

    def update(self, val_psnr: float, step: int) -> None:
        if self.limit <= 0:
            return
        self._run = self._run + 1 if val_psnr == self._prev else 1
        self._prev = val_psnr
        if self._run >= self.limit:
            raise TrainingCollapsed(
                f"val/psnr bit-identical ({val_psnr:.6f} dB) for {self._run} "
                f"consecutive val epochs (through step {step}): the model has "
                "collapsed to a constant render. Aborting — do NOT resume "
                "from last.ckpt; restart with a gentler interval anneal "
                "(aabb_warmup_steps) or wider intervals."
            )


class PlateauSentinel:
    """Catch the collapse sentinel's blind spot: slow-drift plateaus.

    The round-4 AE 100k run drifted between 16.35 and 16.58 dB for 50k+
    steps — never bit-identical, so :class:`CollapseSentinel` stayed quiet —
    and burned ~2h of unattended chip time before round end.  This sentinel
    tracks the best val/psnr seen; once past ``start_step``, if the best
    improves by less than ``eps_db`` across ``epochs`` consecutive val
    epochs while the best is still below ``floor_psnr``, it warns — and
    raises :class:`TrainingPlateaued` when ``abort`` is set (non-resumable
    by design, like TrainingCollapsed: last.ckpt holds the plateau basin).
    ``epochs <= 0`` disables.
    """

    def __init__(
        self,
        epochs: int,
        eps_db: float = 0.3,
        floor_psnr: float = 25.0,
        start_step: int = 0,
        abort: bool = False,
    ):
        self.epochs = int(epochs)
        self.eps_db = float(eps_db)
        self.floor_psnr = float(floor_psnr)
        self.start_step = int(start_step)
        self.abort = bool(abort)
        self._bests: list = []  # best-so-far val/psnr after each counted epoch

    def update(self, val_psnr: float, step: int) -> None:
        if self.epochs <= 0 or step < self.start_step:
            return
        best = max(self._bests[-1] if self._bests else -float("inf"), val_psnr)
        self._bests.append(best)
        if len(self._bests) <= self.epochs:
            return
        gain = self._bests[-1] - self._bests[-1 - self.epochs]
        if gain >= self.eps_db or self._bests[-1] >= self.floor_psnr:
            return
        msg = (
            f"val/psnr plateaued: best improved {gain:.3f} dB (< "
            f"{self.eps_db}) over the last {self.epochs} val epochs and is "
            f"still {self._bests[-1]:.2f} dB (< floor {self.floor_psnr}) at "
            f"step {step}. The run is in an absorbing basin (see BASELINE.md "
            "AE 100k negative result); do NOT resume from last.ckpt — "
            "restart with lr_max_steps pinned at the proven horizon."
        )
        if self.abort:
            raise TrainingPlateaued(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.mesh = get_mesh(cfg.num_devices if cfg.num_devices > 0 else None)
        self.result_dir = Path(cfg.output_path) / cfg.exp_name
        self.result_dir.mkdir(parents=True, exist_ok=True)

        ds_cls = dataset_dict[cfg.dataset_name]
        common = dict(
            root_dir=cfg.root_dir, img_wh=tuple(cfg.img_wh), white_back=cfg.white_back,
            use_aabb=cfg.use_aabb, aabb_pad=cfg.aabb_pad,
            use_occgrid=cfg.use_occgrid, occgrid_res=cfg.occgrid_res,
            occgrid_dilate=cfg.occgrid_dilate,
        )
        if cfg.dataset_name == "sapien_multi":
            if cfg.obj_ray_oversample > 0 and cfg.exp_type == "vanilla_ae_art":
                # the AE's instance-masked MSE would need the importance
                # weights in BOTH the numerator and the mask-count
                # denominator; not wired — fail loudly instead of silently
                # training a biased objective
                raise ValueError(
                    "obj_ray_oversample is only supported for "
                    "exp_type=vanilla_autodecoder (plain-MSE objective)"
                )
            common.update(
                samples_per_epoch=cfg.samples_per_epoch,
                ray_batch_size=cfg.ray_batch_size,
                obj_ray_oversample=cfg.obj_ray_oversample,
                # only the AE encoder consumes src_imgs; skipping it for the
                # auto-decoder saves a per-batch full-frame host copy + H2D
                need_src_imgs=cfg.exp_type == "vanilla_ae_art",
            )
        if cfg.run_eval:
            self.test_dataset = ds_cls(
                split="test_val", eval_inference=cfg.render_name or "render", **common
            )
            near, far, wb = self.test_dataset.near, self.test_dataset.far, cfg.white_back
        else:
            self.train_dataset = ds_cls(split="train", **common)
            self.val_dataset = ds_cls(split="val", **common)
            near, far, wb = self.train_dataset.near, self.train_dataset.far, cfg.white_back

        self.system = build_system(cfg, near, far, wb, mesh=self.mesh)
        self.ckpt = CheckpointManager(str(self.result_dir), save_top_k=cfg.save_top_k)

        def _replicate(state):
            # restored checkpoints land on one device; renders consume
            # mesh-sharded rays, and jit refuses mixed explicit placements
            from aon_tpu.parallel import replicated_sharding

            return jax.device_put(state, replicated_sharding(self.mesh))

        self._replicate = _replicate
        self.logger = MetricLogger(
            str(self.result_dir), stdout_every=cfg.log_every_n_steps,
            sinks=cfg.metric_sinks,
        )

        key = jax.random.PRNGKey(cfg.seed)
        self.base_key, init_key = jax.random.split(key)
        self.global_step = 0
        self._heartbeat = time.time()
        self._watchdog_started = False
        # arm BEFORE the first device work: the relay hang has been observed
        # during init_state itself (device param init is a dispatch too)
        self._start_watchdog()
        self.state = self.system.init_state(init_key)
        self._beat()

    # ------------------------------------------------------------- watchdog

    WATCHDOG_EXIT_CODE = 17

    def _beat(self) -> None:
        self._heartbeat = time.time()

    def _start_watchdog(self) -> None:
        """No-progress watchdog for the axon relay-hang hazard (ROADMAP
        "environment hazards"): the relay can hang a dispatch forever with
        the trainer thread stuck in a socket wait.  A checkpoint save from
        here would hang on the same readback (and the live state may hold
        donated buffers), so recovery = exit nonzero and let
        scripts/train_resilient.py relaunch with --ckpt_path last.ckpt
        (checkpoints save every val epoch; at most one epoch is lost)."""
        timeout = float(self.cfg.watchdog_timeout or 0.0)
        if timeout <= 0 or self._watchdog_started:
            return
        self._watchdog_started = True
        import threading

        def _watch():
            while True:
                time.sleep(min(30.0, timeout / 4))
                stalled = time.time() - self._heartbeat
                if stalled > timeout:
                    print(
                        f"[watchdog] no dispatch progress for {stalled:.0f}s "
                        f"(> {timeout:.0f}s) at step {self.global_step}; "
                        f"exiting {self.WATCHDOG_EXIT_CODE} — relaunch with "
                        "--ckpt_path last.ckpt to resume",
                        flush=True,
                    )
                    os._exit(self.WATCHDOG_EXIT_CODE)

        threading.Thread(target=_watch, daemon=True, name="aon-watchdog").start()

    # ------------------------------------------------------------------ fit

    def _train_iterator(self):
        cfg = self.cfg
        # fold the restored global_step into the seed: a resumed run draws a
        # fresh ray stream instead of replaying consumed batches from step 0
        # (the reference's DataLoader reshuffles per epoch)
        seed = cfg.seed + self.global_step
        if cfg.dataset_name == "sapien_multi":
            return self.train_dataset.train_batches(seed=seed)
        return self.train_dataset.ray_batches(cfg.batch_size, seed=seed)

    def _steps_per_epoch(self) -> int:
        cfg = self.cfg
        if cfg.dataset_name == "sapien_multi":
            return cfg.samples_per_epoch
        return self.train_dataset.steps_per_epoch(cfg.batch_size)

    def fit(self, resume: bool = False) -> None:
        cfg = self.cfg
        # finetuning variants resume from last.ckpt / ckpt_path and
        # checkpoint every epoch (reference run.py:37-90)
        finetune = bool(cfg.is_optimize) or cfg.finetune_lpips
        if finetune:
            resume = True
        if resume:
            try:
                self.state = self._replicate(self.ckpt.restore(self.state, cfg.ckpt_path))
                self.global_step = int(self.state.step)
                print(f"resumed from step {self.global_step}")
            except FileNotFoundError:
                print("no checkpoint to resume from; starting fresh")
        ckpt_every = 1 if finetune else cfg.ckpt_every_n_epochs

        self._beat()
        self._start_watchdog()  # no-op if armed at __init__; cheap insurance
        sentinel = CollapseSentinel(cfg.collapse_abort_vals)
        plateau = PlateauSentinel(
            cfg.plateau_abort_epochs,
            cfg.plateau_eps_db,
            cfg.plateau_floor_psnr,
            cfg.plateau_start_step,
            cfg.plateau_abort,
        )
        it = self._train_iterator()
        steps_per_epoch = self._steps_per_epoch()
        rays_per_step = (
            cfg.ray_batch_size if cfg.dataset_name == "sapien_multi" else cfg.batch_size
        )
        start_epoch = self.global_step // max(1, steps_per_epoch)

        t_dispatch = max(1, cfg.steps_per_dispatch)

        profiling = False
        if cfg.profile_dir:
            from jax import profiler as _jprofiler

            _jprofiler.start_trace(cfg.profile_dir)
            profiling = True

        for epoch in range(start_epoch, cfg.num_epochs):
            t_epoch = time.time()
            n_rays = 0
            steps_done = 0
            metrics = None
            while steps_done < steps_per_epoch:
                if self.global_step >= cfg.run_max_steps:
                    break
                t_now = min(
                    t_dispatch, steps_per_epoch - steps_done,
                    cfg.run_max_steps - self.global_step,
                )
                key = jax.random.fold_in(self.base_key, self.global_step)
                # bg_loss warmup: per-step linear ramp of the AE background
                # MSE weight (Config.bg_loss_warmup_steps) injected as a
                # replicated shared scalar — same shape every dispatch, so
                # no recompile
                bg_warm = getattr(cfg, "bg_loss_warmup_steps", 0)
                # interval-tightening anneal (Config.aabb_warmup_steps):
                # injected the same way; consumed by core/rays.py
                # effective_intervals in every train path
                aabb_warm = getattr(cfg, "aabb_warmup_steps", 0)

                def _inject_ramps(b, step):
                    if bg_warm > 0:
                        b["bg_scale"] = np.float32(min(1.0, step / bg_warm))
                    if aabb_warm > 0:
                        b["interval_ramp"] = np.float32(
                            min(1.0, step / aabb_warm)
                        )

                if t_now > 1:
                    from aon_tpu.parallel import stack_step_batches

                    batches = [next(it) for _ in range(t_now)]
                    for j, b in enumerate(batches):
                        _inject_ramps(b, self.global_step + j)
                    super_b = stack_step_batches(
                        batches, self.mesh, microbatch=cfg.microbatch_rays
                    )
                    self.state, metrics = self.system.train_many(self.state, super_b, key)
                else:
                    batch = next(it)
                    _inject_ramps(batch, self.global_step)
                    sharded = shard_ray_batch(
                        batch, self.mesh, microbatch=cfg.microbatch_rays
                    )
                    self.state, metrics = self.system.train_step(self.state, sharded, key)
                self.global_step += t_now
                steps_done += t_now
                n_rays += rays_per_step * t_now
                self._beat()
                if self.global_step % cfg.log_every_n_steps < t_now:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    if math.isnan(metrics["train/loss"]):
                        raise FloatingPointError(
                            f"NaN loss at step {self.global_step} (detect_anomaly)"
                        )
                    metrics["train/lr"] = float(
                        self.system.lr_schedule(self.global_step)
                    )
                    self.logger.log(self.global_step, metrics)

            # host readback before timing: async dispatch (and the axon
            # relay's early ack) otherwise inflates the epoch rate
            _ = float(metrics["train/loss"]) if metrics else None
            dt = time.time() - t_epoch
            self.logger.log(
                self.global_step,
                {"epoch": epoch, "train/rays_per_sec": n_rays / max(dt, 1e-9)},
                force_stdout=True,
            )

            if profiling:  # trace covers the first trained epoch only
                from jax import profiler as _jprofiler

                _jprofiler.stop_trace()
                profiling = False
                print(f"profiler trace written to {cfg.profile_dir}")

            if (epoch + 1) % cfg.check_val_every_n_epoch == 0:
                val_psnr = self.validate(epoch)
                # sentinel BEFORE save_last: never overwrite a live
                # checkpoint with the collapsed state it would resume into
                sentinel.update(val_psnr, self.global_step)
                plateau.update(val_psnr, self.global_step)
                self.ckpt.save_last(self.state, epoch)
                if (epoch + 1) % ckpt_every == 0:
                    self.ckpt.save_ranked(self.state, epoch, val_psnr)

            if self.global_step >= cfg.run_max_steps:
                break
        self.ckpt.save_last(self.state, cfg.num_epochs - 1)

    # ------------------------------------------------------------ validation

    def _val_frames(self):
        cfg = self.cfg
        if cfg.dataset_name == "sapien_multi":
            n = min(cfg.limit_val_batches, 5)
            for i in range(n):
                yield self.val_dataset.val_frame(seed=cfg.seed + i)
        else:
            n = min(cfg.limit_val_batches, len(self.val_dataset.img_files))
            for i in range(n):
                yield self.val_dataset.full_frame(i)

    def _render_full(self, params, frame: Dict[str, np.ndarray], is_test: bool = False):
        extra = {}
        if self.cfg.exp_type in ("vanilla_autodecoder", "vanilla_ae_art"):
            extra["instance_id"] = jax.numpy.asarray(frame["instance_id"])
            extra["articulation_id"] = jax.numpy.asarray(frame["articulation_id"])
            if is_test:
                extra["is_test"] = True
            if self.cfg.exp_type == "vanilla_ae_art":
                extra.pop("instance_id", None)
                extra.pop("articulation_id", None)
                extra.pop("is_test", None)
                extra["src_imgs"] = jax.numpy.asarray(frame["src_imgs"])[None]
                extra["deg"] = jax.numpy.asarray(frame.get("deg", 0.0))
        def chunk_fn(rays, **ex):
            return self.system.render_chunk(params, rays, **ex)

        chunk = self.cfg.chunk
        if jax.default_backend() == "tpu":
            # validated ceiling; the old 30720 limit came from the XLA
            # sort/compare-count resample glue, now replaced by the Pallas
            # resample kernel (ops/resample_pallas.py) which compiles and
            # runs at 61440 rays/chunk
            chunk = min(chunk, 61440)
        miss_fill = None
        if "hit" in frame:
            # AABB path: rays missing the box ARE the background — skip them
            bg = 1.0 if self.cfg.white_back else 0.0
            miss_fill = {"comp_rgb": bg, "acc": 0.0, "depth": 0.0}
        return render_frame(
            chunk_fn, frame, self.mesh, chunk, miss_fill=miss_fill, **extra
        )

    def validate(self, epoch: int) -> float:
        psnrs, psnrs_obj = [], []
        state_sq_errs, state_deg_errs = [], []
        first_viz = None
        for i, frame in enumerate(self._val_frames()):
            ret = self._render_full(self.state.params, frame)
            self._beat()
            p = M.psnr(ret["comp_rgb"], frame["target"])
            psnrs.append(p)
            if "instance_mask" in frame:
                psnrs_obj.append(
                    M.psnr_masked(ret["comp_rgb"], frame["target"], frame["instance_mask"])
                )
            if "pred_state" in ret and "deg" in frame:
                # joint-state regression metrics (model_ae_art.py:519-523):
                # state_error_rad = MSE(pred, gt) in radians;
                # abs_state_error_deg = round(deg(pred)) - round(deg(gt)).
                # pred_state is per-ray-constant; under the AABB compaction
                # path miss rays carry NaN fill (eval/render.py) — reduce
                # over hit rays only
                pred = float(np.nanmean(ret["pred_state"]))
                gt = float(frame["deg"])
                state_sq_errs.append((pred - gt) ** 2)
                state_deg_errs.append(
                    float(np.round(np.rad2deg(pred)) - np.round(np.rad2deg(gt)))
                )
            if first_viz is None:
                w, h = frame.get("img_wh", self.cfg.img_wh)
                first_viz = val_grid(
                    (w, h), frame["target"], ret["comp_rgb"], ret.get("depth"), ret.get("acc")
                )
        val_psnr = float(np.mean(psnrs))
        logs = {"val/psnr": val_psnr, "epoch": epoch}
        if psnrs_obj:
            logs["val/psnr_obj"] = float(np.nanmean(psnrs_obj))
        if state_sq_errs:
            logs["val/state_error_rad"] = float(np.mean(state_sq_errs))
            logs["val/abs_state_error_deg"] = float(np.mean(state_deg_errs))
        self.logger.log(self.global_step, logs, force_stdout=True)
        if first_viz is not None:
            self.logger.log_image(
                self.global_step, "val/GT_pred_rgb", first_viz, str(self.result_dir)
            )
        return val_psnr

    # ------------------------------------------------------------------ test

    def test(self, ckpt_name: Optional[str] = None) -> dict:
        cfg = self.cfg
        try:
            self.state = self._replicate(
                self.ckpt.restore(self.state, ckpt_name or cfg.ckpt_path)
            )
        except FileNotFoundError as e:
            print(f"warning: checkpoint not found ({e}); evaluating current params")

        is_multi = cfg.dataset_name == "sapien_multi"
        n_frames = len(self.test_dataset)
        rgbs, targets, masks, depths = [], [], [], []
        w, h = cfg.img_wh
        for i in range(n_frames):
            if is_multi:
                frame = self.test_dataset.test_frame(i, seed=cfg.seed)
            else:
                frame = self.test_dataset.full_frame(i)
            ret = self._render_full(self.state.params, frame, is_test=is_multi)
            self._beat()
            rgbs.append(ret["comp_rgb"].reshape(h, w, 3))
            targets.append(np.asarray(frame["target"]).reshape(h, w, 3))
            masks.append(np.asarray(frame["instance_mask"]).reshape(h, w))
            if "depth" in ret:
                depths.append(ret["depth"].reshape(h, w))
            print(f"rendered test frame {i + 1}/{n_frames}", flush=True)

        psnr_stats = M.summarize("PSNR", [M.psnr(p, t) for p, t in zip(rgbs, targets)])
        ssim_stats = M.summarize("SSIM", [M.ssim(p, t) for p, t in zip(rgbs, targets)])
        lpips_vals = [M.lpips(p, t) for p, t in zip(rgbs, targets)]
        lpips_stats = (
            M.summarize("LPIPS", lpips_vals) if any(v is not None for v in lpips_vals) else None
        )
        psnr_obj_stats = M.summarize(
            "PSNR_obj", [M.psnr_masked(p, t, m) for p, t, m in zip(rgbs, targets, masks)]
        )

        from aon_tpu.eval.artifacts import (
            store_depth_img,
            store_image,
            store_video,
            write_stats,
        )

        image_dir = os.path.join("ckpts", cfg.exp_name, cfg.render_name or "render")
        store_image(image_dir, rgbs, "image")
        if depths:
            store_depth_img(image_dir, depths, "depth")
        if is_multi:
            store_video(image_dir, rgbs)
        extra = None
        if lpips_stats:
            from aon_tpu.eval.lpips import lpips_weights_kind

            # label the weight provenance: "synthetic" LPIPS values are a
            # plumbing proof, not a perceptual metric (weights/README.md)
            extra = {"lpips_weights": lpips_weights_kind()}
        write_stats(
            os.path.join("ckpts", cfg.exp_name, "results.json"),
            psnr_stats,
            ssim_stats,
            lpips_stats,
            psnr_obj_stats,
            extra=extra,
        )
        results = {
            "test/psnr": psnr_stats["test"],
            "test/ssim": ssim_stats["test"],
            "test/lpips": lpips_stats["test"] if lpips_stats else None,
            "test/psnr_obj": psnr_obj_stats["test"],
        }
        self.logger.log(self.global_step, {k: v for k, v in results.items() if v is not None},
                        force_stdout=True)
        return results
