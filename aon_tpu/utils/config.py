"""Configuration: reference-compatible CLI/JSON surface over a dataclass.

The reference merges argparse flags with a JSON file where the JSON silently
wins (``opt.py:210-222``).  We preserve that public surface (same flag
names, ``--config`` JSON overlay with JSON precedence) but back it with one
typed dataclass and an explicit warning when JSON overrides a CLI value.

Differences from the reference, on purpose:
* ``N_samples`` / ``N_importance`` are LIVE (the reference parses but never
  forwards them — ``model.py:218`` constructs ``NeRF()`` with class defaults
  64/128; our defaults match that actual behavior);
* TPU-specific knobs: ``num_devices`` (replaces ``num_gpus`` but the old
  flag is still accepted), ``compute_dtype``, ``use_pallas``, ``seed``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from dataclasses import dataclass, field
from typing import List, Optional
from typing import List, Optional


@dataclass
class Config:
    # run surface (reference opt.py flag names)
    config: Optional[str] = None
    root_dir: str = "./data/scissor"
    dataset_name: str = "sapien"  # sapien | sapien_multi
    output_path: str = "./results"
    img_wh: List[int] = field(default_factory=lambda: [640, 480])
    white_back: bool = False
    exp_name: str = "exp"
    exp_type: str = "vanilla"  # vanilla | vanilla_autodecoder | vanilla_ae_art
    run_eval: bool = False
    render_name: Optional[str] = None
    ckpt_path: Optional[str] = None
    # finetuning variants (reference run.py:37-90): both resume from
    # last.ckpt (or ckpt_path) and checkpoint every epoch
    is_optimize: Optional[str] = None
    finetune_lpips: bool = False

    # model
    N_samples: int = 64
    N_importance: int = 128
    N_emb_xyz: int = 10
    N_emb_dir: int = 4
    # reference opt.py:39 advertises --noise_std default 1.0 but LitNeRF
    # builds NeRF() with the constructor default 0.0 (model.py:218) — the
    # flag is dormant upstream, so 0.0 IS the reference behavior (and the
    # v3 fused train path requires it; nonzero falls back to v2).
    noise_std: float = 0.0
    use_disp: bool = False  # lindisp
    # Scene-AABB interval tightening (data/aabb.py): bound the scene from the
    # train split's depth maps, sample each ray only inside its AABB slab
    # interval, skip rays that miss the box entirely (train AND eval).  The
    # model is empty outside the box by construction, so quality is equal at
    # far fewer samples — the TPU-first fast path with no reference analogue.
    use_aabb: bool = False
    aabb_pad: float = 0.05
    # Occupancy-grid interval refinement (data/occgrid.py, implies use_aabb
    # machinery): splat train depth points into a res^3 voxel grid and shrink
    # each ray's slab interval to its [first, last] occupied probe — tighter
    # than the box slab wherever the ray crosses empty box corners.
    use_occgrid: bool = False
    occgrid_res: int = 128
    occgrid_dilate: int = 2

    # latent codes (articulated)
    N_max_objs: int = 151
    N_obj_code_length: int = 128
    # Articulation-table smoothness: weight on sum ||z_{i+1} - z_i||^2 over
    # the 10-row articulation embedding.  The reference's test-time demo
    # renders MIDPOINT latents (code_library.py:55-71) that training never
    # sees; pulling consecutive codes together makes the latent trajectory
    # locally linear so those midpoints decode to intermediate geometry.
    # 0 = off (exact reference objective).
    art_code_smoothness: float = 0.0

    # Object-pixel ray oversampling (sapien_multi train batches): fraction of
    # each ray batch drawn uniformly from OBJECT (seg>0) pixels, the rest
    # uniformly from all candidate pixels; per-ray importance weights
    # ("loss_w") keep the photometric objective UNBIASED for the uniform-pixel
    # mean.  Thin-geometry scenes (scissors at 320x240: ~4% object pixels)
    # otherwise spend <5% of the gradient signal on the object.  0 = off
    # (exact reference sampling, sapien_multi.py:234-241).
    obj_ray_oversample: float = 0.0

    # AE-only: weight of an auxiliary background photometric MSE (mean over
    # background pixels vs the seg-masked GT background color).  The
    # reference AE supervises background SOLELY through its opacity-BCE
    # quirk — BCEWithLogits applied to acc in [0,1] (model_ae_art.py:646-663)
    # — whose gradient floor sigmoid(acc) >= 0.5 is too weak to carve the
    # in-box free space once AABB/occ interval tightening confines every
    # sample to the object bounding box: the run collapses to a solid
    # box-shaped blob (full-image PSNR 15.9 vs 29.4 untightened, round 4).
    # 0 = off (exact reference objective, model_ae_art.py:380-387); the
    # tightened production configs set 1.0, which restores the same direct
    # background discipline the auto-decoder's unmasked MSE provides.
    bg_loss_lambda: float = 0.0
    # Linear warmup (steps) for bg_loss_lambda: scale = min(1, step/warmup).
    # Full-strength background MSE against a BLACK masked background from
    # step 0 kills ALL density before the object establishes — and the AE's
    # reference relu sigma makes that death permanent (zero gradient once
    # raw sigma < 0 along every ray): observed as opacity BCE pinned at
    # exactly log(2) (acc = 0) with psnr0 == psnr1.  Ramping the weight lets
    # the object-masked MSE + BCE up-pressure claim the object region first;
    # the bg term then carves free space it can no longer extinguish.
    bg_loss_warmup_steps: int = 0
    # Linear anneal (steps) of AABB/occ interval tightening: the per-ray
    # [t_near, t_far] is lerped from the global [near, far] at step 0 to the
    # fully tightened bounds at step aabb_warmup_steps (core/rays.py
    # effective_intervals).  Needed by the auto-encoder system: tightening
    # from step 0 concentrates every sample inside the scene box, the masked
    # MSE builds an opaque box-shaped blob, and the acc-as-logits BCE cannot
    # melt it (interior samples are transmittance-shadowed).  Annealing
    # reproduces the untightened run's fog-free establishment first.
    # 0 = off (tighten fully from step 0, fine for vanilla/auto-decoder).
    aabb_warmup_steps: int = 0
    # AE sigma activation: "relu" (exact reference contract,
    # model_ae_art.py:232-233) or "softplus_bias" (softplus(raw - 1), the
    # reference's own choice for its auto-decoder variant,
    # model_autodecoder.py:265-267).  The fast-path (tightened-interval,
    # 24+48-sample) configs need softplus: under the reference's
    # acc-as-logits opacity BCE the background down-pressure has a gradient
    # floor of sigmoid(acc) >= 0.5 even at acc == 0, and at low sample
    # counts a whole level's relu sigma gets slammed to exact zero around
    # the LR-warmup peak (observed at step ~1.4-1.6k in every 24+48 run:
    # coarse died in laptop_ae_aabb24_nobg_failed, fine died in the annealed
    # run) — irrecoverably, since dead relu has zero gradient.  softplus
    # keeps the revival gradient alive; BCE still drives acc arbitrarily
    # close to 0.
    ae_sigma_activation: str = "relu"

    # data / batching
    batch_size: int = 2048  # rays per step (vanilla)
    ray_batch_size: int = 4096  # rays per step (articulated, sapien_multi)
    chunk: int = 16 * 240  # eval render rays per device step
    microbatch_rays: int = 2048  # grad-accum microbatch (bounds per-compile size)
    steps_per_dispatch: int = 8  # optimizer steps scanned per device dispatch
    samples_per_epoch: int = 4000

    # optimization (reference LitNeRF defaults, model.py:203-209)
    lr_init: float = 5.0e-4
    lr_final: float = 5.0e-6
    lr_delay_steps: int = 2500
    lr_delay_mult: float = 0.01
    run_max_steps: int = 100000
    # LR decay horizon, decoupled from run_max_steps (0 = run_max_steps,
    # the reference's coupling, model.py:391-419 via opt.py:112).  The
    # round-4 AE 100k negative result showed the opacity-BCE transition is
    # anchored in ABSOLUTE optimizer steps, not schedule fraction: naively
    # stretching the proven 24k trajectory to 100k keeps lr near max 4x
    # longer and the plateau basin absorbs (val decayed 18.2 -> 16.2 and
    # never transitioned).  Setting lr_max_steps to the proven horizon
    # replays the exact known-good lr curve, then floors at lr_final
    # (nerf_lr_schedule clips t at 1) for the remaining steps.
    lr_max_steps: int = 0
    num_epochs: int = 80
    # optimizer/scheduler factory surface (reference opt.py:135-187; dormant
    # upstream — its live systems hardcode Adam + the log-lerp schedule).
    # Here these are LIVE: the default pair ("adam", "nerf_loglerp")
    # reproduces the reference's actual hot path; any other combination
    # routes through aon_tpu/train/optim.py (sgd/adam->AdamW/radam +
    # steplr/cosine/poly + gradual warmup).
    optimizer: str = "adam"  # sgd | adam | radam | ranger
    lr_scheduler: str = "nerf_loglerp"  # nerf_loglerp | steplr | cosine | poly
    momentum: float = 0.9
    weight_decay: float = 0.0
    warmup_multiplier: float = 1.0
    warmup_epochs: int = 0
    decay_step: List[int] = field(default_factory=lambda: [20])
    decay_gamma: float = 0.1
    poly_exp: float = 0.9

    # eval artifacts
    save_path: str = "vanilla"

    # parallel / TPU
    num_gpus: int = 1  # accepted for reference-command compat
    num_devices: int = 0  # 0 = all available
    compute_dtype: str = "bfloat16"  # bfloat16 | float32
    use_pallas: bool = True
    # vanilla fused train kernel generation: "v3" = one kernel per level
    # (fwd + compositing + loss + bwd, ops/train_fused_level.py; requires
    # noise_std == 0), "v2" = separate fwd/bwd kernels + XLA compositing
    fused_train: str = "v3"
    seed: int = 0

    # debugging / profiling (SURVEY §5)
    debug_nans: bool = False  # jax_debug_nans (detect_anomaly analogue)
    profile_dir: Optional[str] = None  # jax.profiler trace of the first epoch
    # No-progress watchdog (seconds; 0 = off).  The axon device relay can
    # hang a dispatch indefinitely (observed twice in round 3 — ROADMAP
    # "environment hazards"); when no dispatch/val frame completes for this
    # long, the trainer exits with code 17 so a wrapper
    # (scripts/train_resilient.py) can relaunch with --ckpt_path last.ckpt.
    # Must exceed the worst single compile+dispatch (~5 min cold).
    watchdog_timeout: float = 0.0
    # Collapse sentinel: abort (TrainingCollapsed, a REAL failure — not the
    # resumable watchdog exit 17) when val/psnr is bit-identical for this
    # many consecutive val epochs.  A collapsed model (density melted to
    # empty by the opacity-BCE pressure under interval tightening) renders
    # pure background, so the full-precision val mean repeats EXACTLY; a
    # healthy run never does.  Caught live in round 4: laptop_ae_aabb24_100k
    # froze at 20.491 dB from step 3000 and burned 70 TPU-minutes before a
    # human noticed.  0 disables.
    collapse_abort_vals: int = 6
    # Plateau sentinel (the collapse sentinel's blind spot, caught live in
    # round 4: the AE 100k run drifted 16.35-16.58 dB for 50k+ steps —
    # never bit-identical, so collapse_abort_vals sailed through — and
    # burned ~2h of chip time).  After plateau_start_step, if the best
    # val/psnr seen improves by < plateau_eps_db over plateau_abort_epochs
    # consecutive val epochs while still below plateau_floor_psnr, warn;
    # abort (TrainingPlateaued, non-resumable like TrainingCollapsed) when
    # plateau_abort is set.  0 epochs disables.
    plateau_abort_epochs: int = 0
    plateau_eps_db: float = 0.3
    plateau_floor_psnr: float = 25.0
    plateau_start_step: int = 0
    plateau_abort: bool = False

    # logging / checkpointing
    log_every_n_steps: int = 50
    # metric sink names (aon_tpu/train/sinks.py registry): default
    # ["jsonl", "stdout"]; add "tensorboard" for TB event files under
    # results/{exp_name}/tb (no tensorboard package needed), "wandb" to
    # force the wandb sink (also auto-added when WANDB_PROJECT is set)
    metric_sinks: Optional[List[str]] = None
    check_val_every_n_epoch: int = 1
    limit_val_batches: int = 5
    save_top_k: int = 5
    ckpt_every_n_epochs: int = 10

    def __post_init__(self):
        # Encode the round-4/5 collapse hazard (ROADMAP "Quality" item 5) as
        # a loud warning, not tribal knowledge: the AE system is only stable
        # under AABB/occ interval tightening when the anneal spans a fixed
        # fraction of the LR DECAY HORIZON.  The proven gate run used
        # aabb_warmup_steps/lr-horizon = 8000/24000 = 1/3; the same absolute
        # 8000-step warmup with lr decaying over 100k collapsed the model to
        # an empty render by step 3000 (lr stays near max ~4x longer), and
        # — round-5 finding — scaling the warmup WITH the stretched horizon
        # (33000/100000) merely trades the collapse for an absorbing 16 dB
        # plateau: the transition is anchored in absolute steps, so long
        # schedules must instead pin lr_max_steps at the proven horizon.
        lr_horizon = self.lr_max_steps or self.run_max_steps
        if (
            self.exp_type == "vanilla_ae_art"
            and (self.use_aabb or self.use_occgrid)
            and not self.run_eval
            and self.aabb_warmup_steps < 0.25 * lr_horizon
        ):
            import warnings

            warnings.warn(
                f"vanilla_ae_art with interval tightening and "
                f"aabb_warmup_steps={self.aabb_warmup_steps} < 25% of the "
                f"lr decay horizon ({lr_horizon}): the interval anneal must "
                "scale with the lr curve or the opacity-BCE melts the model "
                "to an absorbing empty render (observed at 8000/100000; the "
                "proven ratio is 8000/24000). For schedules longer than the "
                "proven horizon, set lr_max_steps=24000 rather than "
                "stretching the anneal (stretching plateaus — see "
                "BASELINE.md, AE 100k negative result).",
                stacklevel=2,
            )

    def effective_num_devices(self) -> int:
        import jax

        if self.num_devices > 0:
            return self.num_devices
        return len(jax.devices())

    @property
    def lindisp(self) -> bool:
        return self.use_disp

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


_BOOL_FIELDS = {
    "white_back", "run_eval", "use_disp", "use_pallas", "finetune_lpips",
    "debug_nans", "use_aabb", "use_occgrid",
}


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="aon_tpu runner (reference-compatible surface)")
    for f in dataclasses.fields(Config):
        name = f"--{f.name}"
        if f.name in _BOOL_FIELDS:
            p.add_argument(name, default=None, action="store_true")
        elif f.name in ("img_wh", "decay_step"):
            p.add_argument(name, nargs="+", type=int, default=None)
        elif f.name == "metric_sinks":
            p.add_argument(name, nargs="+", type=str, default=None)
        else:
            typ = f.type
            caster = {"int": int, "float": float, "str": str, "Optional[str]": str}.get(
                str(typ).replace("typing.", ""), str
            )
            p.add_argument(name, type=caster, default=None)
    return p


def get_config(argv: Optional[List[str]] = None) -> Config:
    """Parse CLI + JSON overlay.  Precedence: JSON > CLI > defaults
    (matching reference opt.py:210-222, with a warning on conflicts)."""
    parser = _build_parser()
    args = parser.parse_args(argv)
    cfg = Config()

    cli_set = {k: v for k, v in vars(args).items() if v is not None}
    for k, v in cli_set.items():
        setattr(cfg, k, v)

    if args.config:
        with open(args.config) as fh:
            data = json.load(fh)
        known = {f.name for f in dataclasses.fields(Config)}
        for k, v in data.items():
            if k not in known:
                print(f"[config] ignoring unknown JSON key: {k}", file=sys.stderr)
                continue
            if k in cli_set and cli_set[k] != v:
                print(
                    f"[config] JSON overrides CLI for {k!r}: {cli_set[k]!r} -> {v!r}",
                    file=sys.stderr,
                )
            setattr(cfg, k, v)
        cfg.config = args.config

    if "num_gpus" in (cli_set.keys() | (data.keys() if args.config else set())):
        # reference commands say --num_gpus N; map onto num_devices if unset
        if cfg.num_devices == 0 and cfg.num_gpus > 1:
            cfg.num_devices = cfg.num_gpus
    return cfg
