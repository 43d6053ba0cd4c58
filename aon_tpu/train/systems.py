"""Training systems: jitted, mesh-sharded train/render steps per exp_type.

These replace the reference's three LightningModules (``LitNeRF``,
``LitNeRF_AutoDecoder``, ``LitNeRF_AE_ART``): instead of a framework-owned
loop with DDP gradient hooks, each system exposes

  * ``init_state(key)``   -> flax TrainState (params replicated over mesh)
  * ``train_step``        -> jitted (state, batch, key) -> (state, metrics);
                             rays arrive sharded on the mesh "data" axis and
                             XLA inserts the gradient psum over ICI
  * ``render_chunk``      -> jitted deterministic renderer for eval

Loss/metric contracts:
  vanilla      (model.py:256-282):       MSE(coarse) + MSE(fine)
  autodecoder  (model_autodecoder.py:395-477): + 1e-4 * latent-norm reg
  ae_art       (model_ae_art.py:355-418): masked MSE + joint-state MSE
                                           + 0.5 * BCE opacity (both levels;
                                           the 0.5 is hard-coded upstream in
                                           opacity_loss_CE, model_ae_art.py:647
                                           — NOT the 0.05 w_opacity flag)
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from aon_tpu.core.rays import effective_intervals
from aon_tpu.core.rendering import img2mse, mse2psnr
from aon_tpu.models import ArticulatedNeRF, CodeLibraryArticulated, VanillaNeRF
from aon_tpu.train.microbatch import accumulated_grads, make_train_many
from aon_tpu.train.schedule import nerf_lr_schedule
from aon_tpu.utils.config import Config


class TrainState(train_state.TrainState):
    pass


def _dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def make_optimizer(cfg: Config):
    """Config-routed optimizer + schedule.

    The default pair (optimizer="adam", lr_scheduler="nerf_loglerp")
    reproduces the reference's live path: plain Adam(0.9, 0.999) with the
    log-lerp + sin-warmup schedule (model.py:386-419).  Anything else goes
    through the train/optim.py factories (reference utils/__init__.py:32-88
    surface, made reachable from the config — the reference parses these
    flags but never wires them).
    """
    nerf_sched = nerf_lr_schedule(
        cfg.lr_init, cfg.lr_final, cfg.lr_delay_steps, cfg.lr_delay_mult,
        # lr_max_steps pins the decay horizon independently of run_max_steps
        # (0 = coupled); past it the schedule floors at lr_final.  Added for
        # the AE 100k corrected config — see utils/config.py lr_max_steps.
        cfg.lr_max_steps or cfg.run_max_steps,
    )
    if cfg.optimizer == "adam" and cfg.lr_scheduler == "nerf_loglerp":
        return optax.adam(nerf_sched, b1=0.9, b2=0.999), nerf_sched

    from aon_tpu.train.optim import get_optimizer, get_scheduler

    if cfg.optimizer == "ranger":
        raise ValueError(
            "optimizer='ranger' (RAdam+Lookahead) needs LookaheadParams-wrapped "
            "param trees, which the training systems' checkpoint/render paths "
            "don't carry; use train/optim.get_optimizer directly for it"
        )
    if cfg.lr_scheduler == "nerf_loglerp":
        schedule = nerf_sched
    else:
        steps_per_epoch = max(1, cfg.run_max_steps // max(1, cfg.num_epochs))
        schedule = get_scheduler(
            cfg.lr_init, cfg.lr_scheduler, cfg.num_epochs, steps_per_epoch,
            decay_step=cfg.decay_step, decay_gamma=cfg.decay_gamma,
            poly_exp=cfg.poly_exp, warmup_epochs=cfg.warmup_epochs,
            warmup_multiplier=cfg.warmup_multiplier,
        )
    tx = get_optimizer(
        cfg.optimizer, cfg.lr_init, momentum=cfg.momentum,
        weight_decay=cfg.weight_decay, schedule=schedule,
    )
    return tx, schedule


def _rays_of(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: batch[k] for k in ("rays_o", "rays_d", "viewdirs")}


def _with_art_smoothness(loss_fn, weight: float):
    """Add ``weight * sum ||z_{i+1} - z_i||^2`` over the articulation table.

    The reference's test-time sweep decodes MIDPOINT latents the training
    objective never constrains (code_library.py:55-71); this term pulls
    consecutive articulation codes toward a locally linear trajectory so
    those midpoints decode to intermediate geometry.  Works with both
    loss-fn conventions: the term depends only on ``params``, so for the
    in-kernel-grad (v3) convention its gradient is added analytically.
    """

    def smooth(p):
        tbl = p["code_library"]["embedding_instance_articulation"]["embedding"]
        d = tbl[1:] - tbl[:-1]
        return weight * jnp.sum(d * d)

    if getattr(loss_fn, "returns_grads", False):

        def wrapped(params, batch, key):
            loss, aux, grads = loss_fn(params, batch, key)
            sval, sgrads = jax.value_and_grad(smooth)(params)
            grads = jax.tree.map(jnp.add, grads, sgrads)
            return loss + sval, dict(aux, reg=aux["reg"] + sval), grads

        wrapped.returns_grads = True
    else:

        def wrapped(params, batch, key):
            loss, aux = loss_fn(params, batch, key)
            sval = smooth(params)
            return loss + sval, dict(aux, reg=aux["reg"] + sval)

    return wrapped


class VanillaSystem:
    """exp_type="vanilla": single-scene NeRF on sharded ray batches."""

    def __init__(self, cfg: Config, near: float, far: float, white_bkgd: bool, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.near, self.far, self.white_bkgd = float(near), float(far), bool(white_bkgd)
        self.model = VanillaNeRF(
            num_coarse_samples=cfg.N_samples,
            num_fine_samples=cfg.N_importance,
            min_deg_point=0,
            max_deg_point=cfg.N_emb_xyz,
            deg_view=cfg.N_emb_dir,
            noise_std=cfg.noise_std,
            lindisp=cfg.lindisp,
            dtype=_dtype(cfg),
        )
        self.tx, self.lr_schedule = make_optimizer(cfg)
        self._build_steps()

    def init_state(self, key: jax.Array) -> TrainState:
        dummy = {
            "rays_o": jnp.zeros((2, 3)),
            "rays_d": jnp.ones((2, 3)),
            "viewdirs": jnp.ones((2, 3)),
        }
        variables = self.model.init(key, dummy, key, False, self.white_bkgd, self.near, self.far)
        state = TrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=self.tx
        )
        # step as a device int32 from the start: TrainState.create uses a
        # Python int whose aval changes after the first apply_gradients,
        # which would force a full retrace/recompile on step 2.
        return state.replace(step=jnp.asarray(0, jnp.int32))

    def _build_steps(self):
        model, near, far, white_bkgd = self.model, self.near, self.far, self.white_bkgd
        cfg = self.cfg

        def flax_loss_fn(params, batch, key):
            t_near_eff, t_far_eff = effective_intervals(batch, near, far)
            out = model.apply(
                {"params": params}, _rays_of(batch), key, True, white_bkgd,
                t_near_eff, t_far_eff,
            )
            loss0 = img2mse(out[0][0], batch["target"])
            loss1 = img2mse(out[1][0], batch["target"])
            loss = loss0 + loss1
            return loss, {"loss0": loss0, "loss1": loss1}

        # Fused Pallas train path (TPU). Multi-chip runs the scan-of-steps
        # inside shard_map (pallas calls don't auto-partition under jit).
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        use_fused = cfg.use_pallas and jax.default_backend() == "tpu"
        if use_fused and cfg.fused_train == "v3" and cfg.noise_std == 0:
            # v3: one kernel per level (fwd + compositing + loss + bwd);
            # computes weight grads in-kernel — no value_and_grad wrapper
            from aon_tpu.ops.train_fused_level import make_fused_step_fn

            loss_fn = make_fused_step_fn(
                near, far, white_bkgd,
                num_coarse=cfg.N_samples, num_fine=cfg.N_importance,
                max_deg=cfg.N_emb_xyz, deg_view=cfg.N_emb_dir,
                lindisp=cfg.lindisp,
            )
            loss_fn.returns_grads = True
        elif use_fused:
            from aon_tpu.ops.train_pallas import make_fused_loss_fn

            loss_fn = make_fused_loss_fn(
                near, far, white_bkgd,
                num_coarse=cfg.N_samples, num_fine=cfg.N_importance,
                max_deg=cfg.N_emb_xyz, deg_view=cfg.N_emb_dir,
                noise_std=cfg.noise_std, lindisp=cfg.lindisp,
            )
        else:
            loss_fn = flax_loss_fn
        self._fused_multichip = use_fused and n_dev > 1

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, key):
            loss, aux, grads = accumulated_grads(loss_fn, state.params, batch, key)
            state = state.apply_gradients(grads=grads)
            metrics = {
                "train/loss": loss,
                "train/psnr0": mse2psnr(aux["loss0"]),
                "train/psnr1": mse2psnr(aux["loss1"]),
            }
            return state, metrics

        def metrics_fn(loss, aux):
            return {
                "train/loss": loss,
                "train/psnr0": mse2psnr(aux["loss0"]),
                "train/psnr1": mse2psnr(aux["loss1"]),
            }

        if self._fused_multichip:
            from aon_tpu.train.microbatch import make_train_many_sharded

            self.train_many = make_train_many_sharded(loss_fn, metrics_fn, self.mesh)
            many = self.train_many

            def sharded_step(state, batch, key):
                return many(state, jax.tree.map(lambda v: v[None], batch), key)

            train_step = sharded_step
        else:
            self.train_many = make_train_many(loss_fn, metrics_fn)

        @jax.jit
        def render_chunk(params, rays):
            out = model.apply(
                {"params": params}, _rays_of(rays), None, False, white_bkgd,
                rays.get("t_near", near), rays.get("t_far", far),
            )
            comp_rgb, acc, depth = out[1]
            return {"comp_rgb": comp_rgb, "acc": acc, "depth": depth}

        self.train_step = train_step
        if self.cfg.use_pallas and jax.default_backend() == "tpu":
            from aon_tpu.ops.render_pallas import make_fused_render_fn

            fused = make_fused_render_fn(
                self.mesh, near, far, white_bkgd,
                num_coarse=self.cfg.N_samples, num_fine=self.cfg.N_importance,
                max_deg=self.cfg.N_emb_xyz, deg_view=self.cfg.N_emb_dir,
                lindisp=self.cfg.lindisp,
            )
            self.render_chunk = lambda params, rays: fused(params, rays)
        else:
            self.render_chunk = render_chunk

    def render_latents_for_eval(self, params, batch, is_test=False):
        return None  # vanilla has no latents


class AutoDecoderSystem:
    """exp_type="vanilla_autodecoder": articulated NeRF + latent code library.

    The code library is just another params subtree, so the reference's
    "optimizer over model + embeddings" (model_autodecoder.py:604-606) is the
    single optax update here.
    """

    def __init__(self, cfg: Config, near: float, far: float, white_bkgd: bool, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.near, self.far, self.white_bkgd = float(near), float(far), bool(white_bkgd)
        self.model = ArticulatedNeRF(
            num_coarse_samples=cfg.N_samples,
            num_fine_samples=cfg.N_importance,
            min_deg_point=0,
            max_deg_point=cfg.N_emb_xyz,
            deg_view=cfg.N_emb_dir,
            noise_std=cfg.noise_std,
            lindisp=cfg.lindisp,
            sigma_activation="softplus_bias",
            rgb_padding=0.001,
            density_bias=-1.0,
            dtype=_dtype(cfg),
        )
        self.code_library = CodeLibraryArticulated(
            n_max_objs=cfg.N_max_objs, n_obj_code_length=cfg.N_obj_code_length
        )
        self.tx, self.lr_schedule = make_optimizer(cfg)
        self._build_steps()

    def init_state(self, key: jax.Array) -> TrainState:
        k1, k2 = jax.random.split(key)
        dummy = {
            "rays_o": jnp.zeros((2, 3)),
            "rays_d": jnp.ones((2, 3)),
            "viewdirs": jnp.ones((2, 3)),
        }
        dummy_latents = {
            "density": jnp.zeros((1, self.cfg.N_obj_code_length)),
            "color": jnp.zeros((1, self.cfg.N_obj_code_length)),
            "articulation": jnp.zeros((1, 32)),
        }
        model_vars = self.model.init(
            k1, dummy, dummy_latents, k1, False, self.white_bkgd, self.near, self.far
        )
        lib_vars = self.code_library.init(k2, jnp.array(0), jnp.array(0))
        params = {"model": model_vars["params"], "code_library": lib_vars["params"]}
        state = TrainState.create(apply_fn=self.model.apply, params=params, tx=self.tx)
        return state.replace(step=jnp.asarray(0, jnp.int32))  # see VanillaSystem note

    def _latents(self, params, batch, is_test=False):
        return self.code_library.apply(
            {"params": params["code_library"]},
            batch["instance_id"],
            batch["articulation_id"],
            is_test=is_test,
        )

    def _build_steps(self):
        model, lib = self.model, self.code_library
        near, far, white_bkgd = self.near, self.far, self.white_bkgd
        cfg = self.cfg

        def flax_loss_fn(params, batch, key):
            latents = lib.apply(
                {"params": params["code_library"]},
                batch["instance_id"],
                batch["articulation_id"],
            )
            t_near_eff, t_far_eff = effective_intervals(batch, near, far)
            out = model.apply(
                {"params": params["model"]}, _rays_of(batch), latents, key, True,
                white_bkgd, t_near_eff, t_far_eff,
            )
            w = batch.get("loss_w")  # mean-1 importance weights or None
            if w is None:
                loss0 = img2mse(out[0][0], batch["target"])
                loss1 = img2mse(out[1][0], batch["target"])
            else:
                w = w.reshape(-1, 1)
                loss0 = jnp.mean(w * (out[0][0] - batch["target"]) ** 2)
                loss1 = jnp.mean(w * (out[1][0] - batch["target"]) ** 2)
            # latent-norm regularization (model_autodecoder.py:456-466):
            # torch.norm(code, dim=0) over a (1, C) code == per-channel |x|.
            reg = (
                jnp.mean(jnp.linalg.norm(latents["density"], axis=0))
                + jnp.mean(jnp.linalg.norm(latents["color"], axis=0))
                + jnp.mean(jnp.linalg.norm(latents["articulation"], axis=0))
            )
            reg = 1e-4 * reg
            loss = loss0 + loss1 + reg
            return loss, {"loss0": loss0, "loss1": loss1, "reg": reg}

        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        use_fused = cfg.use_pallas and jax.default_backend() == "tpu"
        if use_fused and cfg.fused_train == "v3" and cfg.noise_std == 0:
            # v3: one kernel per level (fwd + compositing + loss + bwd with
            # live activations); grads computed in-kernel
            from aon_tpu.ops.train_fused_level_art import (
                make_fused_autodecoder_step_fn,
            )

            loss_fn = make_fused_autodecoder_step_fn(
                lib.apply, near, far, white_bkgd,
                num_coarse=cfg.N_samples, num_fine=cfg.N_importance,
                lindisp=cfg.lindisp,
            )
        elif use_fused:
            from aon_tpu.ops.train_art_pallas import make_fused_autodecoder_loss_fn

            loss_fn = make_fused_autodecoder_loss_fn(
                lib.apply, near, far, white_bkgd,
                num_coarse=cfg.N_samples, num_fine=cfg.N_importance,
                lindisp=cfg.lindisp,
            )
        else:
            loss_fn = flax_loss_fn
        if cfg.art_code_smoothness > 0:
            loss_fn = _with_art_smoothness(loss_fn, cfg.art_code_smoothness)
        self._fused_multichip = use_fused and n_dev > 1

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, key):
            loss, aux, grads = accumulated_grads(loss_fn, state.params, batch, key)
            state = state.apply_gradients(grads=grads)
            metrics = {
                "train/loss": loss,
                "train/loss/reg": aux["reg"],
                "train/psnr0": mse2psnr(aux["loss0"]),
                "train/psnr1": mse2psnr(aux["loss1"]),
            }
            return state, metrics

        def metrics_fn(loss, aux):
            return {
                "train/loss": loss,
                "train/loss/reg": aux["reg"],
                "train/psnr0": mse2psnr(aux["loss0"]),
                "train/psnr1": mse2psnr(aux["loss1"]),
            }

        if self._fused_multichip:
            from aon_tpu.train.microbatch import make_train_many_sharded

            self.train_many = make_train_many_sharded(loss_fn, metrics_fn, self.mesh)
            many = self.train_many

            def sharded_step(state, batch, key):
                return many(state, jax.tree.map(lambda v: v[None], batch), key)

            train_step = sharded_step
        else:
            self.train_many = make_train_many(loss_fn, metrics_fn)

        @functools.partial(jax.jit, static_argnames=("is_test",))
        def render_chunk(params, rays, instance_id, articulation_id, is_test=False):
            latents = lib.apply(
                {"params": params["code_library"]}, instance_id, articulation_id,
                is_test=is_test,
            )
            out = model.apply(
                {"params": params["model"]}, _rays_of(rays), latents, None, False,
                white_bkgd, rays.get("t_near", near), rays.get("t_far", far),
            )
            comp_rgb, acc, depth = out[1]
            return {"comp_rgb": comp_rgb, "acc": acc, "depth": depth}

        self.train_step = train_step
        if use_fused:
            from aon_tpu.ops.train_art_pallas import make_fused_art_render_fn

            self.render_chunk = make_fused_art_render_fn(
                lib.apply, self.mesh, near, far, white_bkgd,
                num_coarse=cfg.N_samples, num_fine=cfg.N_importance,
                lindisp=cfg.lindisp,
            )
        else:
            self.render_chunk = render_chunk


def build_system(cfg: Config, near: float, far: float, white_bkgd: bool, mesh=None):
    if cfg.exp_type == "vanilla":
        return VanillaSystem(cfg, near, far, white_bkgd, mesh=mesh)
    if cfg.exp_type == "vanilla_autodecoder":
        return AutoDecoderSystem(cfg, near, far, white_bkgd, mesh=mesh)
    if cfg.exp_type == "vanilla_ae_art":
        from aon_tpu.train.system_ae import AutoEncoderSystem

        return AutoEncoderSystem(cfg, near, far, white_bkgd, mesh=mesh)
    raise ValueError(f"unknown exp_type: {cfg.exp_type}")
