"""Auto-encoder articulated system (exp_type="vanilla_ae_art").

Contract from reference ``models/vanilla_nerf/model_ae_art.py:209-418``:

* latents come from a ResNet-34 multi-head encoder on the seg-masked source
  image (``self.model.encode(src_imgs)``, :361);
* joint state is regressed from the articulation latent
  (``JointStateDecoder``, :366) with an MSE loss against the GT radians;
* the NeRF conditions on a degree-indexed embedding (``nn.Embedding(91, 32)``
  of round(rad2deg(deg)), :367-369) — ``embed_deg=True``;
* photometric MSE is masked to instance pixels (:380-387);
* opacity loss: 0.5 * [BCEWithLogits(acc0, mask) + BCEWithLogits(acc1,
  mask)] — lambda 0.5 is hard-coded INSIDE ``opacity_loss_CE``
  (:646-663), not the 0.05 a reader might infer elsewhere; the reference
  feeds acc, already in [0,1], as "logits" (reproduced faithfully).
  Getting this 10x wrong leaves the scene trapped in object-colored fog:
  once acc saturates everywhere, d(acc)/d(alpha) = T_total/u ~ 0 and a
  weak opacity term can never clear it;
* activations: plain ReLU sigma, un-padded sigmoid rgb (:232-233, 289-292).

Reference bug NOT reproduced: model_ae_art.py:294 unpacks 3 of 4 values
from volumetric_rendering and would crash at runtime; we keep correct
plumbing.  Reference quirk noted: the deg-embedding latent key is the
consistent typo ``artifuclaiton_deg`` upstream (written :369,:503 and
read :154), so it functions; we spell it ``articulation_deg``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn

from aon_tpu.core.rays import effective_intervals
from aon_tpu.core.rendering import mse2psnr
from aon_tpu.models import ArticulatedNeRF, JointStateDecoder
from aon_tpu.models.resnet import ImgEncoderMultiHeadArt
from aon_tpu.train.microbatch import accumulated_grads
from aon_tpu.train.systems import TrainState, _dtype, _rays_of, make_optimizer
from aon_tpu.utils.config import Config

OPACITY_LAMBDA = 0.5  # hard-coded inside reference opacity_loss_CE (:647)
N_DEG_EMBEDDINGS = 91  # 0..90 inclusive (model_ae_art.py:240)


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch BCEWithLogitsLoss (mean reduction)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


class DegEmbedding(nn.Module):
    @nn.compact
    def __call__(self, deg_idx: jnp.ndarray) -> jnp.ndarray:
        tbl = nn.Embed(N_DEG_EMBEDDINGS, 32, name="deg_embedding")
        return tbl(jnp.atleast_1d(deg_idx))


class AutoEncoderSystem:
    def __init__(self, cfg: Config, near: float, far: float, white_bkgd: bool, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.near, self.far, self.white_bkgd = float(near), float(far), bool(white_bkgd)
        # sigma activation: reference relu, or the fast-path softplus escape
        # (Config.ae_sigma_activation; see config.py for the BCE level-death
        # analysis).  density_bias -1.0 under softplus matches the
        # reference's auto-decoder contract (model_autodecoder.py:265-267).
        self.sigma_act = getattr(cfg, "ae_sigma_activation", "relu")
        self.density_bias = -1.0 if self.sigma_act == "softplus_bias" else 0.0
        self.model = ArticulatedNeRF(
            num_coarse_samples=cfg.N_samples,
            num_fine_samples=cfg.N_importance,
            min_deg_point=0,
            max_deg_point=cfg.N_emb_xyz,
            deg_view=cfg.N_emb_dir,
            noise_std=cfg.noise_std,
            lindisp=cfg.lindisp,
            sigma_activation=self.sigma_act,
            density_bias=self.density_bias,
            rgb_padding=0.0,
            use_deg_embedding=True,
            dtype=_dtype(cfg),
        )
        self.encoder = ImgEncoderMultiHeadArt(dtype=_dtype(cfg))
        self.joint_state = JointStateDecoder()
        self.deg_embedding = DegEmbedding()
        self.tx, self.lr_schedule = make_optimizer(cfg)
        self._build_steps()

    def init_state(self, key: jax.Array) -> TrainState:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        dummy_rays = {
            "rays_o": jnp.zeros((2, 3)),
            "rays_d": jnp.ones((2, 3)),
            "viewdirs": jnp.ones((2, 3)),
        }
        dummy_latents = {
            "density": jnp.zeros((1, 128)),
            "color": jnp.zeros((1, 128)),
            "articulation_deg": jnp.zeros((1, 32)),
        }
        w, h = self.cfg.img_wh
        params = {
            "model": self.model.init(
                k1, dummy_rays, dummy_latents, k1, False, self.white_bkgd, self.near, self.far
            )["params"],
            "encoder": self.encoder.init(k2, jnp.zeros((1, 3, h, w)))["params"],
            "joint_state": self.joint_state.init(k3, jnp.zeros((1, 32)))["params"],
            "deg_embedding": self.deg_embedding.init(k4, jnp.array(0))["params"],
        }
        params["encoder"] = self._maybe_pretrained_encoder(params["encoder"])
        state = TrainState.create(apply_fn=self.model.apply, params=params, tx=self.tx)
        return state.replace(step=jnp.asarray(0, jnp.int32))

    @staticmethod
    def _maybe_pretrained_encoder(encoder_params):
        """Overlay converted torchvision ResNet-34 weights when available
        (reference inits from ImageNet resnet34, resnet_encoder.py:311).
        Path: $AON_RESNET_WEIGHTS or weights/resnet34.npz in the repo."""
        import os

        path = os.environ.get("AON_RESNET_WEIGHTS")
        if not (path and os.path.exists(path)):
            here = os.path.join(
                os.path.dirname(__file__), "..", "..", "weights", "resnet34.npz"
            )
            path = os.path.abspath(here)
        if os.path.exists(path):
            print(f"initializing AE encoder backbone from {path}")
            return ImgEncoderMultiHeadArt.params_from_npz(encoder_params, path)
        return encoder_params

    def _encode(self, params, src_imgs, deg):
        latents = self.encoder.apply({"params": params["encoder"]}, src_imgs)
        pred_state = self.joint_state.apply(
            {"params": params["joint_state"]}, latents["articulation"]
        )
        state_deg = jnp.clip(
            jnp.round(jnp.rad2deg(deg)).astype(jnp.int32), 0, N_DEG_EMBEDDINGS - 1
        )
        latents["articulation_deg"] = self.deg_embedding.apply(
            {"params": params["deg_embedding"]}, state_deg
        )
        return latents, pred_state

    def _build_steps(self):
        model = self.model
        cfg = self.cfg
        near, far, white_bkgd = self.near, self.far, self.white_bkgd
        use_fused = cfg.use_pallas and jax.default_backend() == "tpu"
        self._fused_multichip = use_fused and (
            self.mesh is not None and self.mesh.devices.size > 1
        )

        def flax_or_v2_loss_fn(params, batch, key):
            src = batch["src_imgs"]
            if src.ndim == 3:
                src = src[None]
            latents, pred_state = self._encode(params, src, batch["deg"])
            if use_fused:
                from aon_tpu.ops.train_art_pallas import fused_two_level_train

                (c0, a0), (c1, a1) = fused_two_level_train(
                    params["model"], latents, batch, key, near, far, white_bkgd,
                    cfg.N_samples, cfg.N_importance,
                    sigma_activation=self.sigma_act, rgb_padding=0.0,
                    density_bias=self.density_bias, lindisp=cfg.lindisp,
                )
                out = [(c0, a0), (c1, a1)]
            else:
                t_near_eff, t_far_eff = effective_intervals(batch, near, far)
                out = model.apply(
                    {"params": params["model"]}, _rays_of(batch), latents, key, True,
                    white_bkgd, t_near_eff, t_far_eff,
                )
            mask = batch["instance_mask"].reshape(-1, 1)  # (B, 1) float
            mask3 = jnp.broadcast_to(mask, batch["target"].shape)
            denom = batch.get("photo_denom")
            if denom is None:  # unaccumulated call: the batch IS the whole batch
                denom = jnp.maximum(jnp.sum(mask3), 1.0)
            bg_l = float(cfg.bg_loss_lambda)
            bg_scale = batch.get("bg_scale", 1.0)  # warmup ramp (trainer.fit)
            denom_bg = batch.get("photo_denom_bg")
            if denom_bg is None:
                denom_bg = jnp.maximum(jnp.sum(1.0 - mask3), 1.0)

            def masked_mse(pred):
                # reference objective (model_ae_art.py:380-387) plus the
                # optional background-MSE term (Config.bg_loss_lambda) —
                # background is otherwise supervised only by the BCE quirk
                err2 = (pred - batch["target"]) ** 2
                loss = jnp.sum(err2 * mask3) / denom
                if bg_l != 0.0:
                    loss = loss + bg_l * bg_scale * jnp.sum(
                        err2 * (1.0 - mask3)
                    ) / denom_bg
                return loss

            loss0 = masked_mse(out[0][0])
            loss1 = masked_mse(out[1][0])
            loss_state = jnp.mean((pred_state - batch["deg"]) ** 2)
            opacity = OPACITY_LAMBDA * (
                _bce_with_logits(out[0][1], mask[:, 0])
                + _bce_with_logits(out[1][1], mask[:, 0])
            )
            loss = loss0 + loss1 + loss_state + opacity
            return loss, {
                "loss0": loss0,
                "loss1": loss1,
                "loss_state": loss_state,
                "opacity_loss": opacity,
            }

        def _prepare_shared(batch, axis_name=None):
            """Whole-batch masked-MSE denominator (model_ae_art.py:380-387),
            pre-divided by (k microbatches x n chips) so the accumulator's
            1/k mean and the cross-chip pmean recompose it exactly."""
            k = 1 if batch["rays_o"].ndim == 2 else batch["rays_o"].shape[0]
            m = batch["instance_mask"].astype(jnp.float32)
            s = 3.0 * jnp.sum(m)
            s_bg = 3.0 * jnp.sum(1.0 - m)
            n = 1
            if axis_name is not None:
                s = jax.lax.psum(s, axis_name)
                s_bg = jax.lax.psum(s_bg, axis_name)
                n = jax.lax.axis_size(axis_name)
            return {
                "photo_denom": jnp.maximum(s, 1.0) / (k * n),
                "photo_denom_bg": jnp.maximum(s_bg, 1.0) / (k * n),
            }

        flax_or_v2_loss_fn.prepare_shared = _prepare_shared

        if use_fused and cfg.fused_train == "v3" and cfg.noise_std == 0:
            # v3: one kernel per level (fwd + compositing + masked MSE +
            # opacity BCE + bwd with live activations), encoder grads via vjp
            from aon_tpu.ops.train_fused_level_art import make_fused_ae_step_fn

            def encode_fn(enc_params, src, deg):
                return self._encode(enc_params, src, deg)

            loss_fn = make_fused_ae_step_fn(
                encode_fn, near, far, white_bkgd,
                num_coarse=cfg.N_samples, num_fine=cfg.N_importance,
                opacity_lambda=OPACITY_LAMBDA, lindisp=cfg.lindisp,
                bg_lambda=float(cfg.bg_loss_lambda),
                sigma_act=self.sigma_act, density_bias=self.density_bias,
            )
        else:
            loss_fn = flax_or_v2_loss_fn

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, key):
            loss, aux, grads = accumulated_grads(loss_fn, state.params, batch, key)
            state = state.apply_gradients(grads=grads)
            metrics = {
                "train/loss": loss,
                "train/loss_state": aux["loss_state"],
                "train/opacity_loss": aux["opacity_loss"],
                "train/psnr0": mse2psnr(aux["loss0"]),
                "train/psnr1": mse2psnr(aux["loss1"]),
            }
            return state, metrics

        def metrics_fn(loss, aux):
            return {
                "train/loss": loss,
                "train/loss_state": aux["loss_state"],
                "train/opacity_loss": aux["opacity_loss"],
                "train/psnr0": mse2psnr(aux["loss0"]),
                "train/psnr1": mse2psnr(aux["loss1"]),
            }

        if self._fused_multichip:
            from aon_tpu.train.microbatch import make_train_many_sharded

            self.train_many = make_train_many_sharded(loss_fn, metrics_fn, self.mesh)
            many = self.train_many

            def sharded_step(state, batch, key):
                return many(state, jax.tree.map(lambda v: v[None], batch), key)

            self.train_step = sharded_step
        else:
            from aon_tpu.train.microbatch import make_train_many

            self.train_many = make_train_many(loss_fn, metrics_fn)

        @jax.jit
        def render_chunk(params, rays, src_imgs, deg):
            latents, pred_state = self._encode(params, src_imgs, deg)
            if use_fused:
                from aon_tpu.core import sampling
                from aon_tpu.core.rendering import volumetric_rendering
                from aon_tpu.ops.fused_art import fused_art_mlp_eval

                def level(mlp_params, t_vals, samples):
                    raw_rgb, raw_sigma = fused_art_mlp_eval(
                        mlp_params, latents, samples, rays["viewdirs"]
                    )
                    if self.sigma_act == "softplus_bias":
                        sigma = jax.nn.softplus(raw_sigma + self.density_bias)
                    else:
                        sigma = jax.nn.relu(raw_sigma)
                    return volumetric_rendering(
                        jax.nn.sigmoid(raw_rgb), sigma,
                        t_vals, rays["rays_d"], white_bkgd=white_bkgd,
                    )

                t_vals, samples = sampling.sample_along_rays(
                    None, rays["rays_o"], rays["rays_d"], cfg.N_samples,
                    rays.get("t_near", near), rays.get("t_far", far),
                    randomized=False, lindisp=cfg.lindisp,
                )
                _, _, weights, _ = level(params["model"]["coarse_mlp"], t_vals, samples)
                t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
                t_vals, samples = sampling.sample_pdf(
                    None, t_mids, weights[..., 1:-1], rays["rays_o"], rays["rays_d"],
                    t_vals, cfg.N_importance, randomized=False,
                )
                comp_rgb, acc, _, depth = level(
                    params["model"]["fine_mlp"], t_vals, samples
                )
            else:
                out = model.apply(
                    {"params": params["model"]}, _rays_of(rays), latents, None, False,
                    white_bkgd, rays.get("t_near", near), rays.get("t_far", far),
                )
                comp_rgb, acc, depth = out[1]
            return {
                "comp_rgb": comp_rgb,
                "acc": acc,
                "depth": depth,
                "pred_state": jnp.broadcast_to(pred_state.reshape(-1)[:1], comp_rgb.shape[:1]),
            }

        if not self._fused_multichip:  # sharded_step already bound above
            self.train_step = train_step
        self.render_chunk = render_chunk
