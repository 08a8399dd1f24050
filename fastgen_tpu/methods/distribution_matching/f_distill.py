"""f-distill: f-divergence-weighted distribution matching
(ref ``fastgen/methods/distribution_matching/f_distill.py``).

The density-ratio weighting h(r) comes from the discriminator logits; the
per-t-bin EMA normalization (reference: a ``bins`` buffer on the net with
``all_reduce`` over ranks, ``f_distill.py:72-98``) becomes a variable
collection in the state updated through the ``_variable_updates`` channel —
under GSPMD the bin statistics are computed on the *global* batch, so the
explicit all_reduce disappears."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastgen_tpu.methods.common_loss import (
    gan_loss_generator,
    variational_score_distillation_loss,
)
from fastgen_tpu.methods.distribution_matching.dmd2 import DMD2Model
from fastgen_tpu.utils import logging_utils as logger

# f-divergence weighting functions of the density ratio r (ref ``f_distill.py:20-28``)
ALL_F_DIV_WEIGHTING = {
    "rkl": lambda r: jnp.ones_like(r),
    "kl": lambda r: r,
    "js": lambda r: 1 - 1 / (1 + r),
    "sf": lambda r: 1 / (1 + r),
    "neyman": lambda r: 1 / jnp.maximum(r, 1e-8),
    "sh": lambda r: r**0.5,
    "jf": lambda r: 1 + r,
}


class FdistillModel(DMD2Model):
    def __init__(self, config):
        super().__init__(config)
        assert config.gan_loss_weight_gen > 0, "f-distill requires gan_loss_weight_gen > 0"
        assert config.f_distill.f_div in ALL_F_DIV_WEIGHTING, (
            f"Unsupported f-divergence {config.f_distill.f_div}")
        logger.info(f"Using {config.f_distill.f_div}-divergence")
        self.f_div_weighting_function = ALL_F_DIV_WEIGHTING[config.f_distill.f_div]

    def post_init_params(self, params):
        params = super().post_init_params(params)
        if self.config.f_distill.ratio_normalization:
            params = dict(params)
            params["net"] = {**params["net"],
                             "fdistill": {"bins": jnp.ones(self.config.f_distill.bin_num)}}
        return params

    def _get_f_div_weighting_h(self, params, fake_logits, t):
        """h weighting + new bins (ref ``f_distill.py:59-111``)."""
        fd = self.config.f_distill
        logits32 = fake_logits.astype(jnp.float32)
        clamped = jnp.clip(logits32.mean(axis=1), -10.0, 10.0)
        ratio = jax.lax.stop_gradient(jnp.exp(clamped))
        ratio = jnp.clip(ratio, fd.ratio_lower, fd.ratio_upper)

        new_bins = None
        if fd.ratio_normalization:
            ns = self.net.noise_scheduler
            bin_num = fd.bin_num
            bin_width = (ns.max_t - ns.min_t) / bin_num
            idx = jnp.clip(jnp.floor((t.astype(jnp.float32) - ns.min_t) / bin_width)
                           .astype(jnp.int32), 0, bin_num - 1)
            cnt = jnp.bincount(idx, length=bin_num).astype(jnp.float32)
            ratio_sum = jnp.bincount(idx, weights=ratio, length=bin_num).astype(jnp.float32)
            valid = cnt > 0
            new_vals = ratio_sum / (cnt + 1e-6)
            bins = params["net"]["fdistill"]["bins"].astype(jnp.float32)
            new_bins = jnp.where(valid,
                                 bins * fd.ratio_ema_rate + (1 - fd.ratio_ema_rate) * new_vals,
                                 bins)
            ratio = ratio / (new_bins[idx] + 1e-6)

        h = self.f_div_weighting_function(ratio)
        h = h / (h.mean() + 1e-6)
        return h.astype(fake_logits.dtype), new_bins

    def _student_update_step(self, params, input_student, t_student, t, eps,
                             batch, condition, neg_condition, rng):
        """(ref ``f_distill.py:113-182``)."""
        ns = self.net.noise_scheduler
        k_drop, _ = jax.random.split(rng)
        gen_data = self.gen_data_from_net(params, input_student, t_student,
                                          condition, k_drop)
        perturbed = ns.forward_process(gen_data, eps, t)
        fake_score_x0 = jax.lax.stop_gradient(
            self.apply_net(params, "fake_score", perturbed, t,
                           condition=condition, fwd_pred_type="x0"))
        teacher_x0, fake_feat = self._teacher_x0_and_features(
            params, perturbed, t, condition, with_features=True)
        teacher_x0 = jax.lax.stop_gradient(teacher_x0)
        fake_logits = self.nets["discriminator"].apply(params["discriminator"],
                                                       fake_feat)
        gan_loss_gen = gan_loss_generator(fake_logits)

        if self.config.guidance_scale is not None:
            teacher_x0 = self._apply_cfg(params, jax.lax.stop_gradient(perturbed), t,
                                         teacher_x0, neg_condition)

        h, new_bins = self._get_f_div_weighting_h(params, fake_logits, t)
        f_distill_loss = variational_score_distillation_loss(
            gen_data, teacher_x0, fake_score_x0, additional_scale=h)
        loss = f_distill_loss + self.config.gan_loss_weight_gen * gan_loss_gen

        is_rkl = self.config.f_distill.f_div == "rkl"
        loss_map = {
            "total_loss": loss, "f_distill_loss": f_distill_loss,
            "gan_loss_gen": gan_loss_gen,
            "min_h": jnp.asarray(1.0) if is_rkl else h.min(),
            "avg_h": jnp.asarray(1.0) if is_rkl else h.mean(),
            "max_h": jnp.asarray(1.0) if is_rkl else h.max(),
        }
        outputs = self._get_outputs(gen_data, input_student)
        if new_bins is not None:
            outputs["_variable_updates"] = {"net": {"fdistill": {"bins": new_bins}}}
        return loss_map, outputs
