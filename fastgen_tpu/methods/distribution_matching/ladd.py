"""LADD: latent adversarial diffusion distillation — pure GAN distillation
(ref ``fastgen/methods/distribution_matching/ladd.py``).

DMD2 without the fake score: the student phase minimizes only the
non-saturating generator loss over teacher-feature discriminator heads; the
critic phase trains the discriminator (+ approximate R1)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fastgen_tpu.configs.opt import make_optimizer
from fastgen_tpu.methods.common_loss import (
    gan_loss_discriminator,
    gan_loss_generator,
    mse,
)
from fastgen_tpu.methods.distribution_matching.dmd2 import DMD2Model
from fastgen_tpu.utils import instantiate
from fastgen_tpu.utils import logging_utils as logger


class LADDModel(DMD2Model):
    def build_model(self):
        # skip DMD2's fake_score; keep net/teacher/discriminator
        super(DMD2Model, self).build_model()
        self.build_teacher()
        logger.info("Instantiating the discriminator")
        self.nets["discriminator"] = instantiate(self.config.discriminator)

    def post_init_params(self, params):
        return params  # no fake_score to seed

    def init_optimizers(self):
        super(DMD2Model, self).init_optimizers()
        self.txs["discriminator"] = make_optimizer(
            self.config.discriminator_optimizer, self.config.discriminator_scheduler)

    def trainable_keys(self, phase: str) -> Tuple[str, ...]:
        return ("net",) if phase == "student" else ("discriminator",)

    def _student_update_step(self, params, input_student, t_student, t, eps,
                             batch, condition, neg_condition, rng):
        """Generator GAN loss only (ref ``ladd.py:104-148``)."""
        ns = self.net.noise_scheduler
        gen_data = self.gen_data_from_net(params, input_student, t_student,
                                          condition, rng)
        perturbed = ns.forward_process(gen_data, eps, t)
        fake_feat = self._teacher_features_only(params, perturbed, t, condition)
        gan_loss_gen = gan_loss_generator(
            self.nets["discriminator"].apply(params["discriminator"], fake_feat))
        loss_map = {"total_loss": gan_loss_gen, "gan_loss_gen": gan_loss_gen}
        return loss_map, self._get_outputs(gen_data, input_student)

    def _critic_update_step(self, params, input_student, t_student, t, eps,
                            real_data, condition, rng):
        """Discriminator + approximate R1 (ref ``ladd.py:220-260`` region)."""
        ns = self.net.noise_scheduler
        k_drop, k_real, k_r1 = jax.random.split(rng, 3)
        gen_data = jax.lax.stop_gradient(
            self.gen_data_from_net(params, input_student, t_student, condition, k_drop))
        x_t_sg = ns.forward_process(gen_data, eps, t)
        fake_feat = jax.lax.stop_gradient(
            self._teacher_features_only(params, x_t_sg, t, condition))
        real_feat, t_real = self._compute_real_feat(params, real_data, t, eps,
                                                    condition, k_real)
        real_feat = jax.lax.stop_gradient(real_feat)
        disc = self.nets["discriminator"]
        real_logit = disc.apply(params["discriminator"], real_feat)
        fake_logit = disc.apply(params["discriminator"], fake_feat)
        gan_loss_disc = gan_loss_discriminator(real_logit, fake_logit)

        gan_loss_ar1 = jnp.zeros((), jnp.float32)
        if self.config.gan_r1_reg_weight > 0:
            perturbed_alpha = real_data + self.config.gan_r1_reg_alpha * \
                jax.random.normal(k_r1, real_data.shape, real_data.dtype)
            alpha_feat = jax.lax.stop_gradient(
                self._teacher_features_only(params, perturbed_alpha, t_real, condition))
            gan_loss_ar1 = mse(real_logit, disc.apply(params["discriminator"], alpha_feat))

        loss = gan_loss_disc + self.config.gan_r1_reg_weight * gan_loss_ar1
        loss_map = {"total_loss": loss, "gan_loss_disc": gan_loss_disc}
        if self.config.gan_r1_reg_weight > 0:
            loss_map["gan_loss_ar1"] = gan_loss_ar1
        return loss_map, self._get_outputs(gen_data, input_student)
