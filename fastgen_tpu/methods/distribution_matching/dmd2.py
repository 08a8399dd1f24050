"""DMD2: distribution matching distillation with GAN loss
(ref ``fastgen/methods/distribution_matching/dmd2.py``).

Three networks: student ``net``, frozen ``teacher``, trainable ``fake_score``
(+ optional discriminator heads over teacher features). Phase alternation
(student step every ``student_update_freq`` iters, otherwise fake-score +
discriminator step, ref ``dmd2.py:448-455``) is Python-level: the trainer
compiles one XLA program per phase and routes by iteration.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fastgen_tpu.configs.opt import make_optimizer
from fastgen_tpu.methods.base import FastGenModel, convert_cfg_to_dict
from fastgen_tpu.methods.common_loss import (
    denoising_score_matching_loss,
    gan_loss_discriminator,
    gan_loss_generator,
    variational_score_distillation_loss,
    mse,
)
from fastgen_tpu.utils import instantiate
from fastgen_tpu.utils import logging_utils as logger


class DMD2Model(FastGenModel):
    def build_model(self):
        super().build_model()
        self.build_teacher()
        logger.info("Instantiating the fake_score (teacher architecture)")
        teacher_cfg = self.config.teacher if self.config.teacher is not None else self.config.net
        self.nets["fake_score"] = instantiate(teacher_cfg)
        if self.config.gan_loss_weight_gen > 0:
            logger.info("Instantiating the discriminator")
            self.nets["discriminator"] = instantiate(self.config.discriminator)

    def post_init_params(self, params):
        # fake_score starts from the teacher's weights (ref ``dmd2.py:45-54``)
        params = dict(params)
        params["fake_score"] = jax.tree_util.tree_map(jnp.copy, params["teacher"])
        return params

    def init_optimizers(self):
        super().init_optimizers()
        self.txs["fake_score"] = make_optimizer(self.config.fake_score_optimizer,
                                                self.config.fake_score_scheduler)
        if self.config.gan_loss_weight_gen > 0:
            self.txs["discriminator"] = make_optimizer(
                self.config.discriminator_optimizer, self.config.discriminator_scheduler)

    # ------------------------------------------------------------- structure
    @property
    def phases(self) -> Tuple[str, ...]:
        return ("student", "critic")

    def phase_for_iteration(self, iteration: int) -> str:
        return "student" if iteration % self.config.student_update_freq == 0 else "critic"

    def trainable_keys(self, phase: str) -> Tuple[str, ...]:
        if phase == "student":
            return ("net",)
        if self.config.gan_loss_weight_gen > 0:
            return ("fake_score", "discriminator")
        return ("fake_score",)

    def _init_net_params(self, key, net_key, rng, params_so_far=None):
        if net_key == "discriminator":
            disc = self.nets["discriminator"]
            feats = self._example_features(disc, params_so_far)
            return disc.init({"params": rng}, feats)
        return super()._init_net_params(key, net_key, rng, params_so_far)

    def _example_features(self, disc, params_so_far=None):
        """Features with the teacher's true shapes for discriminator init."""
        teacher = self.nets["teacher"]
        if params_so_far and "teacher" in params_so_far:
            batch = self.example_batch(batch_size=1)
            x = batch["real"]
            t = jnp.ones((x.shape[0],), jnp.float32)
            shapes = jax.eval_shape(
                lambda p: teacher.apply(
                    p, x, t, condition=batch.get("condition"),
                    feature_indices=disc.resolved_feature_indices,
                    return_features_early=True),
                params_so_far["teacher"])
            return [jnp.zeros(s.shape, self.precision) for s in shapes]
        return [jnp.zeros((1, disc.all_res[i], disc.all_res[i], disc.in_channels),
                          self.precision)
                for i in disc.resolved_feature_indices]

    # ------------------------------------------------------------- the steps
    def _generate_noise_and_time(self, rng, real_data):
        """(input_student, t_student, t, eps) (ref ``dmd2.py:79-122``)."""
        batch_size = real_data.shape[0]
        ns = self.net.noise_scheduler
        k_stud, k_tlist, k_t, k_eps = jax.random.split(rng, 4)
        eps_student = jax.random.normal(k_stud, (batch_size,) + self.input_shape,
                                        real_data.dtype)
        if self.config.student_sample_steps == 1:
            t_student = jnp.full((batch_size,), ns.max_t, jnp.float32)
            input_student = ns.latents(eps_student)
        else:
            t_student = ns.sample_from_t_list(
                k_tlist, batch_size, sample_steps=self.config.student_sample_steps,
                t_list=self.config.sample_t_cfg.t_list)
            input_student = ns.forward_process(real_data, eps_student, t_student)
        t = ns.sample_t(k_t, batch_size, **convert_cfg_to_dict(self.config.sample_t_cfg))
        eps = jax.random.normal(k_eps, real_data.shape, real_data.dtype)
        return input_student, t_student, t, eps

    def gen_data_from_net(self, params, input_student, t_student, condition, rng):
        return self.apply_net(params, "net", input_student, t_student,
                              condition=condition, fwd_pred_type="x0",
                              train=True, rngs={"dropout": rng})

    def _teacher_x0_and_features(self, params, perturbed, t, condition,
                                 with_features: bool):
        if with_features:
            disc = self.nets["discriminator"]
            out, feats = self.apply_net(
                params, "teacher", perturbed, t, condition=condition,
                fwd_pred_type="x0", feature_indices=disc.resolved_feature_indices)
            return out, feats
        out = self.apply_net(params, "teacher", perturbed, t, condition=condition,
                             fwd_pred_type="x0")
        return out, None

    def _teacher_features_only(self, params, perturbed, t, condition):
        disc = self.nets["discriminator"]
        return self.apply_net(
            params, "teacher", perturbed, t, condition=condition,
            feature_indices=disc.resolved_feature_indices,
            return_features_early=True)

    def _apply_cfg(self, params, perturbed, t, teacher_x0, neg_condition):
        """Classifier-free guidance on the teacher (ref ``dmd2.py:158-185``)."""
        kwargs = {}
        if self.config.skip_layers is not None:
            kwargs["skip_layers"] = tuple(self.config.skip_layers)
        teacher_x0_neg = self.apply_net(params, "teacher", perturbed, t,
                                        condition=neg_condition,
                                        fwd_pred_type="x0", **kwargs)
        g = self.config.guidance_scale
        return teacher_x0 + (g - 1) * (teacher_x0 - jax.lax.stop_gradient(teacher_x0_neg))

    def compute_losses(self, params, batch, rng, iteration, phase):
        real_data, condition, neg_condition = self._prepare_training_data(batch)
        k_gen, k_step, k_drop = jax.random.split(rng, 3)
        input_student, t_student, t, eps = self._generate_noise_and_time(k_gen, real_data)
        ns = self.net.noise_scheduler

        if phase == "student":
            return self._student_update_step(
                params, input_student, t_student, t, eps, batch,
                condition=condition, neg_condition=neg_condition, rng=k_step)
        return self._critic_update_step(
            params, input_student, t_student, t, eps, real_data,
            condition=condition, rng=k_step)

    def _student_update_step(self, params, input_student, t_student, t, eps,
                             batch, condition, neg_condition, rng):
        """(ref ``dmd2.py:187-248``)."""
        ns = self.net.noise_scheduler
        k_drop, k_r1 = jax.random.split(rng)
        gen_data = self.gen_data_from_net(params, input_student, t_student,
                                          condition, k_drop)
        perturbed = ns.forward_process(gen_data, eps, t)

        fake_score_x0 = jax.lax.stop_gradient(
            self.apply_net(params, "fake_score", perturbed, t,
                           condition=condition, fwd_pred_type="x0"))

        use_gan = self.config.gan_loss_weight_gen > 0
        teacher_x0, fake_feat = self._teacher_x0_and_features(
            params, perturbed, t, condition, with_features=use_gan)
        teacher_x0 = jax.lax.stop_gradient(teacher_x0)
        if use_gan:
            disc_logits = self.nets["discriminator"].apply(
                params["discriminator"], fake_feat)
            gan_loss_gen = gan_loss_generator(disc_logits)
        else:
            gan_loss_gen = jnp.zeros((), jnp.float32)

        if self.config.guidance_scale is not None:
            teacher_x0 = self._apply_cfg(params, jax.lax.stop_gradient(perturbed), t,
                                         teacher_x0, neg_condition)

        vsd_loss = variational_score_distillation_loss(gen_data, teacher_x0,
                                                       fake_score_x0)
        loss = vsd_loss + self.config.gan_loss_weight_gen * gan_loss_gen
        loss_map = {"total_loss": loss, "vsd_loss": vsd_loss,
                    "gan_loss_gen": gan_loss_gen}
        outputs = self._get_outputs(gen_data, input_student)
        return loss_map, outputs

    def _compute_real_feat(self, params, real_data, t, eps, condition, rng):
        """(ref ``dmd2.py:250-285``)."""
        ns = self.net.noise_scheduler
        if self.config.gan_use_same_t_noise:
            t_real, eps_real = t, eps
        else:
            k_t, k_eps = jax.random.split(rng)
            t_real = ns.sample_t(k_t, real_data.shape[0],
                                 **convert_cfg_to_dict(self.config.sample_t_cfg))
            eps_real = jax.random.normal(k_eps, real_data.shape, real_data.dtype)
        perturbed_real = ns.forward_process(real_data, eps_real, t_real)
        real_feat = self._teacher_features_only(params, perturbed_real, t_real, condition)
        return real_feat, t_real

    def _critic_update_step(self, params, input_student, t_student, t, eps,
                            real_data, condition, rng):
        """Fake-score DSM + discriminator + approximate R1 (ref ``dmd2.py:319-397``)."""
        ns = self.net.noise_scheduler
        k_drop, k_real, k_r1 = jax.random.split(rng, 3)
        gen_data = jax.lax.stop_gradient(
            self.gen_data_from_net(params, input_student, t_student, condition, k_drop))
        x_t_sg = ns.forward_process(gen_data, eps, t)

        fake_score_pred_type = (self.config.fake_score_pred_type
                                or self.nets["teacher"].net_pred_type)
        fake_score_pred = self.apply_net(params, "fake_score", x_t_sg, t,
                                         condition=condition,
                                         fwd_pred_type=fake_score_pred_type)
        loss_fakescore = denoising_score_matching_loss(
            fake_score_pred_type, net_pred=fake_score_pred, noise_scheduler=ns,
            x0=gen_data, eps=eps, t=t)

        gan_loss_disc = jnp.zeros((), jnp.float32)
        gan_loss_ar1 = jnp.zeros((), jnp.float32)
        if self.config.gan_loss_weight_gen > 0:
            fake_feat = jax.lax.stop_gradient(
                self._teacher_features_only(params, x_t_sg, t, condition))
            real_feat, t_real = self._compute_real_feat(params, real_data, t, eps,
                                                        condition, k_real)
            real_feat = jax.lax.stop_gradient(real_feat)
            disc = self.nets["discriminator"]
            real_logit = disc.apply(params["discriminator"], real_feat)
            fake_logit = disc.apply(params["discriminator"], fake_feat)
            gan_loss_disc = gan_loss_discriminator(real_logit, fake_logit)

            if self.config.gan_r1_reg_weight > 0:
                # approximate R1 (APT): logits stability under input perturbation
                perturbed_alpha = real_data + self.config.gan_r1_reg_alpha * \
                    jax.random.normal(k_r1, real_data.shape, real_data.dtype)
                real_feat_alpha = jax.lax.stop_gradient(
                    self._teacher_features_only(params, perturbed_alpha, t_real,
                                                condition))
                alpha_logit = disc.apply(params["discriminator"], real_feat_alpha)
                gan_loss_ar1 = mse(real_logit, alpha_logit)

        loss = loss_fakescore + gan_loss_disc + self.config.gan_r1_reg_weight * gan_loss_ar1
        loss_map = {"total_loss": loss, "fake_score_loss": loss_fakescore,
                    "gan_loss_disc": gan_loss_disc}
        if self.config.gan_loss_weight_gen > 0 and self.config.gan_r1_reg_weight > 0:
            loss_map["gan_loss_ar1"] = gan_loss_ar1
        outputs = self._get_outputs(gen_data, input_student)
        return loss_map, outputs

    def _get_outputs(self, gen_data, input_student=None):
        """(ref ``dmd2.py:399-421``). Multi-step viz sampling is done by the
        viz callback calling ``generator_fn`` outside the step."""
        ns = self.net.noise_scheduler
        if self.config.student_sample_steps == 1 and input_student is not None:
            return {"gen_rand": gen_data, "input_rand": input_student / ns.max_sigma}
        return {"gen_rand_train": gen_data}
