"""sCM: continuous-time consistency models via JVP tangents
(ref ``fastgen/methods/consistency_model/sCM.py``).

The TrigFlow wrapper maps the student's x0-denoiser onto TrigFlow's
F_theta(x_t/sigma_d, t_hat) by SNR matching (ref ``sCM.py:21-80``); the tangent
``g = g1 + r*g2`` needs dF/dt along the PF-ODE direction, obtained with
``jax.jvp`` — first-class in JAX (works under jit/shard; the reference needs a
custom torch.autograd.Function JVP for its attention op, ``EDM/network.py:187``).
A finite-difference estimate is kept for parity testing (ref ``sCM.py:112-140``).
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from fastgen_tpu.methods.base import convert_cfg_to_dict
from fastgen_tpu.methods.consistency_model.cm import CMModel
from fastgen_tpu.ops.schedules import TrigNoiseSchedule
from fastgen_tpu.utils import PRECISION_MAP, expand_like


class TrigFlowWrapper:
    """Functional TrigFlowPrecond (ref ``sCM.py:21-80``): no params of its own,
    wraps a net apply into F_theta-space."""

    def __init__(self, model, net_key: str, sigma_data: float):
        self.model = model
        self.net_key = net_key
        self.sigma_data = sigma_data
        self.noise_scheduler = TrigNoiseSchedule()

    def _to_net_input(self, x_t_hat, t_hat):
        """SNR-match t_hat (trig) to the inner net's schedule time
        (ref ``sCM.py:35-57``)."""
        inner_ns = self.model.nets[self.net_key].noise_scheduler
        sqrt_snr_t = self.noise_scheduler.sqrt_snr(t_hat)
        t = inner_ns.sqrt_snr_to_t(sqrt_snr_t / self.sigma_data)
        alpha_t = inner_ns.alpha(t)
        sigma_t = inner_ns.sigma(t)
        coeff = jnp.sqrt(alpha_t**2 + (sigma_t / self.sigma_data) ** 2)
        x_t = x_t_hat * expand_like(coeff, x_t_hat).astype(x_t_hat.dtype)
        return x_t, t.astype(jnp.float32)

    def __call__(self, params, x_t_hat, t_hat, condition=None,
                 return_logvar: bool = False, return_x0_pred: bool = False,
                 rng=None, train: bool = False):
        x_t, t = self._to_net_input(x_t_hat, t_hat)
        kwargs = {}
        if train and rng is not None:
            kwargs = {"train": True, "rngs": {"dropout": rng}}
        out = self.model.apply_net(params, self.net_key, x_t, t, condition=condition,
                                   fwd_pred_type="x0", return_logvar=return_logvar,
                                   **kwargs)
        if return_logvar:
            x0_pred, logvar = out
        else:
            x0_pred = out
        flow_unscaled = self.noise_scheduler.x0_to_flow(x_t_hat, x0_pred, t_hat)
        F_theta = flow_unscaled / self.sigma_data

        if return_x0_pred and return_logvar:
            return F_theta, logvar, x0_pred
        if return_x0_pred:
            return F_theta, x0_pred
        if return_logvar:
            return F_theta, logvar
        return F_theta


class SCMModel(CMModel):
    """sCT/sCD (ref ``sCM.py:83-324``)."""

    def __init__(self, config):
        super().__init__(config)
        self.sigma_data = config.sample_t_cfg.sigma_data
        self.precision_amp_jvp = (PRECISION_MAP[config.precision_amp_jvp]
                                  if getattr(config, "precision_amp_jvp", None) else None)
        self.net_trigflow = TrigFlowWrapper(self, "net", self.sigma_data)
        self.teacher_trigflow = (TrigFlowWrapper(self, "teacher", self.sigma_data)
                                 if config.loss_config.use_cd else None)

    def _compute_vt(self, t_hat):
        """Time-reparameterization Jacobian alpha*sigma (ref ``sCM.py:142-148``)."""
        ns = self.net_trigflow.noise_scheduler
        return ns.alpha(t_hat) * ns.sigma(t_hat)

    def _jvp(self, params, real_data, z, x_t_hat, t_hat, dxt_dt, condition, rng):
        """dF/dt tangent, no grad (ref ``sCM.py:150-181``)."""
        eps_clip = 1e-4

        def wrapper(x_t_hat_in, t_hat_in):
            t_clipped = jnp.clip(t_hat_in, -np.pi / 2 + eps_clip, np.pi / 2 - eps_clip)
            return self.net_trigflow(params, x_t_hat_in, t_clipped,
                                     condition=condition, rng=rng, train=True)

        if self.loss_config.use_jvp_finite_diff:
            return self._jvp_finite_difference(wrapper, real_data, z, t_hat)

        dtype = self.precision_amp_jvp or x_t_hat.dtype
        v_t = self._compute_vt(t_hat).astype(dtype)
        v_x = expand_like(v_t, dxt_dt) * dxt_dt.astype(dtype)
        _, F_jvp = jax.jvp(wrapper, (x_t_hat.astype(dtype), t_hat),
                           (v_x, v_t.astype(t_hat.dtype)))
        return jax.lax.stop_gradient(F_jvp)

    def _jvp_finite_difference(self, wrapper, real_data, z, t_hat):
        """(ref ``sCM.py:112-140``); f32 island instead of f64."""
        ns = self.net_trigflow.noise_scheduler
        t32 = jnp.clip(t_hat.astype(jnp.float32), -np.pi / 2 + 1e-5, np.pi / 2 - 1e-5)
        v_t = self._compute_vt(t32)
        eps_t = jnp.maximum(self.loss_config.jvp_finite_diff_eps * jnp.abs(t32), 1e-6)
        t_plus = jnp.minimum(t32 + eps_t, np.pi / 2 - 1e-5)
        t_minus = jnp.maximum(t32 - eps_t, -np.pi / 2 + 1e-5)
        x_plus = ns.forward_process(real_data, z, t_plus)
        x_minus = ns.forward_process(real_data, z, t_minus)
        F_plus = wrapper(x_plus, t_plus)
        F_minus = wrapper(x_minus, t_minus)
        factor = expand_like(v_t / (2 * eps_t), F_plus).astype(jnp.float32)
        return jax.lax.stop_gradient(
            (F_plus.astype(jnp.float32) - F_minus.astype(jnp.float32)) * factor)

    def _scm_pred_to_loss(self, F_theta, F_theta_jvp, x_t_hat, dxt_dt, logvar,
                          sigma_t, t_hat, iteration):
        """Tangent-normalized adaptive-weighted loss (ref ``sCM.py:240-287``)."""
        f32 = jnp.float32
        F_theta = F_theta.astype(f32)
        F_det = jax.lax.stop_gradient(F_theta)
        F_theta_jvp = F_theta_jvp.astype(f32)
        logvar = logvar.squeeze(-1).astype(f32)
        t_hat = t_hat.astype(f32)

        warmup = self.loss_config.tangent_warmup_steps
        r = jnp.minimum(1.0, iteration.astype(f32) / max(warmup, 1))

        ns = self.net_trigflow.noise_scheduler
        alpha_hat = ns.alpha(t_hat)
        sigma_hat = ns.sigma(t_hat)

        g1 = expand_like(-alpha_hat * alpha_hat, x_t_hat).astype(f32) * (
            self.sigma_data * F_det - dxt_dt.astype(f32))
        g2 = -(expand_like(alpha_hat * sigma_hat, x_t_hat).astype(f32)
               * x_t_hat.astype(f32) + self.sigma_data * F_theta_jvp)
        g = g1 + r * g2

        reduce_dims = tuple(range(1, g.ndim))
        g_norm = jnp.sqrt(jnp.sum(g**2, axis=reduce_dims, keepdims=True))
        if self.loss_config.g_norm_spatial_invariance:
            g_norm = g_norm * np.sqrt(g_norm.size / g.size)
        g = g / (g_norm + self.loss_config.tangent_warmup_const)

        weight = 1.0 / sigma_t if self.loss_config.prior_weighting_enabled else 1.0
        D = int(np.prod(x_t_hat.shape[1:])) if self.loss_config.divide_x_0_spatial_dim else 1.0
        loss_unweighted = jnp.mean((F_theta - F_det - g) ** 2, axis=reduce_dims)
        scm_loss = weight / (jnp.exp(logvar) * D) * loss_unweighted + logvar
        return scm_loss, loss_unweighted, r

    def compute_losses(self, params, batch, rng, iteration, phase):
        real_data, condition, neg_condition = self._prepare_training_data(batch)
        k_t, k_z, k_drop = jax.random.split(rng, 3)
        ns = self.net.noise_scheduler
        t = ns.sample_t(k_t, real_data.shape[0],
                        **convert_cfg_to_dict(self.sample_t_cfg))

        if getattr(self.sample_t_cfg, "quantize", False):
            idx = ns.closest_sigma_idx(ns.sigma(t))
            t = ns.sigma_idx_to_t(idx)

        sigma_t = ns.sigma(t).astype(jnp.float32)
        alpha_t = ns.alpha(t).astype(jnp.float32)
        # stable t_hat (ref ``sCM.py:198-203``)
        t_hat = jnp.arctan2(sigma_t, alpha_t * self.sigma_data)

        z = jax.random.normal(k_z, real_data.shape, real_data.dtype) * self.sigma_data
        trig_ns = self.net_trigflow.noise_scheduler
        x_t_hat = trig_ns.forward_process(real_data, z, t_hat)

        if self.loss_config.use_cd:
            dxt_dt = self.sigma_data * self.teacher_trigflow(
                params, x_t_hat, t_hat, condition=condition)
            if self.config.guidance_scale is not None:
                neg_dxt_dt = self.sigma_data * self.teacher_trigflow(
                    params, x_t_hat, t_hat, condition=neg_condition)
                dxt_dt = dxt_dt + (self.config.guidance_scale - 1.0) * (dxt_dt - neg_dxt_dt)
            dxt_dt = jax.lax.stop_gradient(dxt_dt)
        else:
            dxt_dt = trig_ns.cond_velocity(real_data, z, t_hat)

        F_theta, logvar, x0_pred = self.net_trigflow(
            params, x_t_hat, t_hat, condition=condition, return_logvar=True,
            return_x0_pred=True, rng=k_drop, train=True)
        F_theta_jvp = self._jvp(params, real_data, z, x_t_hat, t_hat,
                                jax.lax.stop_gradient(dxt_dt), condition, k_drop)

        scm_loss, unweighted, warmup = self._scm_pred_to_loss(
            F_theta, F_theta_jvp, x_t_hat, dxt_dt, logvar, sigma_t, t_hat, iteration)

        loss = scm_loss.mean()
        loss_map = {"total_loss": loss, "scm_loss": loss,
                    "unweighted_scm_loss": unweighted.mean(),
                    "logvar_loss": logvar.mean(), "warmup_weight": warmup}
        return loss_map, {"gen_rand_train": x0_pred}
