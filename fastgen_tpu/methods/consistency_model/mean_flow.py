"""MeanFlow: mean-velocity fields u(x_t, t, r) via JVP
(ref ``fastgen/methods/consistency_model/mean_flow.py``).

``jax.jvp`` with tangents (dx_t/dt, 1, 0) works straight through the XLA
attention — the reference must disable efficient attention for torch JVP
(ref ``mean_flow.py:22-48``); no such workaround is needed here. The finite
difference variant (fwd/bwd/central selection) is kept for parity testing.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from fastgen_tpu.methods.base import convert_cfg_to_dict
from fastgen_tpu.methods.consistency_model.cm import CMModel
from fastgen_tpu.utils import PRECISION_MAP, expand_like


class MeanFlowModel(CMModel):
    def __init__(self, config):
        super().__init__(config)
        self.sample_r_cfg = config.sample_r_cfg
        self.precision_amp_jvp = (PRECISION_MAP[config.precision_amp_jvp]
                                  if getattr(config, "precision_amp_jvp", None) else None)

    def _apply_flow(self, params, x_t, t, r, condition, rng=None, train=False):
        kwargs = {}
        if train and rng is not None:
            kwargs = {"train": True, "rngs": {"dropout": rng}}
        return self.apply_net(params, "net", x_t, t, r=r, condition=condition,
                              fwd_pred_type="flow", **kwargs)

    def _mix_condition_mf(self, rng, condition, neg_condition, dxt_dt, guided_dxt_dt):
        """CFG-mixed condition dropout: the first ``num_to_drop`` samples keep
        the raw velocity + neg condition (ref ``mean_flow.py:71-101``)."""
        if self.config.cond_dropout_prob is None:
            return condition, dxt_dt
        batch_size = dxt_dt.shape[0]
        num_to_drop = (jax.random.uniform(rng, (batch_size,))
                       < self.config.cond_dropout_prob).sum()
        keep = jnp.arange(batch_size) >= num_to_drop
        dxt_dt = jnp.where(expand_like(keep, dxt_dt), guided_dxt_dt, dxt_dt)
        if isinstance(condition, dict):
            out = dict(condition)
            for k in condition:
                if k in getattr(self.config, "cond_keys_no_dropout", ()):
                    continue
                out[k] = jnp.where(expand_like(keep, condition[k]), condition[k],
                                   neg_condition[k])
            condition = out
        elif condition is not None:
            condition = jnp.where(expand_like(keep, condition), condition,
                                  neg_condition)
        return condition, dxt_dt

    def _get_velocity(self, params, x, z, t, condition, neg_condition, rng):
        """(condition, dxt_dt) (ref ``mean_flow.py:103-160``)."""
        ns = self.net.noise_scheduler
        x_t = ns.forward_process(x, z, t)
        if self.loss_config.use_cd:
            dxt_dt = self.apply_net(params, "teacher", x_t, t, condition=condition,
                                    fwd_pred_type="flow")
            if self.config.guidance_scale is not None:
                g = jnp.where((t >= self.config.guidance_t_start)
                              & (t <= self.config.guidance_t_end),
                              self.config.guidance_scale, 1.0)
                g = expand_like(g, x_t).astype(x_t.dtype)
                neg = self.apply_net(params, "teacher", x_t, t,
                                     condition=neg_condition, fwd_pred_type="flow")
                dxt_dt = dxt_dt + (g - 1.0) * (dxt_dt - neg)
            return condition, jax.lax.stop_gradient(dxt_dt)

        dxt_dt = ns.cond_velocity(x, z, t)
        if (self.config.guidance_scale is not None
                or self.config.guidance_mixture_ratio is not None):
            # self-guided unconditional estimate (meanflow eq 19); eval mode
            neg_dxt_dt = self._apply_flow(params, x_t, t, t, neg_condition)
            g = self.config.guidance_scale or 1.0
            g = jnp.where((t >= self.config.guidance_t_start)
                          & (t <= self.config.guidance_t_end), g, 1.0)
            g = expand_like(g, x_t).astype(x_t.dtype)
            if self.config.guidance_mixture_ratio is None:
                guided = neg_dxt_dt + g * (dxt_dt - neg_dxt_dt)
            else:
                mix = jnp.where((t >= self.config.guidance_t_start)
                                & (t <= self.config.guidance_t_end),
                                self.config.guidance_mixture_ratio, 0.0)
                mix = expand_like(mix, x_t).astype(x_t.dtype)
                cond_dxt_dt = self._apply_flow(params, x_t, t, t, condition)
                guided = g * dxt_dt + (1.0 - g - mix) * neg_dxt_dt + mix * cond_dxt_dt
            guided = jax.lax.stop_gradient(guided)
            condition, dxt_dt = self._mix_condition_mf(rng, condition, neg_condition,
                                                       dxt_dt, guided)
        return condition, jax.lax.stop_gradient(dxt_dt)

    def _jvp(self, params, x_t, t, r, dxt_dt, condition, rng):
        """du/dt along the flow (ref ``mean_flow.py:220-252``), no grad."""
        def wrapper(x_in, t_in, r_in):
            return self._apply_flow(params, x_in, t_in, r_in, condition,
                                    rng=rng, train=True)

        if self.loss_config.use_jvp_finite_diff:
            return self._jvp_finite_difference(wrapper, x_t, t, r, dxt_dt)
        dtype = self.precision_amp_jvp or x_t.dtype
        tangents = (dxt_dt.astype(dtype), jnp.ones_like(t), jnp.zeros_like(r))
        _, u_jvp = jax.jvp(wrapper, (x_t.astype(dtype), t, r), tangents)
        return jax.lax.stop_gradient(u_jvp)

    def _jvp_finite_difference(self, wrapper, x_t, t, r, dxt_dt):
        """fwd/bwd/central selection (ref ``mean_flow.py:162-218``); f32 island."""
        ns = self.net.noise_scheduler
        f32 = jnp.float32
        t32, r32 = t.astype(f32), r.astype(f32)
        eps = jnp.full_like(t32, self.loss_config.jvp_finite_diff_eps)
        fwd_ok = t32 + eps <= ns.max_t
        bwd_ok = (t32 - eps >= ns.min_t) & (t32 - eps > r32)
        center = fwd_ok & bwd_ok
        t_plus = jnp.where(fwd_ok, t32 + eps, t32)
        t_minus = jnp.where(bwd_ok, t32 - eps, t32)
        norm = jnp.where(center, 1.0 / (2 * eps),
                         jnp.where(fwd_ok | bwd_ok, 1.0 / eps, 0.0))
        x_plus = x_t.astype(f32) + expand_like(t_plus - t32, dxt_dt) * dxt_dt.astype(f32)
        x_minus = x_t.astype(f32) + expand_like(t_minus - t32, dxt_dt) * dxt_dt.astype(f32)
        u_plus = wrapper(x_plus.astype(x_t.dtype), t_plus, r32)
        u_minus = wrapper(x_minus.astype(x_t.dtype), t_minus, r32)
        out = (u_plus.astype(f32) - u_minus.astype(f32)) * expand_like(norm, u_plus)
        return jax.lax.stop_gradient(out)

    def _compute_weight(self, tensor):
        """Adaptive loss weight (ref ``mean_flow.py:254-272``)."""
        parts = self.loss_config.norm_method.split("_")
        method, args = parts[0], parts[1:]
        if method == "poly":
            power = float(args[0])
            return 1.0 / (tensor + self.loss_config.norm_const) ** power
        if method == "exp":
            const, scale = float(args[0]), float(args[1])
            return const * jnp.exp(scale * tensor + self.loss_config.norm_const)
        raise ValueError(f"Invalid norm method {self.loss_config.norm_method!r}")

    def _mf_pred_to_loss(self, u_theta, u_theta_jvp, x_t, dxt_dt, t, r, iteration):
        """(loss[B], tangent, weight, warmup) (ref ``mean_flow.py:274-334``)."""
        f32 = jnp.float32
        ns = self.net.noise_scheduler
        u32 = u_theta.astype(f32)
        jvp32 = u_theta_jvp.astype(f32)
        v32 = dxt_dt.astype(f32)
        delta_t = expand_like(jnp.clip((t - r).astype(f32), ns.min_t, ns.max_t), u32)

        warmup_steps = self.loss_config.tangent_warmup_steps
        warmup = (jnp.minimum(1.0, iteration.astype(f32) / warmup_steps)
                  if warmup_steps > 0 else jnp.asarray(1.0, f32))

        reduce_dims = tuple(range(1, u32.ndim))
        if self.loss_config.loss_type == "l2":
            tangent = jax.lax.stop_gradient(v32 - warmup * delta_t * jvp32)
            loss = jnp.sum((u32 - tangent) ** 2, axis=reduce_dims)
            weight = jax.lax.stop_gradient(self._compute_weight(loss))
            loss = loss * weight
        elif self.loss_config.loss_type == "opt_grad":
            u_det = jax.lax.stop_gradient(u32)
            tangent = jax.lax.stop_gradient(v32 - u_det - warmup * delta_t * jvp32)
            if self.loss_config.tangent_spatial_invariance:
                tangent = tangent * np.sqrt(tangent.shape[0] / tangent.size)
            opt_grad_norm = jnp.sqrt(jnp.sum(tangent**2, axis=reduce_dims))
            weight = jax.lax.stop_gradient(
                expand_like(self._compute_weight(opt_grad_norm), tangent))
            pseudo = jax.lax.stop_gradient(u_det + tangent * weight)
            loss = jnp.sum((u32 - pseudo) ** 2, axis=reduce_dims)
        else:
            raise ValueError(f"Invalid loss type {self.loss_config.loss_type!r}")
        return loss, tangent, weight, warmup

    def _student_sample_loop(self, params_net, x, t_list, rng, condition=None,
                            student_sample_type: str = "sde", net_key: str = "net",
                            **kwargs):
        """Flow-stepping sampler (ref ``mean_flow.py:336-381``)."""
        net = self.nets[net_key]
        ns = net.noise_scheduler
        batch_size = x.shape[0]
        for t_cur, t_next in zip(t_list[:-1], t_list[1:]):
            t_b = jnp.full((batch_size,), t_cur, jnp.float32)
            t_next_b = jnp.full((batch_size,), t_next, jnp.float32)
            if student_sample_type == "sde":
                delta_t = jnp.asarray(float(t_cur), x.dtype)
                u = net.apply(params_net, x, t_b, r=jnp.zeros_like(t_next_b),
                              condition=condition, fwd_pred_type="flow", **kwargs)
                x = x - delta_t * u
                if float(t_next) > 0:
                    rng, sub = jax.random.split(rng)
                    eps = jax.random.normal(sub, x.shape, x.dtype)
                    x = ns.forward_process(x, eps, t_next_b)
            elif student_sample_type == "ode":
                delta_t = jnp.asarray(float(t_cur - t_next), x.dtype)
                u = net.apply(params_net, x, t_b, r=t_next_b, condition=condition,
                              fwd_pred_type="flow", **kwargs)
                x = x - delta_t * u
            else:
                raise NotImplementedError(student_sample_type)
        return x

    def compute_losses(self, params, batch, rng, iteration, phase):
        real_data, condition, neg_condition = self._prepare_training_data(batch)
        batch_size = real_data.shape[0]
        ns = self.net.noise_scheduler
        k_t, k_r, k_fm, k_z, k_mix, k_drop = jax.random.split(rng, 6)

        t_kwargs = convert_cfg_to_dict(self.sample_t_cfg)
        t = ns.sample_t(k_t, batch_size, **t_kwargs)
        r_kwargs = (convert_cfg_to_dict(self.sample_r_cfg)
                    if self.sample_r_cfg.enabled else t_kwargs)
        r_kwargs = {k: v for k, v in r_kwargs.items() if k != "enabled"}
        r = ns.sample_t(k_r, batch_size, **r_kwargs)
        t, r = jnp.maximum(t, r), jnp.minimum(t, r)

        # set r = t (flow-matching) for a subset (ref ``mean_flow.py:465-469``)
        fm_size = (jax.random.uniform(k_fm, (batch_size,))
                   >= self.sample_t_cfg.r_sample_ratio).sum()
        zero_mask = jnp.arange(batch_size) < fm_size
        r = jnp.where(zero_mask, t, r)

        z = jax.random.normal(k_z, real_data.shape, real_data.dtype)
        x_t = ns.forward_process(real_data, z, t)
        condition, dxt_dt = self._get_velocity(params, real_data, z, t,
                                               condition, neg_condition, k_mix)
        u_theta_jvp = self._jvp(params, x_t, t, r, dxt_dt, condition, k_drop)
        u_theta = self._apply_flow(params, x_t, t, r, condition, rng=k_drop,
                                   train=True)

        mf_loss, tangent, weight, warmup = self._mf_pred_to_loss(
            u_theta, u_theta_jvp, x_t, dxt_dt, t, r, iteration)

        reduce_dims = tuple(range(1, u_theta.ndim))
        v_loss = jnp.mean((u_theta.astype(jnp.float32)
                           - (z - real_data).astype(jnp.float32)) ** 2,
                          axis=reduce_dims)
        x0_approx = ns.flow_to_x0(x_t, jax.lax.stop_gradient(u_theta), t)

        def _norm(v):
            return jnp.sqrt(jnp.sum(v.reshape(v.shape[0], -1) ** 2, axis=-1)).mean()

        loss = mf_loss.mean()
        loss_map = {
            "total_loss": loss, "mf_loss": loss, "v_loss": v_loss.mean(),
            "jvp_norm": _norm(u_theta_jvp), "tangent_norm": _norm(tangent),
            "v_norm": _norm(dxt_dt), "loss_weight": weight.mean(),
            "tangent_warmup_weight": warmup,
        }
        return loss_map, {"gen_rand_train": x0_approx}
