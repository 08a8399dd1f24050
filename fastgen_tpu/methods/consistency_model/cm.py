"""Consistency models: CM (CT/CD) and TCM (two-stage CM).

ref ``fastgen/methods/consistency_model/CM.py`` and ``TCM.py``.

TPU-native notes:
* the shared-dropout double forward (torch ``fork_rng``, ref ``CM.py:162-165``)
  is just reusing one explicit dropout key for both applies;
* the ECT curriculum ratio (CTScheduleCallback mutating ``model.ratio``) is
  computed *inside* the jitted step from the traced iteration, so stage
  transitions don't trigger recompiles or host round-trips;
* TCM's cross-rank ``sync_all``/``sync_any`` routing (ref ``TCM.py:85-107``)
  disappears: both stage networks run and blend with ``jnp.where`` — on TPU a
  dynamic branch would force a host sync and the two programs have identical
  cost anyway (teacher == student architecture);
* f64 loss islands -> f32 (t-shaped scalars stay cheap/accurate).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from fastgen_tpu.methods.base import FastGenModel, convert_cfg_to_dict
from fastgen_tpu.utils import expand_like, instantiate


def get_edm_c_out(noise_scheduler, t, sigma_data: float = 0.5):
    """SNR-matched EDM c_out weighting (ref ``CM.py:22-25``)."""
    edm_sigma = noise_scheduler.sigma(t) / noise_scheduler.non_zero_clamp(
        noise_scheduler.alpha(t))
    return edm_sigma * sigma_data / jnp.sqrt(edm_sigma**2 + sigma_data**2)


def t_to_r_sigmoid(t, ratio, min_r: float = 1e-6):
    """ECT sigmoid delta-t schedule (ref ``CM.py:28-33``)."""
    r = t - t * (1 - ratio) * (1 + 8 * jax.nn.sigmoid(-t))
    return jnp.maximum(r, min_r)


class CMModel(FastGenModel):
    """Consistency training/distillation (ref ``CM.py:54-281``)."""

    def __init__(self, config):
        super().__init__(config)
        self.sample_t_cfg = config.sample_t_cfg
        self.loss_config = config.loss_config

    def build_model(self):
        super().build_model()
        if self.config.loss_config.use_cd:
            self.build_teacher()

    # ECT curriculum (CTScheduleCallback semantics, computed in-step)
    def ct_ratio(self, iteration):
        cs = getattr(self.config, "ct_schedule", None)
        if cs is None or not getattr(cs, "enabled", True):
            return jnp.asarray(0.0, jnp.float32)
        nimg = iteration.astype(jnp.float32) * float(cs.batch_size)
        stage = jnp.floor(nimg / (cs.kimg_per_stage * 1000.0))
        ratio = 1.0 - 1.0 / (cs.q ** (stage + 1.0))
        return jnp.minimum(ratio, cs.ratio_limit)

    def ode_solver(self, params, x_t, t, t_next, condition=None, neg_condition=None,
                   net_key: str = "teacher"):
        """One Euler step of the teacher PF-ODE in flow space (ref ``CM.py:36-51``)."""
        flow = self.apply_net(params, net_key, x_t, t, condition=condition,
                              fwd_pred_type="flow")
        if self.config.guidance_scale is not None:
            kwargs = {"condition": neg_condition, "fwd_pred_type": "flow"}
            if self.config.skip_layers is not None:
                kwargs["skip_layers"] = tuple(self.config.skip_layers)
            flow_neg = self.apply_net(params, net_key, x_t, t, **kwargs)
            flow = flow + (self.config.guidance_scale - 1) * (flow - flow_neg)
        delta_t = expand_like(t - t_next, x_t).astype(x_t.dtype)
        return x_t - delta_t * flow

    def _quantize_t_r(self, ns, t, r):
        """Snap t/r to sigma-table entries, fixing collisions (ref ``CM.py:118-136``)."""
        t_idx = ns.closest_sigma_idx(ns.sigma(t))
        r_idx = ns.closest_sigma_idx(ns.sigma(r))
        same = t_idx == r_idx
        large = t_idx == ns.num_steps - 1
        t_idx = jnp.where(same & ~large, t_idx + 1, t_idx)
        r_idx = jnp.where(same & large, r_idx - 1, r_idx)
        return ns.sigma_idx_to_t(t_idx), ns.sigma_idx_to_t(r_idx)

    def _apply_student(self, params, x, t, condition, rng, net_key: str = "net",
                       **kwargs):
        return self.apply_net(params, net_key, x, t, condition=condition,
                              fwd_pred_type="x0", train=True,
                              rngs={"dropout": rng}, **kwargs)

    def _compute_cm_loss(self, params, real_data, t, rng, iteration,
                         condition=None, neg_condition=None,
                         student_apply=None):
        """(cm_loss[B], loss_unweighted[B], D_yt) (ref ``CM.py:85-179``)."""
        ns = self.net.noise_scheduler
        k_eps, k_drop = jax.random.split(rng)
        ratio = self.ct_ratio(iteration)

        min_r = max(ns.min_t, getattr(self.sample_t_cfg, "min_r", 0.0) or ns.min_t)
        r = t_to_r_sigmoid(t, ratio, min_r=min_r)
        # safety: keep r strictly below t
        t = jnp.where(r >= t - ns.clamp_min, r + ns.clamp_min, t)

        if getattr(self.sample_t_cfg, "quantize", False):
            t, r = self._quantize_t_r(ns, t, r)

        eps = jax.random.normal(k_eps, real_data.shape, real_data.dtype)
        y_t = ns.forward_process(real_data, eps, t)
        if self.loss_config.use_cd:
            y_r = jax.lax.stop_gradient(self.ode_solver(
                params, y_t, t, r, condition=condition, neg_condition=neg_condition))
        else:
            y_r = ns.forward_process(real_data, eps, r)

        apply = student_apply or self._apply_student
        # shared dropout key = the fork_rng trick (identical masks both passes)
        D_yt = apply(params, y_t, t, condition, k_drop)
        D_yr_candidate = jax.lax.stop_gradient(apply(params, y_r, r, condition, k_drop))

        mask = expand_like(r > 0, real_data)
        D_yr = jnp.where(mask, jnp.nan_to_num(D_yr_candidate), real_data)

        cm_loss, loss_unweighted = self._pred_to_loss(ns, D_yt, D_yr, t, r)
        return cm_loss, loss_unweighted, D_yt

    def _pred_to_loss(self, ns, D_yt, D_yr, t, r):
        """Per-sample weighted CM loss (ref ``CM.py:181-226``); f32 island."""
        t = t.astype(jnp.float32)
        r = r.astype(jnp.float32)
        diff = (D_yt - D_yr).astype(jnp.float32)
        l2 = jnp.sqrt(jnp.sum(diff**2, axis=tuple(range(1, diff.ndim))))
        c = self.loss_config.huber_const
        if c > 0:
            loss_unweighted = jnp.sqrt(l2**2 + c**2) - c
        elif self.loss_config.use_squared_l2:
            loss_unweighted = l2**2
        else:
            loss_unweighted = l2

        weighting = self.loss_config.weighting_ct_loss
        if weighting == "default":
            cm_loss = loss_unweighted / (t - r)
        elif weighting == "c_out":
            cm_loss = loss_unweighted / get_edm_c_out(ns, t)
        elif weighting == "c_out_sq":
            cm_loss = loss_unweighted / get_edm_c_out(ns, t) ** 2
        elif weighting == "sigma_sq":
            cm_loss = loss_unweighted / ns.sigma(t) ** 2
        elif weighting == "sqrt":
            cm_loss = loss_unweighted / jnp.sqrt(t - r)
        elif weighting == "one":
            cm_loss = loss_unweighted
        else:
            raise ValueError(f"Unknown weighting {weighting!r}")
        return cm_loss, loss_unweighted

    def compute_losses(self, params, batch, rng, iteration, phase):
        real_data, condition, neg_condition = self._prepare_training_data(batch)
        k_t, k_cm = jax.random.split(rng)
        t = self.net.noise_scheduler.sample_t(
            k_t, real_data.shape[0], **convert_cfg_to_dict(self.sample_t_cfg))
        cm_loss, loss_unweighted, D_yt = self._compute_cm_loss(
            params, real_data, t, k_cm, iteration,
            condition=condition, neg_condition=neg_condition)
        loss = cm_loss.mean()
        loss_map = {"total_loss": loss, "cm_loss": loss,
                    "unweighted_cm_loss": loss_unweighted.mean()}
        return loss_map, {"gen_rand_train": D_yt}


class TCMModel(CMModel):
    """Two-stage CM: frozen stage-1 ``cm_teacher`` below ``transition_t``,
    student above (ref ``TCM.py:111-208``)."""

    def build_model(self):
        super().build_model()
        # cm_teacher is architecturally the student net; its params are a frozen
        # copy of the (loaded) student weights
        self.nets["cm_teacher"] = instantiate(self.config.net)

    def post_init_params(self, params):
        params = super().post_init_params(params)
        params = dict(params)
        params["cm_teacher"] = jax.tree_util.tree_map(jnp.copy, params["net"])
        return params

    def _tcm_apply(self, params, x, t, condition, rng):
        """TCMPrecond: blend teacher below / student above transition_t
        (ref ``TCM.py:59-108``); both run, jnp.where selects."""
        out_s = self._apply_student(params, x, t, condition, rng, net_key="net")
        out_t = jax.lax.stop_gradient(
            self._apply_student(params, x, t, condition, rng, net_key="cm_teacher"))
        second_stage = expand_like(t >= self.config.transition_t, out_s)
        return jnp.where(second_stage, out_s, out_t)

    def compute_losses(self, params, batch, rng, iteration, phase):
        real_data, condition, neg_condition = self._prepare_training_data(batch)
        batch_size = real_data.shape[0]
        k_t, k_mask, k_cm = jax.random.split(rng, 3)
        ns = self.net.noise_scheduler
        t = ns.sample_t(k_t, batch_size, **convert_cfg_to_dict(self.sample_t_cfg))

        # boundary-t sampling (ref ``TCM.py:158-174``): a static count of
        # samples is pinned exactly at transition_t
        num_mask = int(batch_size * self.config.boundary_prob)
        if num_mask == 0:
            mask_t = jax.random.uniform(k_mask, (batch_size,)) < self.config.boundary_prob
        else:
            perm = jax.random.permutation(k_mask, batch_size)
            mask_t = jnp.zeros((batch_size,), bool).at[perm[:num_mask]].set(True)
        t = jnp.where(mask_t, self.config.transition_t + 1e-8, t)

        cm_loss, loss_unweighted, D_yt = self._compute_cm_loss(
            params, real_data, t, k_cm, iteration,
            condition=condition, neg_condition=neg_condition,
            student_apply=self._tcm_apply)

        n_b = jnp.maximum(mask_t.sum(), 1)
        n_r = jnp.maximum((~mask_t).sum(), 1)
        loss_boundary = jnp.where(mask_t, cm_loss, 0.0).sum() / n_b
        cm_loss_mean = jnp.where(~mask_t, cm_loss, 0.0).sum() / n_r
        unweighted = jnp.where(~mask_t, loss_unweighted, 0.0).sum() / n_r

        loss = cm_loss_mean + self.config.w_boundary * loss_boundary
        loss_map = {"total_loss": loss, "cm_loss": cm_loss_mean,
                    "loss_boundary": loss_boundary, "unweighted_cm_loss": unweighted}
        return loss_map, {"gen_rand_train": D_yt}
