"""Consistency-family method tests at toy size (mirrors the reference's
``test_cmmodel.py`` / ``test_scmmodel.py`` / ``test_tcmmodel.py`` /
``test_meanflowmodel.py``)."""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.configs.methods.config_cm import create_config as create_cm
from fastgen_tpu.configs.methods.config_mean_flow import create_config as create_mf
from fastgen_tpu.configs.methods.config_scm import create_config as create_scm
from fastgen_tpu.configs.methods.config_tcm import create_config as create_tcm
from fastgen_tpu.configs.net import EDM_Test_Config
from fastgen_tpu.methods.consistency_model.cm import t_to_r_sigmoid
from fastgen_tpu.utils import instantiate

KEY = jax.random.PRNGKey(0)


def shrink(config, r_timestep=False, schedule="edm"):
    config.model.net = copy.deepcopy(EDM_Test_Config)
    if r_timestep:
        config.model.net.r_timestep = True
    if schedule != "edm":
        config.model.net.schedule_type = schedule
    config.model.input_shape = [16, 16, 3]
    config.model.use_ema = False
    config.model.ct_schedule.batch_size = 4
    return config


def batch(n=4):
    x = jax.random.normal(KEY, (n, 16, 16, 3))
    cond = jax.nn.one_hot(jnp.arange(n) % 10, 10)
    return {"real": x, "condition": cond, "neg_condition": jnp.zeros_like(cond)}


def build(config):
    model = instantiate(config.model_class, config=config.model)
    model.init_optimizers()
    state = model.init_state(KEY)
    return model, state


def _step_and_check(model, state, expected_keys):
    b = batch()
    loss_map, outputs = model.compute_losses(state.params, b, KEY,
                                             state.iteration, "student")
    assert expected_keys <= set(loss_map)
    for k, v in loss_map.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    step = jax.jit(model.make_train_step("student"))
    new_state, lm, _ = step(state, b, KEY)
    delta = sum(float(jnp.sum(jnp.abs(a - c))) for a, c in zip(
        jax.tree_util.tree_leaves(new_state.params["net"]),
        jax.tree_util.tree_leaves(state.params["net"])))
    assert delta > 0
    return loss_map


def test_t_to_r_sigmoid_properties():
    t = jnp.linspace(0.01, 80.0, 64)
    r0 = t_to_r_sigmoid(t, 0.0)
    r9 = t_to_r_sigmoid(t, 0.9)
    assert bool((r0 <= t).all()) and bool((r9 <= t).all())
    # larger ratio -> r closer to t
    assert bool((r9 >= r0).all())
    assert bool((r0 >= 1e-6).all())


class TestCM:
    def test_ct_training(self):
        config = shrink(create_cm())
        model, state = build(config)
        lm = _step_and_check(model, state, {"total_loss", "cm_loss", "unweighted_cm_loss"})

    def test_cd_with_teacher(self):
        config = shrink(create_cm())
        config.model.loss_config.use_cd = True
        model, state = build(config)
        assert "teacher" in state.params
        _step_and_check(model, state, {"total_loss", "cm_loss"})

    def test_quantize_path(self):
        config = shrink(create_cm())
        config.model.sample_t_cfg.quantize = True
        model, state = build(config)
        _step_and_check(model, state, {"total_loss"})

    def test_ct_ratio_curriculum(self):
        config = shrink(create_cm())
        config.model.ct_schedule.kimg_per_stage = 1  # 1000 images per stage
        model, state = build(config)
        r0 = float(model.ct_ratio(jnp.asarray(0)))
        r_late = float(model.ct_ratio(jnp.asarray(10_000)))
        assert r0 == pytest.approx(0.5)  # 1 - 1/q at stage 0 (q=2)
        assert r_late > r0
        assert r_late <= config.model.ct_schedule.ratio_limit + 1e-6

    def test_weightings(self):
        for w in ["default", "c_out", "c_out_sq", "sigma_sq", "sqrt", "one"]:
            config = shrink(create_cm())
            config.model.loss_config.weighting_ct_loss = w
            model, state = build(config)
            b = batch()
            lm, _ = model.compute_losses(state.params, b, KEY, state.iteration,
                                         "student")
            assert np.isfinite(float(lm["total_loss"])), w


class TestTCM:
    def test_boundary_and_blend(self):
        config = shrink(create_tcm())
        model, state = build(config)
        assert "cm_teacher" in state.params
        lm = _step_and_check(model, state,
                             {"total_loss", "cm_loss", "loss_boundary"})

    def test_cm_teacher_frozen(self):
        config = shrink(create_tcm())
        model, state = build(config)
        step = jax.jit(model.make_train_step("student"))
        new_state, _, _ = step(state, batch(), KEY)
        delta = sum(float(jnp.sum(jnp.abs(a - c))) for a, c in zip(
            jax.tree_util.tree_leaves(new_state.params["cm_teacher"]),
            jax.tree_util.tree_leaves(state.params["cm_teacher"])))
        assert delta == 0


class TestSCM:
    def test_sct_jvp(self):
        config = shrink(create_scm())
        model, state = build(config)
        _step_and_check(model, state,
                        {"total_loss", "scm_loss", "unweighted_scm_loss",
                         "logvar_loss", "warmup_weight"})

    def test_sct_finite_diff(self):
        config = shrink(create_scm())
        config.model.loss_config.use_jvp_finite_diff = True
        model, state = build(config)
        _step_and_check(model, state, {"total_loss", "scm_loss"})

    def test_jvp_vs_finite_diff_close(self):
        """jax.jvp and the finite-difference estimate must agree."""
        config = shrink(create_scm())
        model, state = build(config)
        b = batch()
        lm_jvp, _ = model.compute_losses(state.params, b, KEY, state.iteration,
                                         "student")
        config.model.loss_config.use_jvp_finite_diff = True
        lm_fd, _ = model.compute_losses(state.params, b, KEY, state.iteration,
                                        "student")
        # unweighted losses should be within a loose tolerance
        a = float(lm_jvp["unweighted_scm_loss"])
        c = float(lm_fd["unweighted_scm_loss"])
        assert abs(a - c) / max(abs(a), 1e-8) < 0.35

    def test_scd_with_teacher(self):
        config = shrink(create_scm())
        config.model.loss_config.use_cd = True
        model, state = build(config)
        _step_and_check(model, state, {"total_loss", "scm_loss"})


class TestMeanFlow:
    def _config(self):
        config = shrink(create_mf(), r_timestep=True, schedule="rf")
        config.model.sample_t_cfg.time_dist_type = "logitnormal"
        config.model.sample_t_cfg.min_t = 0.001
        config.model.sample_t_cfg.max_t = 0.999
        return config

    def test_mf_opt_grad(self):
        config = self._config()
        model, state = build(config)
        _step_and_check(model, state,
                        {"total_loss", "mf_loss", "v_loss", "jvp_norm",
                         "tangent_norm", "v_norm"})

    def test_mf_l2(self):
        config = self._config()
        config.model.loss_config.loss_type = "l2"
        model, state = build(config)
        _step_and_check(model, state, {"total_loss", "mf_loss"})

    def test_mf_finite_diff(self):
        config = self._config()
        config.model.loss_config.use_jvp_finite_diff = True
        model, state = build(config)
        _step_and_check(model, state, {"total_loss", "mf_loss"})

    def test_mf_cfg_mix(self):
        config = self._config()
        config.model.guidance_scale = 2.0
        config.model.cond_dropout_prob = 0.2
        model, state = build(config)
        _step_and_check(model, state, {"total_loss", "mf_loss"})

    def test_mf_sampler(self):
        config = self._config()
        model, state = build(config)
        noise = jax.random.normal(KEY, (2, 16, 16, 3))
        cond = jax.nn.one_hot(jnp.array([0, 1]), 10)
        for stype in ["sde", "ode"]:
            out = model.generator_fn(state.params["net"], noise, rng=KEY,
                                     student_sample_steps=2, condition=cond,
                                     student_sample_type=stype)
            assert out.shape == noise.shape and bool(jnp.isfinite(out).all())
