"""LADD / f-distill / KD method tests at toy size (mirrors the reference's
``test_laddmodel.py`` / ``test_f_distillmodel.py`` / ``test_kdmodel.py``)."""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.configs.discriminator import Discriminator_EDM_Test_Config
from fastgen_tpu.configs.methods.config_f_distill import create_config as create_fd
from fastgen_tpu.configs.methods.config_kd import create_config as create_kd
from fastgen_tpu.configs.methods.config_ladd import create_config as create_ladd
from fastgen_tpu.configs.net import EDM_Test_Config
from fastgen_tpu.utils import instantiate

KEY = jax.random.PRNGKey(0)


def shrink(config):
    config.model.net = copy.deepcopy(EDM_Test_Config)
    config.model.input_shape = [16, 16, 3]
    config.model.use_ema = False
    if hasattr(config.model, "discriminator"):
        config.model.discriminator = copy.deepcopy(Discriminator_EDM_Test_Config)
    return config


def batch(n=4, extra=None):
    x = jax.random.normal(KEY, (n, 16, 16, 3))
    cond = jax.nn.one_hot(jnp.arange(n) % 10, 10)
    b = {"real": x, "condition": cond, "neg_condition": jnp.zeros_like(cond)}
    if extra:
        b.update(extra)
    return b


def build(config):
    model = instantiate(config.model_class, config=config.model)
    model.init_optimizers()
    return model, model.init_state(KEY)


def _delta(a, b):
    return sum(float(jnp.sum(jnp.abs(x - y))) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


class TestLADD:
    def test_phases(self):
        model, state = build(shrink(create_ladd()))
        assert "fake_score" not in state.params
        b = batch()
        lm_s, _ = model.compute_losses(state.params, b, KEY, state.iteration, "student")
        assert set(lm_s) == {"total_loss", "gan_loss_gen"}
        lm_c, _ = model.compute_losses(state.params, b, KEY, state.iteration, "critic")
        assert {"total_loss", "gan_loss_disc"} <= set(lm_c)
        for lm in (lm_s, lm_c):
            for v in lm.values():
                assert np.isfinite(float(v))

    def test_param_isolation(self):
        model, state = build(shrink(create_ladd()))
        b = batch()
        s_step = jax.jit(model.make_train_step("student"))
        ns, _, _ = s_step(state, b, KEY)
        assert _delta(ns.params["net"], state.params["net"]) > 0
        assert _delta(ns.params["discriminator"], state.params["discriminator"]) == 0
        c_step = jax.jit(model.make_train_step("critic"))
        nc, _, _ = c_step(state, b, KEY)
        assert _delta(nc.params["net"], state.params["net"]) == 0
        assert _delta(nc.params["discriminator"], state.params["discriminator"]) > 0


class TestFdistill:
    @pytest.mark.parametrize("f_div", ["kl", "js", "rkl"])
    def test_divergences(self, f_div):
        config = shrink(create_fd())
        config.model.f_distill.f_div = f_div
        model, state = build(config)
        lm, out = model.compute_losses(state.params, batch(), KEY,
                                       state.iteration, "student")
        assert {"total_loss", "f_distill_loss", "gan_loss_gen",
                "min_h", "avg_h", "max_h"} <= set(lm)
        for v in lm.values():
            assert np.isfinite(float(v))

    def test_bins_update(self):
        config = shrink(create_fd())
        model, state = build(config)
        assert "fdistill" in state.params["net"]
        bins0 = state.params["net"]["fdistill"]["bins"]
        step = jax.jit(model.make_train_step("student"))
        new_state, _, out = step(state, batch(), KEY)
        bins1 = new_state.params["net"]["fdistill"]["bins"]
        assert _delta(bins1, bins0) > 0
        assert "_variable_updates" not in out

    def test_no_normalization(self):
        config = shrink(create_fd())
        config.model.f_distill.ratio_normalization = False
        model, state = build(config)
        assert "fdistill" not in state.params["net"]
        lm, _ = model.compute_losses(state.params, batch(), KEY,
                                     state.iteration, "student")
        assert np.isfinite(float(lm["total_loss"]))


class TestKD:
    def test_single_step_pairs(self):
        config = shrink(create_kd())
        model, state = build(config)
        noise = jax.random.normal(KEY, (4, 16, 16, 3)) * 80.0
        lm, out = model.compute_losses(state.params, batch(extra={"noise": noise}),
                                       KEY, state.iteration, "student")
        assert set(lm) == {"total_loss", "recon_loss"}
        assert np.isfinite(float(lm["total_loss"]))
        assert out["gen_rand"].shape == (4, 16, 16, 3)

    def test_multistep_path(self):
        config = shrink(create_kd())
        config.model.student_sample_steps = 2
        model, state = build(config)
        path = jax.random.normal(KEY, (4, 4, 16, 16, 3))
        lm, _ = model.compute_losses(state.params, batch(extra={"path": path}),
                                     KEY, state.iteration, "student")
        assert np.isfinite(float(lm["total_loss"]))

    def test_train_step(self):
        config = shrink(create_kd())
        model, state = build(config)
        step = jax.jit(model.make_train_step("student"))
        noise = jax.random.normal(KEY, (4, 16, 16, 3)) * 80.0
        ns, lm, _ = step(state, batch(extra={"noise": noise}), KEY)
        assert _delta(ns.params["net"], state.params["net"]) > 0
