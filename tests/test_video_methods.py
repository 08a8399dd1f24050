"""CausVid / Self-Forcing tests at toy video size (mirrors the reference's
``test_causvidmodel.py`` / ``test_sfmodel.py``)."""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.configs.methods.config_causvid import create_config as create_causvid
from fastgen_tpu.configs.methods.config_self_forcing import (
    create_config as create_self_forcing)
from fastgen_tpu.configs.net import CausalWan_Test_Config, Wan_Test_Config
from fastgen_tpu.utils import instantiate

KEY = jax.random.PRNGKey(0)
SHAPE = [4, 8, 8, 4]  # [T, H, W, C]


def shrink(config):
    config.model.net = copy.deepcopy(CausalWan_Test_Config)
    config.model.teacher = copy.deepcopy(Wan_Test_Config)
    config.model.input_shape = list(SHAPE)
    config.model.use_ema = False
    config.model.student_sample_steps = 2
    return config


def batch(n=2):
    x = jax.random.normal(KEY, (n, *SHAPE))
    cond = {"text_embeds": jax.random.normal(KEY, (n, 6, 32))}
    neg = {"text_embeds": jnp.zeros((n, 6, 32))}
    return {"real": x, "condition": cond, "neg_condition": neg}


def build(config):
    model = instantiate(config.model_class, config=config.model)
    model.init_optimizers()
    return model, model.init_state(KEY)


def _delta(a, b):
    return sum(float(jnp.sum(jnp.abs(x - y))) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


class TestCausVid:
    @pytest.fixture(scope="class")
    def setup(self):
        return build(shrink(create_causvid()))

    def test_student_step(self, setup):
        model, state = setup
        lm, out = model.compute_losses(state.params, batch(), KEY,
                                       state.iteration, "student")
        assert {"total_loss", "vsd_loss"} <= set(lm)
        for v in lm.values():
            assert np.isfinite(float(v))

    def test_critic_step(self, setup):
        model, state = setup
        lm, _ = model.compute_losses(state.params, batch(), KEY,
                                     state.iteration, "critic")
        assert {"total_loss", "fake_score_loss"} <= set(lm)
        assert np.isfinite(float(lm["total_loss"]))

    def test_inhom_t_structure(self, setup):
        model, state = setup
        b = batch()
        noisy, t_inhom, t, eps = model._generate_noise_and_time(KEY, b["real"])
        assert t_inhom.shape == (2, 4)
        assert t.shape == (2,)
        ti = np.asarray(t_inhom)
        # first chunk (2 frames) shares t; second chunk shares t
        assert ti[0, 0] == ti[0, 1] and ti[0, 2] == ti[0, 3]

    def test_ar_generation(self, setup):
        model, state = setup
        noise = jax.random.normal(KEY, (2, *SHAPE))
        cond = batch()["condition"]
        out = model.generator_fn(state.params["net"], noise, rng=KEY,
                                 student_sample_steps=2, condition=cond)
        assert out.shape == noise.shape and bool(jnp.isfinite(out).all())

    def test_train_step_jit(self, setup):
        model, state = setup
        # at init fake_score == teacher so the VSD gradient is exactly zero
        # (reference behaves identically); perturb fake_score to get signal
        state = state.replace(params={
            **state.params,
            "fake_score": jax.tree_util.tree_map(
                lambda p: p + 0.01 * jnp.ones_like(p), state.params["fake_score"]),
        })
        step = jax.jit(model.make_train_step("student"))
        ns, lm, _ = step(state, batch(), KEY)
        assert _delta(ns.params["net"], state.params["net"]) > 0
        assert _delta(ns.params["teacher"], state.params["teacher"]) == 0


class TestSelfForcing:
    @pytest.fixture(scope="class")
    def setup(self):
        return build(shrink(create_self_forcing()))

    def test_phase_encoding(self, setup):
        model, state = setup
        assert model.phases == ("student_exit0", "student_exit1", "critic")
        freq = model.config.student_update_freq
        assert model.phase_for_iteration(1) == "critic"
        p = model.phase_for_iteration(freq)
        assert p.startswith("student_exit")
        # deterministic per iteration
        assert model.phase_for_iteration(freq) == p

    def test_rollout_shapes_and_grad(self, setup):
        model, state = setup
        noise = jax.random.normal(KEY, (2, *SHAPE))
        cond = batch()["condition"]

        def gen_loss(params_net):
            params = dict(state.params)
            params["net"] = params_net
            out = model.rollout_with_gradient(params, noise, KEY, condition=cond,
                                              exit_step=1)
            return jnp.mean(out ** 2)

        g = jax.grad(gen_loss)(state.params["net"])
        gnorm = sum(float(jnp.sum(jnp.abs(x)))
                    for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_no_grad_when_disabled(self, setup):
        model, state = setup
        noise = jax.random.normal(KEY, (2, *SHAPE))
        cond = batch()["condition"]

        def gen_loss(params_net):
            params = dict(state.params)
            params["net"] = params_net
            out = model.rollout_with_gradient(params, noise, KEY, condition=cond,
                                              exit_step=0, enable_gradient=False)
            return jnp.mean(out ** 2)

        g = jax.grad(gen_loss)(state.params["net"])
        gnorm = sum(float(jnp.sum(jnp.abs(x)))
                    for x in jax.tree_util.tree_leaves(g))
        assert gnorm == 0.0

    def test_student_exit_phase_loss(self, setup):
        model, state = setup
        lm, _ = model.compute_losses(state.params, batch(), KEY,
                                     state.iteration, "student_exit1")
        assert np.isfinite(float(lm["total_loss"]))
