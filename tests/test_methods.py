"""Method unit tests at toy size (mirrors the reference's per-method test files,
e.g. ``tests/test_dmd2model.py``: loss keys per phase, output tensors, and that
non-trainable nets' params stay untouched per phase)."""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.configs.experiments.EDM.config_dmd2_test import (
    create_config as create_dmd2_test_config)
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.data import Synthetic_Loader_Config
from fastgen_tpu.configs.net import EDM_Test_Config
from fastgen_tpu.utils import instantiate

KEY = jax.random.PRNGKey(0)


def make_batch(config, batch_size=4):
    shape = tuple(config.model.input_shape)
    k1, k2 = jax.random.split(KEY)
    x = jax.random.normal(k1, (batch_size,) + shape)
    cond = jax.nn.one_hot(jnp.arange(batch_size) % 10, 10)
    return {"real": x, "condition": cond, "neg_condition": jnp.zeros_like(cond)}


@pytest.fixture(scope="module")
def dmd2():
    config = create_dmd2_test_config()
    model = instantiate(config.model_class, config=config.model)
    model.init_optimizers()
    state = model.init_state(KEY)
    return config, model, state


@pytest.fixture(scope="module")
def sft():
    config = create_sft_config()
    config.model.net = copy.deepcopy(EDM_Test_Config)
    config.model.input_shape = [16, 16, 3]
    config.model.use_ema = [0.99]
    config.dataloader_train = copy.deepcopy(Synthetic_Loader_Config)
    model = instantiate(config.model_class, config=config.model)
    model.init_optimizers()
    state = model.init_state(KEY)
    return config, model, state


def _params_delta(a, b):
    return sum(float(jnp.sum(jnp.abs(x - y)))
               for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


class TestSFT:
    def test_loss_keys_and_finite(self, sft):
        config, model, state = sft
        batch = make_batch(config)
        loss_map, outputs = model.compute_losses(state.params, batch, KEY,
                                                 state.iteration, "student")
        assert set(loss_map) == {"total_loss", "dsm_loss"}
        assert np.isfinite(float(loss_map["total_loss"]))
        assert outputs["gen_train"].shape == batch["real"].shape

    def test_train_step_updates_net_and_ema(self, sft):
        config, model, state = sft
        batch = make_batch(config)
        step = jax.jit(model.make_train_step("student"))
        new_state, loss_map, _ = step(state, batch, KEY)
        assert int(new_state.iteration) == int(state.iteration) + 1
        assert _params_delta(new_state.params["net"], state.params["net"]) > 0
        # EMA moved toward the new params
        assert _params_delta(new_state.ema["ema_0.99"], state.ema["ema_0.99"]) > 0
        assert "grad_norm" in loss_map

    def test_cond_dropout(self, sft):
        config, model, state = sft
        config.model.cond_dropout_prob = 1.0  # always replace with neg
        batch = make_batch(config)
        mixed = model.mix_condition(KEY, batch["condition"], batch["neg_condition"], 1.0)
        np.testing.assert_allclose(np.asarray(mixed), np.asarray(batch["neg_condition"]))
        config.model.cond_dropout_prob = None


class TestDMD2:
    def test_phase_routing(self, dmd2):
        config, model, state = dmd2
        freq = config.model.student_update_freq
        assert model.phase_for_iteration(0) == "student"
        assert model.phase_for_iteration(freq) == "student"
        assert model.phase_for_iteration(1) == "critic"
        assert model.phases == ("student", "critic")

    def test_fake_score_starts_from_teacher(self, dmd2):
        config, model, state = dmd2
        assert _params_delta(state.params["fake_score"], state.params["teacher"]) == 0

    def test_student_phase_losses(self, dmd2):
        config, model, state = dmd2
        batch = make_batch(config)
        loss_map, outputs = model.compute_losses(state.params, batch, KEY,
                                                 state.iteration, "student")
        assert {"total_loss", "vsd_loss", "gan_loss_gen"} <= set(loss_map)
        for v in loss_map.values():
            assert np.isfinite(float(v))
        assert "gen_rand" in outputs

    def test_critic_phase_losses(self, dmd2):
        config, model, state = dmd2
        batch = make_batch(config)
        loss_map, _ = model.compute_losses(state.params, batch, KEY,
                                           state.iteration, "critic")
        assert {"total_loss", "fake_score_loss", "gan_loss_disc"} <= set(loss_map)
        for v in loss_map.values():
            assert np.isfinite(float(v))

    def test_student_step_only_touches_net(self, dmd2):
        config, model, state = dmd2
        batch = make_batch(config)
        step = jax.jit(model.make_train_step("student"))
        new_state, _, _ = step(state, batch, KEY)
        assert _params_delta(new_state.params["net"], state.params["net"]) > 0
        assert _params_delta(new_state.params["fake_score"], state.params["fake_score"]) == 0
        assert _params_delta(new_state.params["teacher"], state.params["teacher"]) == 0
        assert _params_delta(new_state.params["discriminator"],
                             state.params["discriminator"]) == 0

    def test_critic_step_only_touches_critics(self, dmd2):
        config, model, state = dmd2
        batch = make_batch(config)
        step = jax.jit(model.make_train_step("critic"))
        new_state, _, _ = step(state, batch, KEY)
        assert _params_delta(new_state.params["net"], state.params["net"]) == 0
        assert _params_delta(new_state.params["fake_score"], state.params["fake_score"]) > 0
        assert _params_delta(new_state.params["discriminator"],
                             state.params["discriminator"]) > 0
        assert _params_delta(new_state.params["teacher"], state.params["teacher"]) == 0
        # EMA only moves on student steps
        for name in state.ema:
            assert _params_delta(new_state.ema[name], state.ema[name]) == 0

    def test_grad_accum_equivalence(self, dmd2):
        """Two half-batches summed == one full batch (linear losses in batch
        means this only holds approximately; check grads add consistently)."""
        config, model, state = dmd2
        batch = make_batch(config, batch_size=4)
        gstep = jax.jit(model.make_grad_step("critic"))
        astep = jax.jit(model.make_apply_step("critic"))
        g1, lm1, _ = gstep(state, batch, KEY)
        g2, lm2, _ = gstep(state, batch, KEY)
        # same batch+rng -> identical grads
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        gsum = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
        new_state = astep(state, gsum)
        assert int(new_state.iteration) == int(state.iteration) + 1

    def test_generator_fn_multistep(self, dmd2):
        config, model, state = dmd2
        noise = jax.random.normal(KEY, (2,) + tuple(config.model.input_shape))
        cond = jax.nn.one_hot(jnp.array([0, 1]), 10)
        for steps, stype in [(1, "sde"), (2, "sde"), (4, "ode")]:
            out = model.generator_fn(state.params["net"], noise, rng=KEY,
                                     student_sample_steps=steps, condition=cond,
                                     student_sample_type=stype)
            assert out.shape == noise.shape
            assert bool(jnp.isfinite(out).all())
