"""EDM2 magnitude-preserving UNet tests (mirrors the reference's EDM2 coverage
+ ForcedWeightNorm semantics)."""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.configs.methods.config_cm import create_config as create_cm
from fastgen_tpu.configs.net import EDM2_Test_Config
from fastgen_tpu.networks.edm2.network import (
    mp_cat,
    mp_silu,
    mp_sum,
    normalize,
    normalize_weights,
)
from fastgen_tpu.utils import instantiate

KEY = jax.random.PRNGKey(0)


def test_mp_primitives_preserve_magnitude():
    x = jax.random.normal(KEY, (4096,))
    y = jax.random.normal(jax.random.fold_in(KEY, 1), (4096,))
    # mp_silu: std of silu(N(0,1)) is ~0.596
    assert abs(float(jnp.std(mp_silu(x))) - 1.0) < 0.1
    # mp_sum of two unit-variance signals stays unit variance
    assert abs(float(jnp.std(mp_sum(x, y))) - 1.0) < 0.05
    # mp_cat too
    assert abs(float(jnp.std(mp_cat(x[None], y[None]))) - 1.0) < 0.05
    # normalize makes unit-magnitude rows
    w = jax.random.normal(KEY, (8, 64)) * 3.0
    wn = normalize(w)
    np.testing.assert_allclose(np.asarray(jnp.sum(wn**2, axis=1)),
                               np.full(8, 64 / 8.0 * 8 / 64 * 64), rtol=1e-2)


@pytest.fixture(scope="module")
def net_and_params():
    net = instantiate(copy.deepcopy(EDM2_Test_Config))
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([1.0, 10.0])
    cond = jax.nn.one_hot(jnp.array([1, 2]), 10)
    params = net.init({"params": KEY}, x, t, condition=cond)
    return net, params


def test_forward_and_logvar(net_and_params):
    net, params = net_and_params
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    t = jnp.array([1.0, 10.0])
    cond = jax.nn.one_hot(jnp.array([1, 2]), 10)
    out, logvar = net.apply(params, x, t, condition=cond, return_logvar=True)
    assert out.shape == x.shape and logvar.shape == (2, 1)
    assert bool(jnp.isfinite(out).all())


def test_features_and_pred_types(net_and_params):
    net, params = net_and_params
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    t = jnp.array([1.0, 10.0])
    cond = jax.nn.one_hot(jnp.array([1, 2]), 10)
    feats = net.apply(params, x, t, condition=cond, feature_indices=(0, 1),
                      return_features_early=True)
    assert len(feats) == 2
    x0 = net.apply(params, x, t, condition=cond, fwd_pred_type="x0")
    eps = net.apply(params, x, t, condition=cond, fwd_pred_type="eps")
    ns = net.noise_scheduler
    np.testing.assert_allclose(np.asarray(ns.x0_to_eps(x, x0, t)), np.asarray(eps),
                               rtol=1e-3, atol=1e-3)


def test_normalize_weights_tree(net_and_params):
    net, params = net_and_params
    scaled = jax.tree_util.tree_map(lambda p: p * 3.0, params["params"])
    normed = normalize_weights(scaled)

    def check(tree, path=""):
        found = 0
        for k, v in tree.items():
            if k == "mp_weight":
                axes = tuple(range(v.ndim - 1))
                norms = np.asarray(jnp.sqrt(jnp.sum(v**2, axis=axes)))
                # per-output-channel magnitude restored to ~sqrt(fan_in_total/n_out)
                expected = np.sqrt(v.size / norms.size)
                np.testing.assert_allclose(norms, expected, rtol=1e-2)
                found += 1
            elif isinstance(v, dict):
                found += check(v, path + "/" + k)
        return found

    assert check(normed) > 10


def test_cm_training_with_edm2_applies_weight_norm():
    """Train CM on EDM2: after a step every mp_weight must be unit-normalized
    (ForcedWeightNormCallback fused into the step)."""
    config = create_cm()
    config.model.net = copy.deepcopy(EDM2_Test_Config)
    config.model.input_shape = [16, 16, 3]
    config.model.use_ema = False
    model = instantiate(config.model_class, config=config.model)
    model.init_optimizers()
    assert "net" in model.param_postprocessors
    state = model.init_state(KEY)
    batch = {"real": jax.random.normal(KEY, (4, 16, 16, 3)),
             "condition": jax.nn.one_hot(jnp.arange(4) % 10, 10),
             "neg_condition": jnp.zeros((4, 10))}
    step = jax.jit(model.make_train_step("student"))
    new_state, lm, _ = step(state, batch, KEY)
    assert np.isfinite(float(lm["total_loss"]))

    def check_normed(tree):
        ok = True
        for k, v in tree.items():
            if k == "mp_weight":
                axes = tuple(range(v.ndim - 1))
                norms = np.asarray(jnp.sqrt(jnp.sum(np.asarray(v)**2, axis=axes)))
                expected = np.sqrt(v.size / norms.size)
                ok &= np.allclose(norms, expected, rtol=1e-2)
            elif isinstance(v, dict):
                ok &= check_normed(v)
        return ok

    assert check_normed(new_state.params["net"]["params"])
