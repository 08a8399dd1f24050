"""EDM network tests: forward shapes/finiteness, pred-type conversion,
feature extraction, preconditioning, sampling (mirrors the reference's
``tests/test_network.py`` coverage for EDM at toy size)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.networks.edm.network import (
    EDMPrecond, SongUNet, precond_input, precond_output)

KEY = jax.random.PRNGKey(0)


def tiny_net(model_type="SongUNet", **over):
    kwargs = dict(model_channels=16, channel_mult=[1, 2], num_blocks=2,
                  attn_resolutions=[8], dropout=0.1)
    kwargs.update(over)
    return EDMPrecond(img_resolution=16, img_channels=3, label_dim=10,
                      model_type=model_type, model_kwargs=kwargs)


@pytest.fixture(scope="module")
def net_and_params():
    net = tiny_net()
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([1.0, 10.0], jnp.float32)
    cond = jax.nn.one_hot(jnp.array([1, 2]), 10)
    params = net.init({"params": KEY}, x, t, condition=cond)
    return net, params


def _inputs(b=2):
    k1, k2 = jax.random.split(KEY)
    x = jax.random.normal(k1, (b, 16, 16, 3))
    t = jnp.array([0.5, 20.0], jnp.float32)[:b]
    cond = jax.nn.one_hot(jnp.arange(b) % 10, 10)
    return x, t, cond


@pytest.mark.parametrize("model_type", ["SongUNet", "DhariwalUNet"])
def test_forward_shape_finite(model_type):
    net = tiny_net(model_type)
    x, t, cond = _inputs()
    params = net.init({"params": KEY}, x, t, condition=cond)
    out = net.apply(params, x, t, condition=cond)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_pred_type_conversion_consistency(net_and_params):
    net, params = net_and_params
    x, t, cond = _inputs()
    x0 = net.apply(params, x, t, condition=cond, fwd_pred_type="x0")
    eps = net.apply(params, x, t, condition=cond, fwd_pred_type="eps")
    ns = net.noise_scheduler
    np.testing.assert_allclose(np.asarray(ns.x0_to_eps(x, x0, t)), np.asarray(eps),
                               rtol=1e-4, atol=1e-4)


def test_feature_extraction(net_and_params):
    net, params = net_and_params
    x, t, cond = _inputs()
    feats = net.apply(params, x, t, condition=cond, feature_indices=(0, 1),
                      return_features_early=True)
    assert len(feats) == 2
    assert feats[0].shape == (2, 16, 16, 16)
    assert feats[1].shape == (2, 8, 8, 32)
    # early-exit with no indices returns empty
    assert net.apply(params, x, t, condition=cond, return_features_early=True) == []
    # full forward + features
    out, feats2 = net.apply(params, x, t, condition=cond, feature_indices=(0, 1))
    assert out.shape == x.shape
    for a, b in zip(feats, feats2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_logvar(net_and_params):
    net, params = net_and_params
    x, t, cond = _inputs()
    out, logvar = net.apply(params, x, t, condition=cond, return_logvar=True)
    assert logvar.shape == (2, 1)
    assert bool(jnp.isfinite(logvar).all())


def test_precond_math():
    x = jnp.ones((2, 4, 4, 3))
    t = jnp.array([2.0, 0.5])
    xi, ti, _ = precond_input(x, t, sigma_data=0.5)
    c_in = 1 / np.sqrt(0.25 + np.asarray(t) ** 2)
    np.testing.assert_allclose(np.asarray(xi)[:, 0, 0, 0], c_in, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ti), np.log(np.asarray(t)) / 4, rtol=1e-6)
    out = precond_output(jnp.ones_like(x), x, t, sigma_data=0.5)
    c_skip = 0.25 / (np.asarray(t) ** 2 + 0.25)
    c_out = np.asarray(t) * 0.5 / np.sqrt(np.asarray(t) ** 2 + 0.25)
    np.testing.assert_allclose(np.asarray(out)[:, 0, 0, 0], c_skip + c_out, rtol=1e-6)


def test_unconditional_uses_zero_labels(net_and_params):
    net, params = net_and_params
    x, t, _ = _inputs()
    out = net.apply(params, x, t, condition=None)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())


def test_dropout_rng_changes_output(net_and_params):
    net, params = net_and_params
    x, t, cond = _inputs()
    o1 = net.apply(params, x, t, condition=cond, train=True,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = net.apply(params, x, t, condition=cond, train=True,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    # at init conv1 is ~zero-scaled (init_weight=1e-5) so the dropout effect is
    # tiny but must be exactly nonzero
    assert float(np.abs(np.asarray(o1) - np.asarray(o2)).max()) > 0
    # eval mode is deterministic
    o3 = net.apply(params, x, t, condition=cond)
    o4 = net.apply(params, x, t, condition=cond)
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o4))


def test_sample_loop(net_and_params):
    net, params = net_and_params
    noise = jax.random.normal(KEY, (2, 16, 16, 3))
    cond = jax.nn.one_hot(jnp.array([3, 4]), 10)
    out = net.apply(params, noise, num_steps=4, method=net.sample,
                    condition=cond, guidance_scale=None)
    assert out.shape == noise.shape and bool(jnp.isfinite(out).all())
    # CFG path
    neg = jnp.zeros_like(cond)
    out_cfg = net.apply(params, noise, num_steps=2, method=net.sample,
                        condition=cond, neg_condition=neg, guidance_scale=3.0)
    assert out_cfg.shape == noise.shape and bool(jnp.isfinite(out_cfg).all())


def test_r_timestep_input():
    net = EDMPrecond(img_resolution=16, img_channels=3, label_dim=0,
                     model_type="SongUNet",
                     model_kwargs=dict(model_channels=16, channel_mult=[1, 2],
                                       num_blocks=1, attn_resolutions=[],
                                       dropout=0.0, r_timestep=True))
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    t = jnp.array([1.0, 2.0])
    r = jnp.array([0.5, 1.0])
    params = net.init({"params": KEY}, x, t, r=r)
    out = net.apply(params, x, t, r=r)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())


def test_grad_flows(net_and_params):
    net, params = net_and_params
    x, t, cond = _inputs()

    def loss_fn(p):
        out = net.apply(p, x, t, condition=cond)
        return jnp.mean(out ** 2)

    g = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
