"""LTX2 video DiT tests (ref ``fastgen/networks/LTX2/``): forward shapes,
pack/unpack inverse, per-token (forcing) timesteps, feature taps, logvar head,
pred-type conversion, and the SFT train-step integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.networks.ltx2.network import LTX2VideoDiT, pack_latents, unpack_latents


@pytest.fixture(scope="module")
def net_and_params():
    net = LTX2VideoDiT(in_channels=4, out_channels=4, num_heads=2, head_dim=12,
                       num_layers=2, caption_channels=16, rope_max_seq_len=64)
    x = jnp.zeros((1, 3, 4, 4, 4))
    t = jnp.ones((1,))
    params = net.init(jax.random.PRNGKey(0), x, t)
    return net, params


def test_pack_unpack_inverse():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 6, 6, 3), jnp.float32)
    tok = pack_latents(x, patch_size=2, patch_size_t=2)
    assert tok.shape == (2, 2 * 3 * 3, 2 * 2 * 2 * 3)
    back = unpack_latents(tok, (2, 3, 3), 3, patch_size=2, patch_size_t=2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_forward_shape_and_finite(net_and_params):
    net, params = net_and_params
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4, 4, 4), jnp.float32)
    t = jnp.asarray([0.5, 0.9])
    cond = {"text_embeds": jnp.zeros((2, 5, 16))}
    out = net.apply(params, x, t, condition=cond)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_per_token_timesteps(net_and_params):
    """Diffusion-forcing per-frame t must differ from homogeneous t."""
    net, params = net_and_params
    x = jnp.asarray(np.random.RandomState(1).randn(1, 3, 4, 4, 4), jnp.float32)
    t_hom = jnp.full((1,), 0.7)
    t_frames = jnp.asarray([[0.7, 0.3, 0.1]])
    out_hom = net.apply(params, x, t_hom, fwd_pred_type="flow")
    out_inh = net.apply(params, x, t_frames, fwd_pred_type="flow")
    assert out_inh.shape == x.shape
    assert not np.allclose(np.asarray(out_hom), np.asarray(out_inh))
    # homogeneous per-frame t == scalar t
    out_same = net.apply(params, x, jnp.full((1, 3), 0.7), fwd_pred_type="flow")
    np.testing.assert_allclose(np.asarray(out_hom), np.asarray(out_same),
                               atol=1e-5)


def test_feature_taps_and_logvar(net_and_params):
    net, params = net_and_params
    x = jnp.zeros((1, 3, 4, 4, 4))
    t = jnp.ones((1,))
    feats = net.apply(params, x, t, feature_indices=(0, 1),
                      return_features_early=True)
    assert len(feats) == 2 and feats[0].shape == (1, 3, 4, 4, 24)
    (out, feats), logvar = net.apply(params, x, t, feature_indices=(1,),
                                     return_logvar=True)
    assert out.shape == x.shape and logvar.shape == (1, 1)


def test_pred_type_conversion(net_and_params):
    net, params = net_and_params
    x = jnp.asarray(np.random.RandomState(2).randn(1, 3, 4, 4, 4), jnp.float32)
    t = jnp.full((1,), 0.5)
    x0 = net.apply(params, x, t, fwd_pred_type="x0")
    flow = net.apply(params, x, t, fwd_pred_type="flow")
    ns = net.noise_scheduler
    np.testing.assert_allclose(np.asarray(ns.flow_to_x0(x, flow, t)),
                               np.asarray(x0), atol=1e-4, rtol=1e-4)


def test_sft_train_step():
    """LTX2 through the SFT method: one step, finite loss."""
    import copy
    from fastgen_tpu.configs.methods.config_sft import create_config
    from fastgen_tpu.configs.net import LTX2_Test_Config
    from fastgen_tpu.utils import instantiate

    config = create_config()
    config.model.net = copy.deepcopy(LTX2_Test_Config)
    config.model.input_shape = [3, 4, 4, 4]
    config.model.use_ema = False
    model = instantiate(config.model_class, config=config.model)
    state = model.init_state(jax.random.PRNGKey(0))
    batch = {"real": jnp.asarray(np.random.RandomState(0).randn(2, 3, 4, 4, 4),
                                 jnp.float32),
             "condition": {"text_embeds": jnp.zeros((2, 4, 32))},
             "neg_condition": {"text_embeds": jnp.zeros((2, 4, 32))}}
    step = jax.jit(model.make_train_step("student"), donate_argnums=0)
    state2, loss_map, _ = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss_map["total_loss"]))
    assert int(state2.iteration) == 1
