"""LTX2 video DiT tests (ref ``fastgen/networks/LTX2/``): forward shapes,
pack/unpack inverse, per-token (forcing) timesteps, feature taps, logvar head,
pred-type conversion, and the SFT train-step integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.networks.ltx2.network import LTX2VideoDiT, pack_latents, unpack_latents


# >60s on the single-core dev box (torch-replica / large-module builds): excluded
# from the quick tier (`make pytest`); run via `make pytest-all`.
pytestmark = pytest.mark.slow


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


# ----------------------------------------------------------- LTX2 RoPE parity


def _ref_rope_interleaved(coords, dim, max_positions, theta=10000.0):
    """torch transliteration of the reference rope forward
    (``transformer_ltx2.py:727-765``, interleaved branch) for parity."""
    import torch

    coords = torch.as_tensor(coords).float()[None]      # [1, A, N, 2]
    num_pos_dims = coords.shape[1]
    start, end = coords.chunk(2, dim=-1)
    coords = ((start + end) / 2.0).squeeze(-1)
    grid = torch.stack([coords[:, i] / max_positions[i]
                        for i in range(num_pos_dims)], dim=-1)
    num_rope_elems = num_pos_dims * 2
    pow_indices = torch.pow(theta, torch.linspace(0.0, 1.0,
                                                  dim // num_rope_elems,
                                                  dtype=torch.float64))
    freqs = (pow_indices * torch.pi / 2.0).to(torch.float32)
    freqs = (grid.unsqueeze(-1) * 2 - 1) * freqs
    freqs = freqs.transpose(-1, -2).flatten(2)
    cos = freqs.cos().repeat_interleave(2, dim=-1)
    sin = freqs.sin().repeat_interleave(2, dim=-1)
    if dim % num_rope_elems != 0:
        pad_c = torch.ones_like(cos[:, :, : dim % num_rope_elems])
        pad_s = torch.zeros_like(cos[:, :, : dim % num_rope_elems])
        cos = torch.cat([pad_c, cos], dim=-1)
        sin = torch.cat([pad_s, sin], dim=-1)
    return cos[0].numpy(), sin[0].numpy()


def _ref_apply_interleaved(x, cos, sin):
    """``transformer_ltx2.py:38-43``."""
    import torch

    x = torch.as_tensor(x)
    cos = torch.as_tensor(cos)[None]
    sin = torch.as_tensor(sin)[None]
    x_real, x_imag = x.unflatten(2, (-1, 2)).unbind(-1)
    x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(2)
    return (x.float() * cos + x_rot.float() * sin).numpy()


def test_rope_matches_reference_math():
    from fastgen_tpu.networks.ltx2.network import (ltx2_rope,
                                                   prepare_video_coords,
                                                   prepare_audio_coords)

    # video: 2x3x3 latent grid, dim 24 (pads 24 % 6 = 0), and dim 26 (pad 2)
    coords = prepare_video_coords(2, 3, 3, fps=24.0)
    for dim in (24, 36):
        cos, sin = ltx2_rope(coords, dim, (20, 2048, 2048))
        rc, rs = _ref_rope_interleaved(coords, dim, (20.0, 2048.0, 2048.0))
        np.testing.assert_allclose(np.asarray(cos), rc, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sin), rs, atol=1e-6)
    # audio: time-only coords, 1 pos dim
    ac = prepare_audio_coords(5)
    cos, sin = ltx2_rope(ac, 16, (20,))
    rc, rs = _ref_rope_interleaved(ac, 16, (20.0,))
    np.testing.assert_allclose(np.asarray(cos), rc, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), rs, atol=1e-6)


def test_apply_rope_matches_reference():
    from fastgen_tpu.networks.ltx2.network import (apply_interleaved_rope,
                                                   ltx2_rope,
                                                   prepare_video_coords)

    rs = np.random.RandomState(0)
    coords = prepare_video_coords(2, 2, 2)
    cos, sin = ltx2_rope(coords, 24, (20, 2048, 2048))
    x = rs.randn(2, 8, 24).astype(np.float32)
    ours = apply_interleaved_rope(jnp.asarray(x), cos, sin)
    ref = _ref_apply_interleaved(x, np.asarray(cos), np.asarray(sin))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_split_rope_shapes():
    from fastgen_tpu.networks.ltx2.network import (apply_split_rope, ltx2_rope,
                                                   prepare_video_coords)

    coords = prepare_video_coords(2, 2, 2)
    cos, sin = ltx2_rope(coords, 24, (20, 2048, 2048), rope_type="split",
                         num_heads=2)
    assert cos.shape == (2, 8, 6)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 2, 12), jnp.float32)
    out = apply_split_rope(x, cos, sin)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------------- audio branch


@pytest.fixture(scope="module")
def av_net_and_params():
    net = LTX2VideoDiT(in_channels=4, out_channels=4, num_heads=2, head_dim=12,
                       num_layers=2, caption_channels=16, audio_enabled=True,
                       audio_in_channels=6, audio_out_channels=6,
                       audio_num_heads=2, audio_head_dim=6)
    x = jnp.zeros((1, 3, 4, 4, 4))
    t = jnp.ones((1,))
    params = net.init(jax.random.PRNGKey(0), x, t,
                      audio_latents=jnp.zeros((1, 5, 6)))
    return net, params


def test_av_forward(av_net_and_params):
    net, params = av_net_and_params
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 3, 4, 4, 4), jnp.float32)
    t = jnp.asarray([0.5, 0.9])
    cond = {"text_embeds": jnp.asarray(rs.randn(2, 5, 16), jnp.float32),
            "audio_latents": jnp.asarray(rs.randn(2, 7, 6), jnp.float32)}
    video, audio = net.apply(params, x, t, condition=cond)
    assert video.shape == x.shape
    assert audio.shape == (2, 7, 6)
    assert np.isfinite(np.asarray(video)).all()
    assert np.isfinite(np.asarray(audio)).all()
    # unpacked mel layout round-trips
    from fastgen_tpu.networks.ltx2.network import (pack_audio_latents,
                                                   unpack_audio_latents)
    mel = jnp.asarray(rs.randn(2, 7, 3, 2), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(unpack_audio_latents(pack_audio_latents(mel), 3)),
        np.asarray(mel))


def test_av_net_video_only_matches_video_net(av_net_and_params):
    """With no audio input, the AV net's video path equals the video-only net
    on shared weights (the reference trains exactly this configuration,
    ``LTX2/network.py:434-445`` strict=False audio-key drop)."""
    av_net, av_params = av_net_and_params
    video_net = LTX2VideoDiT(in_channels=4, out_channels=4, num_heads=2,
                             head_dim=12, num_layers=2, caption_channels=16)
    v_params = video_net.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 4, 4, 4)),
                              jnp.ones((1,)))

    def graft(dst, src):
        out = {}
        for k, v in dst.items():
            out[k] = graft(v, src[k]) if isinstance(v, dict) else src[k]
        return out

    v_params = {"params": graft(v_params["params"], av_params["params"])}
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 3, 4, 4, 4), jnp.float32)
    t = jnp.asarray([0.4])
    cond = {"text_embeds": jnp.asarray(rs.randn(1, 5, 16), jnp.float32)}
    out_av = av_net.apply(av_params, x, t, condition=cond)
    out_v = video_net.apply(v_params, x, t, condition=cond)
    np.testing.assert_allclose(np.asarray(out_av), np.asarray(out_v),
                               atol=1e-6)


def test_sample_dynamic_shift():
    """The pipeline's dynamic sigma shift produces a valid decreasing
    schedule and a finite sample (``pipeline_ltx2.py:85-97``)."""
    from fastgen_tpu.networks.ltx2.network import calculate_shift, shift_sigmas

    mu = calculate_shift(8 * 4 * 4)
    sig = shift_sigmas(np.linspace(1.0, 0.01, 8), mu)
    assert np.all(np.diff(sig) < 0) and sig[0] <= 1.0
    net = LTX2VideoDiT(in_channels=4, out_channels=4, num_heads=2, head_dim=12,
                       num_layers=1, caption_channels=16)
    x = jnp.zeros((1, 3, 4, 4, 4))
    params = net.init(jax.random.PRNGKey(0), x, jnp.ones((1,)))
    sample = net.apply(params, jnp.asarray(
        np.random.RandomState(3).randn(1, 3, 4, 4, 4), jnp.float32),
        num_steps=3, guidance_scale=None, method=net.sample)
    assert sample.shape == x.shape
    assert np.isfinite(np.asarray(sample)).all()
