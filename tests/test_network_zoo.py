"""Zoo-wide network tests at toy size: SD15/SDXL UNet, Flux MMDiT, CogVideoX,
Cosmos Predict2 (video2world), WanI2V/CausalWanI2V, VACEWan, video
discriminator heads (mirrors the per-backbone coverage of the reference's
``test_network.py``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.networks.cogvideox.network import CogVideoX
from fastgen_tpu.networks.cosmos.network import CosmosPredict2
from fastgen_tpu.networks.discriminators import Discriminator_VideoDiT
from fastgen_tpu.networks.flux.network import Flux
from fastgen_tpu.networks.sd.unet import StableDiffusion15, UNet2DCondition
from fastgen_tpu.networks.wan.network_i2v import CausalWanI2V, WanI2V
from fastgen_tpu.networks.wan.network_vace import VACEWan


# >60s on the single-core dev box (torch-replica / large-module builds): excluded
# from the quick tier (`make pytest`); run via `make pytest-all`.
pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)
WAN_KW = dict(dim=96, num_layers=2, num_heads=4, ffn_dim=128, in_channels=4,
              out_channels=4, text_dim=32, rope_max_seq_len=64)


def video_inputs(b=2):
    x = jax.random.normal(KEY, (b, 4, 8, 8, 4))
    t = jnp.array([0.5, 0.9])[:b]
    cond = {"text_embeds": jax.random.normal(KEY, (b, 6, 32))}
    return x, t, cond


class TestSDUNet:
    def test_tiny_unet_shapes(self):
        unet = UNet2DCondition(in_channels=4, out_channels=4,
                               block_out_channels=(16, 32), transformer_depths=(1, 0),
                               cross_attn_blocks=(True, False), fixed_num_heads=2,
                               context_dim=16)
        x = jax.random.normal(KEY, (2, 16, 16, 4))
        t = jnp.array([10.0, 500.0])
        ctx = jax.random.normal(KEY, (2, 7, 16))
        params = unet.init({"params": KEY}, x, t, ctx)
        out = unet.apply(params, x, t, ctx)
        assert out.shape == x.shape and bool(jnp.isfinite(out).all())
        feats = unet.apply(params, x, t, ctx, feature_indices=(0, 1, 2),
                           return_features_early=True)
        assert len(feats) == 3

    def test_sd15_pred_types(self):
        net = StableDiffusion15(context_dim=16)
        x = jax.random.normal(KEY, (1, 16, 16, 4))
        t = jnp.array([0.5])
        cond = {"text_embeds": jax.random.normal(KEY, (1, 7, 16))}
        params = net.init({"params": KEY}, x, t, condition=cond)
        eps = net.apply(params, x, t, condition=cond)  # native eps pred
        x0 = net.apply(params, x, t, condition=cond, fwd_pred_type="x0")
        ns = net.noise_scheduler
        np.testing.assert_allclose(np.asarray(ns.eps_to_x0(x, eps, t)),
                                   np.asarray(x0), rtol=1e-3, atol=1e-3)


class TestFlux:
    def test_forward_and_guidance(self):
        net = Flux(dim=128, num_layers=2, num_single_layers=2, num_heads=4,
                   in_channels=4, text_dim=32, pooled_dim=16)
        x, t, _ = video_inputs()
        x = jax.random.normal(KEY, (2, 8, 8, 4))
        cond = {"text_embeds": jax.random.normal(KEY, (2, 6, 32)),
                "pooled_embeds": jax.random.normal(KEY, (2, 16))}
        params = net.init({"params": KEY}, x, t, condition=cond)
        out = net.apply(params, x, t, condition=cond)
        assert out.shape == x.shape
        # embedded guidance changes the output
        o1 = net.apply(params, x, t, condition=cond, guidance=jnp.full((2,), 1.0))
        o2 = net.apply(params, x, t, condition=cond, guidance=jnp.full((2,), 5.0))
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestCogVideoX:
    @pytest.mark.parametrize("use_rotary", [False, True])
    def test_forward(self, use_rotary):
        # head_dim 16: the 5B RoPE split (d/4, 3d/8, 3d/8) needs % 16 == 0
        net = CogVideoX(dim=96, num_layers=2, num_heads=6, in_channels=4,
                        text_dim=32, use_rotary=use_rotary,
                        sample_frames=4, sample_height=8, sample_width=8)
        x, t, cond = video_inputs()
        params = net.init({"params": KEY}, x, t, condition=cond)
        out = net.apply(params, x, t, condition=cond)
        assert out.shape == x.shape and bool(jnp.isfinite(out).all())
        # v-pred conversion works on the zero-SNR schedule
        x0 = net.apply(params, x, t, condition=cond, fwd_pred_type="x0")
        assert bool(jnp.isfinite(x0).all())


class TestCosmos:
    def test_video2world_conditioning(self):
        net = CosmosPredict2(**WAN_KW)
        x, t, cond = video_inputs()
        cond = dict(cond)
        cond["conditioning_latents"] = jax.random.normal(KEY, (2, 4, 8, 8, 4))
        cond["condition_mask"] = jnp.concatenate(
            [jnp.ones((2, 1, 8, 8, 1)), jnp.zeros((2, 3, 8, 8, 1))], axis=1)
        params = net.init({"params": KEY}, x, t, condition=cond)
        out = net.apply(params, x, t, condition=cond, fwd_pred_type="x0")
        # conditioned first frame passes through exactly
        np.testing.assert_array_equal(np.asarray(out[:, 0]),
                                      np.asarray(cond["conditioning_latents"][:, 0]))
        # remat modes give identical results
        net_r = CosmosPredict2(remat_mode="block_wise", **WAN_KW)
        out_r = net_r.apply(params, x, t, condition=cond, fwd_pred_type="x0")
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-6)


class TestWanI2V:
    def test_first_frame_conditioning(self):
        x, t, cond = video_inputs()
        cond = dict(cond)
        cond["first_frame_cond"] = jax.random.normal(KEY, (2, 4, 8, 8, 8))
        net = WanI2V(image_embed_dim=16, **WAN_KW)
        params = net.init({"params": KEY}, x, t, condition=cond)
        out = net.apply(params, x, t, condition=cond)
        assert out.shape == x.shape
        # conditioning changes output
        cond2 = dict(cond)
        cond2["first_frame_cond"] = cond["first_frame_cond"] + 1.0
        out2 = net.apply(params, x, t, condition=cond2)
        assert not np.allclose(np.asarray(out), np.asarray(out2))
        # preserve_conditioning hook
        cond["first_frame_latent"] = x
        kept = net.preserve_conditioning(jnp.zeros_like(x), cond)
        np.testing.assert_array_equal(np.asarray(kept[:, 0]), np.asarray(x[:, 0]))

    def test_causal_i2v_ar_chunk(self):
        x, t, cond = video_inputs()
        cond = dict(cond)
        cond["first_frame_cond"] = jax.random.normal(KEY, (2, 4, 8, 8, 8))
        net = CausalWanI2V(chunk_size=2, total_num_frames=4, frame_height=8,
                           frame_width=8, **WAN_KW)
        params = net.init({"params": KEY}, x, t, condition=cond)
        cache = net.init_cache(2, dtype=jnp.float32)
        ckv = net.apply(params, cond, method=net.precompute_cross_kv)
        o, cache = net.apply(params, x[:, :2], t[:, None].repeat(2, 1), cache, 0,
                             condition=cond, cross_kv=ckv, method=net.forward_chunk)
        assert o.shape == (2, 2, 8, 8, 4)
        assert int(cache["len"]) == 2 * 16


class TestVACE:
    def test_context_injection(self):
        x, t, cond = video_inputs()
        cond = dict(cond)
        cond["vid_context"] = jax.random.normal(KEY, (2, 4, 8, 8, 4))
        net = VACEWan(num_vace_layers=1, **WAN_KW)
        params = net.init({"params": KEY}, x, t, condition=cond)
        out = net.apply(params, x, t, condition=cond)
        cond2 = dict(cond)
        cond2["vid_context"] = cond["vid_context"] * 2.0
        out2 = net.apply(params, x, t, condition=cond2)
        assert not np.allclose(np.asarray(out), np.asarray(out2))
        # no context -> still runs (pure T2V fallback)
        out3 = net.apply(params, x, t,
                         condition={"text_embeds": cond["text_embeds"]})
        assert out3.shape == x.shape


@pytest.mark.parametrize("disc_type", ["dit_simple_conv3d", "dit_conv3d",
                                       "dit_conv1d_2d", "dit_attention",
                                       "dit_factorized"])
def test_video_discriminator_heads(disc_type):
    d = Discriminator_VideoDiT(feature_indices=(0, 2), num_blocks=4,
                               inner_dim=32, disc_type=disc_type)
    feats = [jax.random.normal(KEY, (2, 4, 4, 4, 96)) for _ in range(2)]
    params = d.init({"params": KEY}, feats)
    logits = d.apply(params, feats)
    assert logits.ndim == 2 and logits.shape[0] == 2
    assert bool(jnp.isfinite(logits).all())


def test_cosmos_teacher_sampler_v2w():
    """Cosmos teacher sampler (ref ``cosmos_predict2/network.py:1093-1270``):
    flow-shift grid, CFG + SLG, conditioning frames pinned every step."""
    net = CosmosPredict2(**WAN_KW)
    x, t, cond = video_inputs()
    cond = dict(cond)
    cond["conditioning_latents"] = jax.random.normal(KEY, (2, 4, 8, 8, 4))
    cond["condition_mask"] = jnp.concatenate(
        [jnp.ones((2, 1, 8, 8, 1)), jnp.zeros((2, 3, 8, 8, 1))], axis=1)
    params = net.init({"params": KEY}, x, t, condition=cond)
    noise = jax.random.normal(jax.random.PRNGKey(5), x.shape)
    out = net.apply(params, noise, method=net.sample, condition=cond,
                    neg_condition=cond, guidance_scale=2.0, num_steps=2,
                    shift=5.0, skip_layers=(0,))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(
        np.asarray(out[:, 0]), np.asarray(cond["conditioning_latents"][:, 0]))
    # conditioned frames are embedded at conditional_frame_timestep=0 (ref
    # network.py:1229-1234); disabling it (negative) must change the
    # *generated* frames (different AdaLN context for the attention source).
    # AdaLN-zero kernels are exactly zero at init (t has no effect by
    # design), so perturb the params away from init first.
    params_p = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(KEY, p.shape, p.dtype), params)
    out_cf = net.apply(params_p, noise, method=net.sample, condition=cond,
                       neg_condition=cond, guidance_scale=2.0,
                       num_steps=2, shift=5.0, skip_layers=(0,))
    out_uniform = net.apply(params_p, noise, method=net.sample, condition=cond,
                            neg_condition=cond, guidance_scale=2.0,
                            num_steps=2, shift=5.0, skip_layers=(0,),
                            conditional_frame_timestep=-1.0)
    assert not np.allclose(np.asarray(out_cf[:, 1:]),
                           np.asarray(out_uniform[:, 1:]))


def test_wan_sampler_shift_grid_changes_output():
    """flow_shift warps the teacher t grid (ref UniPC flow_shift)."""
    from fastgen_tpu.networks.wan.network import WanVideoDiT

    net = WanVideoDiT(**WAN_KW)
    x, t, cond = video_inputs()
    params = net.init({"params": KEY}, x, t, condition=cond)
    noise = jax.random.normal(jax.random.PRNGKey(5), x.shape)
    kw = dict(condition=cond, neg_condition=None, guidance_scale=None,
              num_steps=2)
    out_a = net.apply(params, noise, method=net.sample, shift=1.0, **kw)
    out_b = net.apply(params, noise, method=net.sample, shift=5.0, **kw)
    assert np.isfinite(np.asarray(out_a)).all()
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_causal_vace_context_injection():
    """CausalVACEWan (ref ``VaceWan/network_causal.py``): block-causal forward
    with VACE context residuals; context scaling changes the output."""
    from fastgen_tpu.networks.wan.network_vace import CausalVACEWan

    net = CausalVACEWan(num_vace_layers=1, chunk_size=2, total_num_frames=4,
                        frame_height=8, frame_width=8, **WAN_KW)
    x, t, cond = video_inputs()
    cond = dict(cond)
    cond["vid_context"] = jax.random.normal(KEY, (2, 4, 8, 8, 4))
    params = net.init({"params": KEY}, x, t, condition=cond)
    out = net.apply(params, x, t, condition=cond)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    cond2 = dict(cond, vid_context=cond["vid_context"] * 2.0)
    out2 = net.apply(params, x, t, condition=cond2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # block-causality holds with context: chunk 0 output is independent of
    # later-chunk input
    x_mod = x.at[:, 2:].set(0.0)
    out_mod = net.apply(params, x_mod, t, condition=cond)
    np.testing.assert_allclose(np.asarray(out[:, :2]),
                               np.asarray(out_mod[:, :2]), rtol=2e-4, atol=2e-5)
