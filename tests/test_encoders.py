"""Encoder stack tests: torch parity (CLIP/T5) + VAE invariants.

Parity tests build tiny random ``transformers`` models on torch-CPU, convert
their weights with the ``convert_*`` maps, and require the flax forward to
match to fp32 tolerance — the same interop bar as the reference's pretrained
HF encoders (``SD15/network.py:344``, ``Wan/network.py:431``).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastgen_tpu.networks.encoders import (
    AutoencoderKL,
    CausalVideoVAE,
    CLIPTextTransformer,
    CLIPVisionTransformer,
    T5Encoder,
    convert_clip_text,
    convert_clip_vision,
    convert_t5,
)
from fastgen_tpu.networks.encoders.wrappers import (
    HashTokenizer,
    SDXLTextEncoder,
    StableDiffusionTextEncoder,
    T5TextEncoder,
    VAEWrapper,
    VideoVAEWrapper,
    WanImageEncoder,
)


# ---------------------------------------------------------------- CLIP text
class TestCLIPText:
    def _torch_pair(self, act="quick_gelu", projection=False):
        import torch
        from transformers import CLIPTextConfig, CLIPTextModel, CLIPTextModelWithProjection

        cfg = CLIPTextConfig(vocab_size=99, hidden_size=32, intermediate_size=64,
                             num_hidden_layers=3, num_attention_heads=4,
                             max_position_embeddings=16, hidden_act=act,
                             eos_token_id=98, bos_token_id=97,
                             projection_dim=24)
        torch.manual_seed(0)
        tm = (CLIPTextModelWithProjection if projection else CLIPTextModel)(cfg).eval()
        flax_mod = CLIPTextTransformer(
            vocab_size=99, hidden_size=32, num_layers=3, num_heads=4,
            intermediate_size=64, max_positions=16, act=act, eos_token_id=98,
            projection_dim=24 if projection else None)
        params = convert_clip_text({k: v.numpy() for k, v in tm.state_dict().items()})
        return tm, flax_mod, params

    def test_parity_last_hidden(self):
        import torch
        tm, fm, params = self._torch_pair()
        ids = np.random.RandomState(0).randint(2, 97, (2, 12)).astype(np.int32)
        ids[:, -1] = 98
        with torch.no_grad():
            ref = tm(torch.tensor(ids.astype(np.int64))).last_hidden_state.numpy()
        got, _ = fm.apply({"params": params}, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-5)

    def test_parity_penultimate_and_pooled(self):
        import torch
        tm, fm, params = self._torch_pair(act="gelu", projection=True)
        ids = np.random.RandomState(1).randint(2, 97, (2, 10)).astype(np.int32)
        ids[:, 6:] = 98
        with torch.no_grad():
            out = tm(torch.tensor(ids.astype(np.int64)), output_hidden_states=True)
        hidden, pooled = fm.apply({"params": params}, jnp.asarray(ids),
                                  return_hidden_layer=-2)
        np.testing.assert_allclose(np.asarray(hidden),
                                   out.hidden_states[-2].numpy(),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(pooled), out.text_embeds.numpy(),
                                   atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------- CLIP vision
class TestCLIPVision:
    def test_parity(self):
        import torch
        from transformers import CLIPVisionConfig, CLIPVisionModel

        cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                               num_hidden_layers=2, num_attention_heads=4,
                               image_size=16, patch_size=8, hidden_act="quick_gelu")
        torch.manual_seed(0)
        tm = CLIPVisionModel(cfg).eval()
        fm = CLIPVisionTransformer(hidden_size=32, num_layers=2, num_heads=4,
                                   intermediate_size=64, image_size=16, patch_size=8)
        params = convert_clip_vision({k: v.numpy() for k, v in tm.state_dict().items()})
        img = np.random.RandomState(0).randn(2, 16, 16, 3).astype(np.float32)
        with torch.no_grad():
            out = tm(torch.tensor(img.transpose(0, 3, 1, 2)), output_hidden_states=True)
        hidden, pooled = fm.apply({"params": params}, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(hidden),
                                   out.last_hidden_state.numpy(), atol=3e-5, rtol=3e-5)
        np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(),
                                   atol=3e-5, rtol=3e-5)
        # penultimate tap used by WanImageEncoder
        h2, _ = fm.apply({"params": params}, jnp.asarray(img), return_hidden_layer=-2)
        np.testing.assert_allclose(np.asarray(h2), out.hidden_states[-2].numpy(),
                                   atol=3e-5, rtol=3e-5)


# ---------------------------------------------------------------------- T5
class TestT5:
    @pytest.mark.parametrize("umt5", [False, True])
    def test_parity(self, umt5):
        import torch
        if umt5:
            from transformers import UMT5Config as Cfg, UMT5EncoderModel as Mdl
        else:
            from transformers import T5Config as Cfg, T5EncoderModel as Mdl
        cfg = Cfg(vocab_size=120, d_model=32, d_kv=8, d_ff=48, num_layers=3,
                  num_heads=4, relative_attention_num_buckets=8,
                  relative_attention_max_distance=20, feed_forward_proj="gated-gelu",
                  use_cache=False, tie_word_embeddings=False)
        torch.manual_seed(0)
        tm = Mdl(cfg).eval()
        fm = T5Encoder(vocab_size=120, d_model=32, d_kv=8, num_heads=4, d_ff=48,
                       num_layers=3, rel_buckets=8, rel_max_distance=20,
                       per_layer_rel_bias=umt5, gated_ff=True)
        params = convert_t5({k: v.numpy() for k, v in tm.state_dict().items()})
        rs = np.random.RandomState(0)
        ids = rs.randint(2, 119, (2, 9)).astype(np.int32)
        mask = np.ones((2, 9), np.int32)
        mask[1, 6:] = 0
        with torch.no_grad():
            ref = tm(torch.tensor(ids.astype(np.int64)),
                     attention_mask=torch.tensor(mask.astype(np.int64))
                     ).last_hidden_state.numpy()
        got = fm.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
        got = np.asarray(got) * mask[..., None]
        ref = ref * mask[..., None]
        np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)


# --------------------------------------------------------------------- VAEs
class TestAutoencoderKL:
    def test_shapes_and_modes(self):
        vae = AutoencoderKL(ch_mult=(1, 2), base_ch=8, latent_channels=4,
                            scaling_factor=0.5, shift_factor=0.1)
        x = jnp.ones((1, 16, 16, 3))
        params = vae.init(jax.random.PRNGKey(0), x)["params"]
        z = vae.apply({"params": params}, x, mode="argmax", method=vae.encode)
        assert z.shape == (1, 8, 8, 4)  # 2x downsample for 2 levels
        z2 = vae.apply({"params": params}, x, mode="argmax", method=vae.encode)
        np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
        zs = vae.apply({"params": params}, x, rng=jax.random.PRNGKey(1),
                       mode="sample", method=vae.encode)
        assert zs.shape == z.shape
        assert not np.allclose(np.asarray(zs), np.asarray(z))
        rec = vae.apply({"params": params}, z, method=vae.decode)
        assert rec.shape == x.shape

    def test_diffusers_layout_conversion(self):
        """Synthetic diffusers-style state dict converts + runs."""
        import torch
        from fastgen_tpu.networks.encoders.vae import convert_autoencoder_kl

        torch.manual_seed(0)
        sd = {}

        def c2(name, o, i, k=3):
            sd[name + ".weight"] = torch.randn(o, i, k, k) * 0.05
            sd[name + ".bias"] = torch.randn(o) * 0.01

        def gn(name, c):
            sd[name + ".weight"] = torch.ones(c)
            sd[name + ".bias"] = torch.zeros(c)

        def res(pre, i, o):
            gn(pre + ".norm1", i); c2(pre + ".conv1", o, i)
            gn(pre + ".norm2", o); c2(pre + ".conv2", o, o)
            if i != o:
                c2(pre + ".conv_shortcut", o, i, 1)

        def attn(pre, c):
            gn(pre + ".group_norm", c)
            for nm in ("to_q", "to_k", "to_v", "to_out.0"):
                sd[pre + f".{nm}.weight"] = torch.randn(c, c) * 0.05
                sd[pre + f".{nm}.bias"] = torch.zeros(c)

        ch = (8, 16)
        c2("encoder.conv_in", 8, 3)
        res("encoder.down_blocks.0.resnets.0", 8, 8)
        res("encoder.down_blocks.0.resnets.1", 8, 8)
        c2("encoder.down_blocks.0.downsamplers.0.conv", 8, 8)
        res("encoder.down_blocks.1.resnets.0", 8, 16)
        res("encoder.down_blocks.1.resnets.1", 16, 16)
        res("encoder.mid_block.resnets.0", 16, 16)
        attn("encoder.mid_block.attentions.0", 16)
        res("encoder.mid_block.resnets.1", 16, 16)
        gn("encoder.conv_norm_out", 16)
        c2("encoder.conv_out", 8, 16)
        c2("quant_conv", 8, 8, 1)
        c2("post_quant_conv", 4, 4, 1)
        c2("decoder.conv_in", 16, 4)
        res("decoder.mid_block.resnets.0", 16, 16)
        attn("decoder.mid_block.attentions.0", 16)
        res("decoder.mid_block.resnets.1", 16, 16)
        res("decoder.up_blocks.0.resnets.0", 16, 16)
        res("decoder.up_blocks.0.resnets.1", 16, 16)
        res("decoder.up_blocks.0.resnets.2", 16, 16)
        c2("decoder.up_blocks.0.upsamplers.0.conv", 16, 16)
        res("decoder.up_blocks.1.resnets.0", 16, 8)
        res("decoder.up_blocks.1.resnets.1", 8, 8)
        res("decoder.up_blocks.1.resnets.2", 8, 8)
        gn("decoder.conv_norm_out", 8)
        c2("decoder.conv_out", 3, 8)
        params = convert_autoencoder_kl({k: v.numpy() for k, v in sd.items()})
        vae = AutoencoderKL(ch_mult=(1, 2), base_ch=8, latent_channels=4)
        x = jnp.ones((1, 16, 16, 3))
        ref_shapes = jax.tree_util.tree_map(
            lambda a: a.shape, vae.init(jax.random.PRNGKey(0), x)["params"])
        got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
        assert ref_shapes == got_shapes
        z = vae.apply({"params": params}, x, mode="argmax", method=vae.encode)
        assert np.isfinite(np.asarray(z)).all()


class TestCausalVideoVAE:
    def _tiny(self):
        return CausalVideoVAE(base_ch=8, ch_mult=(1, 2, 2),
                              temporal_downsample=(True, True),
                              latent_channels=4,
                              latents_mean=(0.1, -0.2, 0.0, 0.3),
                              latents_std=(1.5, 0.8, 1.0, 1.2))

    def test_frame_algebra(self):
        vae = self._tiny()
        x = jnp.ones((1, 9, 16, 16, 3))  # 1 + 4*2 frames
        params = vae.init(jax.random.PRNGKey(0), x)["params"]
        z = vae.apply({"params": params}, x, mode="argmax", method=vae.encode)
        assert z.shape == (1, 3, 4, 4, 4)  # 1+k frames, 4x spatial (2 levels)
        rec = vae.apply({"params": params}, z, method=vae.decode)
        assert rec.shape == x.shape

    def test_causality(self):
        """Perturbing later frames must not change earlier latent frames."""
        vae = self._tiny()
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(1, 9, 16, 16, 3), jnp.float32)
        params = vae.init(jax.random.PRNGKey(0), x)["params"]
        z1 = vae.apply({"params": params}, x, mode="argmax", method=vae.encode)
        x2 = x.at[:, 5:].set(jnp.asarray(rs.randn(1, 4, 16, 16, 3), jnp.float32))
        z2 = vae.apply({"params": params}, x2, mode="argmax", method=vae.encode)
        # latent frame 0 covers input frame 0 only; frame 1 covers frames 1-4
        np.testing.assert_allclose(np.asarray(z1[:, 0]), np.asarray(z2[:, 0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(z1[:, 1]), np.asarray(z2[:, 1]),
                                   atol=1e-5)
        assert not np.allclose(np.asarray(z1[:, 2]), np.asarray(z2[:, 2]))


# ----------------------------------------------------------------- wrappers
class TestWrappers:
    def test_sd_text_encoder_uncond_cache(self):
        enc = StableDiffusionTextEncoder(
            vocab_size=99, hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=32, max_positions=16, eos_token_id=98,
            max_length=8, dtype=jnp.float32)
        e_uncond = enc.encode(["", ""])
        assert e_uncond.shape == (2, 8, 16)
        np.testing.assert_array_equal(np.asarray(e_uncond[0]), np.asarray(e_uncond[1]))
        e = enc.encode(["a cat", "a dog"])
        assert e.shape == (2, 8, 16)
        assert not np.allclose(np.asarray(e[0]), np.asarray(e[1]))

    def test_sdxl_dual(self):
        enc = SDXLTextEncoder(
            dtype=jnp.float32,
            enc1_kw=dict(vocab_size=99, hidden_size=16, num_layers=1, num_heads=2,
                         intermediate_size=32, max_positions=77, eos_token_id=98),
            enc2_kw=dict(vocab_size=99, hidden_size=24, num_layers=2, num_heads=2,
                         intermediate_size=32, max_positions=77, eos_token_id=98,
                         act="gelu", projection_dim=24))
        out = enc.encode(["hello world"])
        assert out["text_embeds"].shape == (1, 77, 40)
        assert out["pooled"].shape == (1, 24)

    def test_t5_wrapper_masks_padding(self):
        enc = T5TextEncoder(vocab_size=120, d_model=16, d_kv=4, num_heads=2,
                            d_ff=24, num_layers=1, rel_buckets=8,
                            rel_max_distance=20, max_length=10, dtype=jnp.float32)
        e = enc.encode(["short", "a much longer prompt here"])
        assert e.shape == (2, 10, 16)
        assert np.allclose(np.asarray(e[0, 5:]), 0.0)  # pad positions zeroed

    def test_image_encoder_resize(self):
        enc = WanImageEncoder(hidden_size=16, num_layers=2, num_heads=2,
                              intermediate_size=32, image_size=16, patch_size=8,
                              dtype=jnp.float32)
        e = enc.encode(jnp.zeros((2, 24, 24, 3)))
        assert e.shape == (2, 5, 16)  # 4 patches + CLS

    def test_vae_wrappers(self):
        vae = VAEWrapper(ch_mult=(1, 2), base_ch=8, latent_channels=4,
                         dtype=jnp.float32, example_hw=16)
        z = vae.encode(jnp.ones((1, 16, 16, 3)), mode="argmax")
        assert z.shape == (1, 8, 8, 4)
        assert vae.decode(z).shape == (1, 16, 16, 3)
        vvae = VideoVAEWrapper(base_ch=8, ch_mult=(1, 2), latent_channels=4,
                               temporal_downsample=(True,), dtype=jnp.float32,
                               example_shape=(5, 16, 16))
        z = vvae.encode(jnp.ones((1, 5, 16, 16, 3)), mode="argmax")
        assert z.shape == (1, 3, 8, 8, 4)
        assert vvae.decode(z).shape == (1, 5, 16, 16, 3)

    def test_hash_tokenizer_deterministic(self):
        tok = HashTokenizer(1000, 8, eos=1)
        a, m = tok(["the same text"])
        b, _ = tok(["the same text"])
        np.testing.assert_array_equal(a, b)
        assert m.sum() == 4  # 3 words + eos

    def test_hash_tokenizer_is_opt_in(self, monkeypatch):
        """The offline stand-in must not silently produce
        non-pretrained-compatible embeddings (VERDICT weak #8)."""
        import fastgen_tpu.networks.encoders.wrappers as W
        monkeypatch.delenv("FASTGEN_ALLOW_HASH_TOKENIZER", raising=False)
        enc = W.T5TextEncoder(vocab_size=64, d_model=16, d_kv=8, num_heads=2,
                              d_ff=32, num_layers=1, rel_buckets=4,
                              rel_max_distance=10, max_length=10,
                              dtype=jnp.float32)
        with pytest.raises(RuntimeError, match="HashTokenizer"):
            enc.encode(["a prompt"])
        # explicit per-encoder opt-in
        enc2 = W.T5TextEncoder(vocab_size=64, d_model=16, d_kv=8, num_heads=2,
                               d_ff=32, num_layers=1, rel_buckets=4,
                               rel_max_distance=10, max_length=10,
                               dtype=jnp.float32, allow_hash_tokenizer=True)
        assert enc2.encode(["a prompt"]).shape == (1, 10, 16)
        # env-var opt-in
        monkeypatch.setenv("FASTGEN_ALLOW_HASH_TOKENIZER", "1")
        assert enc.encode(["a prompt"]).shape == (1, 10, 16)
