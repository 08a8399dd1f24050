"""Trainer preprocess_data tests (ref ``fastgen/trainer.py:374-476``).

Covers: raw->latent VAE encode with *_raw retention, prompt-string text
encode, I2V first-frame conditioning (concat-mask layout), CLIP image
embeddings, and Cosmos-style video2world conditioning latents + mask.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.data.preprocess import preprocess_data
from fastgen_tpu.networks.encoders.wrappers import (
    StableDiffusionTextEncoder,
    VideoVAEWrapper,
    WanImageEncoder,
)


class _FakeNet:
    is_i2v = False
    is_vid2vid = False
    is_video2world = False
    concat_mask = True


class _FakeModel:
    def __init__(self, input_shape, vae=None, text_encoder=None,
                 image_encoder=None, net=None):
        self.input_shape = tuple(input_shape)
        self.vae = vae
        self.text_encoder = text_encoder
        self.image_encoder = image_encoder
        self.net = net or _FakeNet()
        self.precision = jnp.float32
        self.precision_amp_enc = None


@pytest.fixture(scope="module")
def video_vae():
    return VideoVAEWrapper(base_ch=8, ch_mult=(1, 2), latent_channels=4,
                           temporal_downsample=(True,), dtype=jnp.float32,
                           example_shape=(5, 16, 16))


@pytest.fixture(scope="module")
def text_encoder():
    return StableDiffusionTextEncoder(
        vocab_size=99, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_positions=16, eos_token_id=98,
        max_length=8, dtype=jnp.float32)


def test_vae_and_text_encode(video_vae, text_encoder):
    model = _FakeModel(input_shape=(3, 8, 8, 4), vae=video_vae,
                       text_encoder=text_encoder)
    data = {"real": np.ones((2, 5, 16, 16, 3), np.float32),
            "condition": ["a cat", "a dog"],
            "neg_condition": ["", ""]}
    out = preprocess_data(model, data, rng=jax.random.PRNGKey(0))
    assert out["real"].shape == (2, 3, 8, 8, 4)       # latent space
    assert out["real_raw"].shape == (2, 5, 16, 16, 3)
    assert out["condition"]["text_embeds"].shape == (2, 8, 16)
    assert out["condition_raw"] == ["a cat", "a dog"]
    assert out["neg_condition"]["text_embeds"].shape == (2, 8, 16)


def test_latent_passthrough(video_vae):
    """Already-latent batches (WDS latent loaders) skip the VAE."""
    model = _FakeModel(input_shape=(3, 8, 8, 4), vae=video_vae)
    z = np.ones((2, 3, 8, 8, 4), np.float32)
    out = preprocess_data(model, {"real": z})
    np.testing.assert_array_equal(np.asarray(out["real"]), z)


def test_i2v_first_frame_and_image_embeds(video_vae):
    class _I2VNet(_FakeNet):
        is_i2v = True
        concat_mask = True

    img_enc = WanImageEncoder(hidden_size=16, num_layers=1, num_heads=2,
                              intermediate_size=32, image_size=16, patch_size=8,
                              dtype=jnp.float32)
    model = _FakeModel(input_shape=(3, 8, 8, 4), vae=video_vae,
                       image_encoder=img_enc, net=_I2VNet())
    data = {"real": np.random.RandomState(0).randn(1, 5, 16, 16, 3).astype(np.float32),
            "condition": {"text_embeds": np.zeros((1, 4, 16), np.float32)}}
    out = preprocess_data(model, data, rng=jax.random.PRNGKey(0))
    cond = out["condition"]
    # concat-mask layout: 4 mask channels + latent channels, full latent clip
    assert cond["first_frame_cond"].shape == (1, 3, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(cond["first_frame_cond"][:, 0, ..., :4]), 1.0)
    np.testing.assert_allclose(np.asarray(cond["first_frame_cond"][:, 1:, ..., :4]), 0.0)
    assert cond["first_frame_latent"].shape == (1, 1, 8, 8, 4)
    assert cond["encoder_hidden_states_image"].shape == (1, 5, 16)
    # argmax encode: deterministic across calls
    out2 = preprocess_data(model, dict(data), rng=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(cond["first_frame_cond"]),
                                  np.asarray(out2["condition"]["first_frame_cond"]))


def test_video2world_mask(video_vae):
    class _V2WNet(_FakeNet):
        is_video2world = True
        num_conditioning_frames = 1

    model = _FakeModel(input_shape=(3, 8, 8, 4), vae=video_vae, net=_V2WNet())
    data = {"real": np.ones((1, 5, 16, 16, 3), np.float32)}
    out = preprocess_data(model, data, rng=jax.random.PRNGKey(0))
    cond = out["condition"]
    assert cond["conditioning_latents"].shape == (1, 3, 8, 8, 4)
    assert cond["condition_mask"].shape == (1, 3, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(cond["condition_mask"][:, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(cond["condition_mask"][:, 1:]), 0.0)


def test_missing_text_encoder_raises():
    model = _FakeModel(input_shape=(8, 8, 3))
    with pytest.raises(ValueError, match="text_encoder"):
        preprocess_data(model, {"real": np.ones((1, 8, 8, 3), np.float32),
                                "condition": ["a prompt"]})
