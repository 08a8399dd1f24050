"""Raw-pixel SD15 SFT smoke config: tiny SD UNet + in-framework image VAE +
CLIP text encoder, exercising the image half of ``preprocess_data``
(ref ``trainer.py:374-414``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import SD15_Test_Config
from fastgen_tpu.data.class_cond_dataloader import SyntheticRawImageLoader
from fastgen_tpu.networks.encoders.wrappers import StableDiffusionTextEncoder, VAEWrapper


def create_config():
    config = create_sft_config()
    config.log_config.group = "sd15_test"
    config.log_config.name = "sft_raw_test"
    config.model.net = copy.deepcopy(SD15_Test_Config)
    config.model.vae = L(VAEWrapper)(
        ch_mult=[1, 2], base_ch=8, latent_channels=4, dtype="float32",
        example_hw=16)
    config.model.text_encoder = L(StableDiffusionTextEncoder)(
        allow_hash_tokenizer=True,
        vocab_size=99, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_positions=16, eos_token_id=98,
        max_length=8, dtype="float32")
    config.model.input_shape = [8, 8, 4]   # 16x16 pixels -> 8x8x4 latents
    config.model.use_ema = False
    config.dataloader_train = L(SyntheticRawImageLoader)(batch_size=2,
                                                         resolution=16)
    config.trainer.max_iter = 4
    config.trainer.validation_iter = 100
    config.trainer.save_ckpt_iter = 2
    config.trainer.logging_iter = 1
    return config
