"""Raw-pixel causal WanI2V SFT smoke config: diffusion-forcing training of
the causal I2V variant with first-frame conditioning — the combined
causal + I2V path (ref ``WanI2V/network_causal.py:24``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import (
    create_causal_config as create_causal_sft_config)
from fastgen_tpu.configs.net import CausalWanI2V_Test_Config
from fastgen_tpu.data.class_cond_dataloader import SyntheticRawVideoLoader
from fastgen_tpu.networks.encoders.wrappers import T5TextEncoder, VideoVAEWrapper


def create_config():
    config = create_causal_sft_config()
    config.log_config.group = "wani2v_test"
    config.log_config.name = "sft_causal_raw_test"
    config.model.net = copy.deepcopy(CausalWanI2V_Test_Config)
    config.model.vae = L(VideoVAEWrapper)(
        base_ch=8, ch_mult=[1, 2], latent_channels=4,
        temporal_downsample=[True], dtype="float32", example_shape=[5, 16, 16])
    config.model.text_encoder = L(T5TextEncoder)(
        allow_hash_tokenizer=True,
        vocab_size=256, d_model=32, d_kv=8, num_heads=4, d_ff=48, num_layers=1,
        rel_buckets=8, rel_max_distance=20, max_length=6, dtype="float32")
    config.model.input_shape = [3, 8, 8, 4]
    config.model.use_ema = False
    config.dataloader_train = L(SyntheticRawVideoLoader)(
        batch_size=2, frames=5, resolution=16)
    config.trainer.max_iter = 4
    config.trainer.validation_iter = 100
    config.trainer.save_ckpt_iter = 2
    config.trainer.logging_iter = 1
    return config
