"""Raw-pixel WanI2V SFT smoke config: tiny I2V Wan + video VAE + text/image
encoders, exercising the I2V half of ``preprocess_data`` (first-frame
concat-mask conditioning + CLIP image embeddings; ref ``trainer.py:416-441``).
"""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import WanI2V_Test_Config
from fastgen_tpu.data.class_cond_dataloader import SyntheticRawVideoLoader
from fastgen_tpu.networks.encoders.wrappers import (
    T5TextEncoder, VideoVAEWrapper, WanImageEncoder)


def create_config():
    config = create_sft_config()
    config.log_config.group = "wani2v_test"
    config.log_config.name = "sft_raw_test"
    config.model.net = copy.deepcopy(WanI2V_Test_Config)
    config.model.vae = L(VideoVAEWrapper)(
        base_ch=8, ch_mult=[1, 2], latent_channels=4,
        temporal_downsample=[True], dtype="float32", example_shape=[5, 16, 16])
    config.model.text_encoder = L(T5TextEncoder)(
        allow_hash_tokenizer=True,
        vocab_size=256, d_model=32, d_kv=8, num_heads=4, d_ff=48, num_layers=1,
        rel_buckets=8, rel_max_distance=20, max_length=6, dtype="float32")
    config.model.image_encoder = L(WanImageEncoder)(
        hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32,
        image_size=16, patch_size=8, dtype="float32")
    config.model.input_shape = [3, 8, 8, 4]
    config.model.use_ema = False
    config.dataloader_train = L(SyntheticRawVideoLoader)(
        batch_size=2, frames=5, resolution=16)
    config.trainer.max_iter = 4
    config.trainer.validation_iter = 100
    config.trainer.save_ckpt_iter = 2
    config.trainer.logging_iter = 1
    return config
