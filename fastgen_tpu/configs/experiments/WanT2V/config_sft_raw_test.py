"""Raw-pixel SFT smoke config: tiny Wan + in-framework video VAE + UMT5-style
text encoder, exercising the full ``preprocess_data`` encode path
(ref ``trainer.py:374-476``) — the loader yields pixels and prompt strings,
not latents.
"""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import Wan_Test_Config
from fastgen_tpu.data.class_cond_dataloader import SyntheticRawVideoLoader
from fastgen_tpu.networks.encoders.wrappers import T5TextEncoder, VideoVAEWrapper


def create_config():
    config = create_sft_config()
    config.log_config.group = "wan_test"
    config.log_config.name = "sft_raw_test"
    config.model.net = copy.deepcopy(Wan_Test_Config)
    # VAE: 5 raw frames -> 3 latent frames (1+4k -> 1+k with one temporal
    # downsample here), 16x16 -> 8x8, 4 latent channels
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
    config.trainer.save_ckpt_iter = 100
    config.trainer.logging_iter = 1
    return config
