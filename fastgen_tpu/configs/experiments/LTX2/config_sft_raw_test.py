"""Raw-pixel LTX-2 SFT smoke config: tiny LTX2 video DiT + video VAE + text
encoder, driving the full raw->latent->train->sample path for the LTX2
family (the reference carries LTX2 as in-tree WIP with its own tests)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import LTX2_Test_Config
from fastgen_tpu.data.class_cond_dataloader import SyntheticRawVideoLoader
from fastgen_tpu.networks.encoders.wrappers import Gemma3TextEncoder, VideoVAEWrapper


def create_config():
    config = create_sft_config()
    config.log_config.group = "ltx2_test"
    config.log_config.name = "sft_raw_test"
    config.model.net = copy.deepcopy(LTX2_Test_Config)
    config.model.vae = L(VideoVAEWrapper)(
        base_ch=8, ch_mult=[1, 2], latent_channels=4,
        temporal_downsample=[True], dtype="float32", example_shape=[5, 16, 16])
    # Gemma3 caption stack (LTX-2 contract): hidden*(layers+1) == 32 matches
    # LTX2_Test_Config.caption_channels
    config.model.text_encoder = L(Gemma3TextEncoder)(
        allow_hash_tokenizer=True,
        vocab_size=256, hidden=16, intermediate=24, num_layers=1,
        num_heads=2, num_kv_heads=1, head_dim=8, query_pre_attn_scalar=8.0,
        max_length=6, dtype="float32")
    config.model.input_shape = [3, 8, 8, 4]
    config.model.use_ema = False
    config.dataloader_train = L(SyntheticRawVideoLoader)(
        batch_size=2, frames=5, resolution=16)
    config.trainer.max_iter = 4
    config.trainer.validation_iter = 100
    config.trainer.save_ckpt_iter = 2
    config.trainer.logging_iter = 1
    return config
