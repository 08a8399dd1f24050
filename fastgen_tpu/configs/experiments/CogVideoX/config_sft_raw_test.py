"""Raw-pixel CogVideoX SFT smoke config: tiny joint text-video DiT + video
VAE + text encoder, driving the raw->latent->train->sample path on the
DDPM-table (CogVideoX) schedule."""

from __future__ import annotations

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import build_cogvideox
from fastgen_tpu.data.class_cond_dataloader import SyntheticRawVideoLoader
from fastgen_tpu.networks.encoders.wrappers import T5TextEncoder, VideoVAEWrapper

CogVideoX_Test_Config = L(build_cogvideox)(
    dim=64, num_layers=1, num_heads=4, in_channels=4, text_dim=32,
    patch_size=2, max_text_len=6, sample_frames=3, sample_height=8,
    sample_width=8)


def create_config():
    config = create_sft_config()
    config.log_config.group = "cogvideox_test"
    config.log_config.name = "sft_raw_test"
    config.model.net = CogVideoX_Test_Config
    config.model.vae = L(VideoVAEWrapper)(
        base_ch=8, ch_mult=[1, 2], latent_channels=4,
        temporal_downsample=[True], dtype="float32", example_shape=[5, 16, 16])
    config.model.text_encoder = L(T5TextEncoder)(
        allow_hash_tokenizer=True,
        vocab_size=256, d_model=32, d_kv=8, num_heads=4, d_ff=48, num_layers=1,
        rel_buckets=8, rel_max_distance=20, max_length=6, dtype="float32")
    config.model.input_shape = [3, 8, 8, 4]
    config.model.use_ema = False
    # the CogVideoX schedule trains on its DDPM index timescale
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.dataloader_train = L(SyntheticRawVideoLoader)(
        batch_size=2, frames=5, resolution=16)
    config.trainer.max_iter = 4
    config.trainer.validation_iter = 100
    config.trainer.save_ckpt_iter = 2
    config.trainer.logging_iter = 1
    return config
