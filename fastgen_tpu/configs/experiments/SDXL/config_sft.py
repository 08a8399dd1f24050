"""SFT on SDXL (ref ``configs/experiments/SDXL/config_sft.py``): flow-matching
fine-tune from precomputed latent WDS shards."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import SDXL_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_sft_config()
    config.log_config.group = "sdxl"
    config.log_config.name = "sft_sdxl"
    config.model.net = copy.deepcopy(SDXL_Config)
    config.model.input_shape = [128, 128, 4]  # 1024px latents (NHWC)
    config.model.net_optimizer.lr = 1e-5
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.model.guidance_scale = 7.5
    config.model.student_sample_steps = 50
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/sdxl_latents"], batch_size=8,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy"})
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 256
    config.trainer.max_iter = 100_000
    config.trainer.logging_iter = 500
    return config
