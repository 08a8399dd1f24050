"""SFT on SD 1.5 (ref ``configs/experiments/SD15/config_sft.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import SD15_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_sft_config()
    config.log_config.group = "sd15"
    config.log_config.name = "sft_sd15"
    config.model.net = copy.deepcopy(SD15_Config)
    config.model.input_shape = [64, 64, 4]
    config.model.net_optimizer.lr = 1e-5
    config.model.guidance_scale = 7.5
    config.model.student_sample_steps = 50
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/sd15_latents"], batch_size=8,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy"})
    config.trainer.max_iter = 100_000
    config.trainer.batch_size_global = 256
    return config
