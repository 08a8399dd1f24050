"""MeanFlow on DiT-XL/2 ImageNet-256 latents
(ref ``configs/experiments/DiT/config_mf_xl.py``; reference 1-step FID 3.19)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.methods.config_mean_flow import (
    create_config as create_mf_config)
from fastgen_tpu.configs.net import DiT_XL2_Config


def create_config():
    config = create_mf_config()
    config.log_config.group = "imagenet256"
    config.log_config.name = "mf_dit_xl"
    net = copy.deepcopy(DiT_XL2_Config)
    net.r_timestep = True
    config.model.net = net
    config.model.input_shape = [32, 32, 4]  # SD-VAE latents of 256x256
    config.model.use_ema = [0.9999]
    config.model.sample_t_cfg.time_dist_type = "logitnormal"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.model.sample_t_cfg.r_sample_ratio = 0.75
    config.model.cond_dropout_prob = 0.1
    config.model.guidance_scale = 2.0
    config.trainer.batch_size_global = 256
    config.trainer.fsdp = True
    config.trainer.max_iter = 400_000
    return config
