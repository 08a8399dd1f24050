"""SFT on DiT-XL/2 (ref ``configs/experiments/DiT/config_sft_dit_xl.py``):
fine-tune of the eps-prediction DiT checkpoint (learn_sigma, SD beta
schedule)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import DiT_XL2_Config


def create_config():
    config = create_sft_config()
    config.log_config.group = "imagenet256"
    config.log_config.name = "sft_dit_xl"
    net = copy.deepcopy(DiT_XL2_Config)
    net.learn_sigma = True
    net.net_pred_type = "eps"
    net.schedule_type = "sd"
    config.model.net = net
    config.model.input_shape = [32, 32, 4]
    config.model.sample_t_cfg.time_dist_type = "logitnormal"
    config.model.net_optimizer.optim_type = "adamw"
    config.model.net_optimizer.lr = 1e-5
    config.model.net_optimizer.betas = (0.9, 0.95)
    config.model.net_optimizer.weight_decay = 0.0
    config.model.use_ema = [0.9999]
    config.model.guidance_scale = 1.5
    config.trainer.batch_size_global = 256
    config.trainer.fsdp = True
    config.trainer.max_iter = 400_000
    return config
