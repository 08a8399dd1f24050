"""SFT on EDM2-S ImageNet-64 (ref ``configs/experiments/EDM2/config_sft_s.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.data import ImageNet64_Loader_Config
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import EDM2_IN64_S_Config


def create_config():
    config = create_sft_config()
    config.log_config.group = "imagenet64"
    config.log_config.name = "sft_edm2_s"
    config.model.net = copy.deepcopy(EDM2_IN64_S_Config)
    config.model.input_shape = [64, 64, 3]
    config.model.sample_t_cfg.time_dist_type = "lognormal"
    config.model.net_optimizer.optim_type = "adam"
    config.model.net_optimizer.lr = 1e-4
    config.model.net_optimizer.betas = (0.9, 0.99)
    config.model.net_optimizer.weight_decay = 0.0
    config.model.use_ema = [0.9999]
    config.dataloader_train = copy.deepcopy(ImageNet64_Loader_Config)
    config.trainer.batch_size_global = 1024
    config.trainer.max_iter = 150_000
    config.trainer.fsdp = True
    return config
