"""DMD2 ImageNet-64 recipe (ref ``configs/experiments/EDM/config_dmd2_in64.py``;
reference result: 1-step FID 1.12)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.discriminator import Discriminator_EDM_ImageNet64_Config
from fastgen_tpu.configs.methods.config_dmd2 import create_config as create_dmd2_config
from fastgen_tpu.configs.net import EDM_ImageNet64_Config


def create_config():
    config = create_dmd2_config()
    config.log_config.group = "imagenet64"
    config.log_config.name = "dmd2_in64"
    config.model.net = copy.deepcopy(EDM_ImageNet64_Config)
    config.model.discriminator = copy.deepcopy(Discriminator_EDM_ImageNet64_Config)
    config.model.input_shape = [64, 64, 3]
    config.model.use_ema = [0.9999]
    config.model.gan_loss_weight_gen = 3e-3
    config.model.sample_t_cfg.time_dist_type = "polynomial"
    config.trainer.batch_size_global = 512
    config.trainer.fsdp = True
    config.trainer.max_iter = 200_000
    return config
