"""f-distill EDM ImageNet-64 recipe (ref
``configs/experiments/EDM/config_f_distill_in64.py``; reference 1-step FID 1.11)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.data import ImageNet64_Loader_Config
from fastgen_tpu.configs.discriminator import Discriminator_EDM_ImageNet64_Config
from fastgen_tpu.configs.methods.config_f_distill import (
    create_config as create_f_distill_config)
from fastgen_tpu.configs.net import EDM_ImageNet64_Config


def create_config():
    config = create_f_distill_config()
    config.log_config.group = "in64"
    config.log_config.name = "f_distill_in64"
    config.model.net = copy.deepcopy(EDM_ImageNet64_Config)
    config.model.discriminator = copy.deepcopy(Discriminator_EDM_ImageNet64_Config)
    config.model.input_shape = [64, 64, 3]
    config.model.gan_loss_weight_gen = 3e-3
    config.model.f_distill.ratio_ema_rate = 0.5
    config.model.net_optimizer.lr = 2e-6
    config.model.fake_score_optimizer.lr = 2e-6
    config.model.discriminator_optimizer.lr = 2e-6
    config.model.use_ema = [0.9999, 0.99995, 0.9996]
    config.dataloader_train = copy.deepcopy(ImageNet64_Loader_Config)
    config.trainer.batch_size_global = 1024
    config.trainer.max_iter = 100_000
    return config
