"""DMD2 CIFAR-10 smoke config (ref ``configs/experiments/EDM/config_dmd2_test.py``):
tiny net + synthetic data so it runs anywhere; the full recipe is
``config_dmd2_cifar10.py``."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.data import Synthetic_Loader_Config
from fastgen_tpu.configs.discriminator import Discriminator_EDM_Test_Config
from fastgen_tpu.configs.methods.config_dmd2 import create_config as create_dmd2_config
from fastgen_tpu.configs.net import EDM_Test_Config


def create_config():
    config = create_dmd2_config()
    config.log_config.group = "edm_test"
    config.log_config.name = "dmd2_test"
    config.model.net = copy.deepcopy(EDM_Test_Config)
    config.model.discriminator = copy.deepcopy(Discriminator_EDM_Test_Config)
    config.model.input_shape = [16, 16, 3]
    config.model.use_ema = [0.999]
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.dataloader_train = copy.deepcopy(Synthetic_Loader_Config)
    config.dataloader_train.batch_size = 8
    config.trainer.max_iter = 20
    config.trainer.validation_iter = 10
    config.trainer.save_ckpt_iter = 10
    config.trainer.logging_iter = 5
    return config
