"""CM smoke config: tiny net + synthetic data."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.data import Synthetic_Loader_Config
from fastgen_tpu.configs.methods.config_cm import create_config as create_cm_config
from fastgen_tpu.configs.net import EDM_Test_Config


def create_config():
    config = create_cm_config()
    config.log_config.group = "edm_test"
    config.log_config.name = "cm_test"
    config.model.net = copy.deepcopy(EDM_Test_Config)
    config.model.input_shape = [16, 16, 3]
    config.model.use_ema = [0.999]
    config.model.ct_schedule.batch_size = 8
    config.dataloader_train = copy.deepcopy(Synthetic_Loader_Config)
    config.dataloader_train.batch_size = 8
    config.trainer.max_iter = 10
    config.trainer.validation_iter = 5
    config.trainer.save_ckpt_iter = 10
    config.trainer.logging_iter = 5
    return config
