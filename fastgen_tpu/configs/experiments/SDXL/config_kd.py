"""Single-step KD on SDXL from precomputed (latent, noise) pairs
(ref ``configs/experiments/SDXL/config_kd.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.data import Pair_Loader_Config
from fastgen_tpu.configs.methods.config_kd import create_config as create_kd_config
from fastgen_tpu.configs.net import SDXL_Config


def create_config():
    config = create_kd_config()
    config.log_config.group = "sdxl"
    config.log_config.name = "kd_sdxl"
    config.model.net = copy.deepcopy(SDXL_Config)
    config.model.input_shape = [128, 128, 4]  # 1024px latents (NHWC)
    config.model.net_optimizer.lr = 1e-5
    config.dataloader_train = copy.deepcopy(Pair_Loader_Config)
    config.dataloader_train.batch_size = 16
    config.trainer.fsdp = True
    config.trainer.max_iter = 6000
    config.trainer.logging_iter = 100
    config.trainer.save_ckpt_iter = 1000
    return config
