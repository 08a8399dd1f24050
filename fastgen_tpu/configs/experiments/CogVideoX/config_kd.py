"""KD on CogVideoX-2B from precomputed pairs
(ref ``configs/experiments/CogVideoX/config_kd.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.data import Pair_Loader_Config
from fastgen_tpu.configs.methods.config_kd import create_config as create_kd_config
from fastgen_tpu.configs.net import CogVideoX_2B_Config


def create_config():
    config = create_kd_config()
    config.log_config.group = "cogvideox"
    config.log_config.name = "kd_cogvideox2b"
    config.model.net = copy.deepcopy(CogVideoX_2B_Config)
    config.model.input_shape = [13, 60, 90, 16]
    config.model.net_optimizer.lr = 1e-4
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = copy.deepcopy(Pair_Loader_Config)
    config.dataloader_train.batch_size = 2
    config.trainer.fsdp = True
    config.trainer.max_iter = 6000
    return config
