"""Multi-step (path) KD on Wan-1.3B from 4-step denoising trajectories
(ref ``configs/experiments/WanT2V/config_kd_path.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.data import Path_Loader_Config
from fastgen_tpu.configs.methods.config_kd import create_config as create_kd_config
from fastgen_tpu.configs.net import Wan_1_3B_Config


def create_config():
    config = create_kd_config()
    config.log_config.group = "wan_t2v"
    config.log_config.name = "kd_path_wan1_3b"
    config.model.net = copy.deepcopy(Wan_1_3B_Config)
    config.model.input_shape = [21, 60, 104, 16]
    config.model.student_sample_steps = 4
    config.model.net_optimizer.lr = 7e-5
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = copy.deepcopy(Path_Loader_Config)
    config.dataloader_train.batch_size = 2
    config.trainer.fsdp = True
    config.trainer.max_iter = 10_000
    return config
