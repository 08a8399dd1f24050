"""SFT on Wan2.1-14B T2V (ref ``configs/experiments/WanT2V/config_sft_14b.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.experiments.WanT2V.config_sft import (
    create_config as create_sft_wan_config)
from fastgen_tpu.configs.net import Wan_14B_Config


def create_config():
    config = create_sft_wan_config()
    config.log_config.name = "sft_wan14b"
    config.model.net = copy.deepcopy(Wan_14B_Config)
    config.model.net_optimizer.lr = 1e-5
    config.trainer.mesh.fsdp = 8
    return config
