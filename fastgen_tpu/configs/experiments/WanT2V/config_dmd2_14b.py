"""DMD2 on Wan2.1-14B T2V (ref ``configs/experiments/WanT2V/config_dmd2_14b.py``;
reference 4-step VBench 84.72 / 2-step 84.53)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.experiments.WanT2V.config_dmd2 import (
    create_config as create_dmd2_1_3b_config)
from fastgen_tpu.configs.net import Wan_14B_Config


def create_config():
    config = create_dmd2_1_3b_config()
    config.log_config.name = "dmd2_wan14b"
    config.model.net = copy.deepcopy(Wan_14B_Config)
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 64
    return config
