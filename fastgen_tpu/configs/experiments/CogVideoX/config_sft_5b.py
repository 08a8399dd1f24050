"""SFT on CogVideoX-5B (ref ``configs/experiments/CogVideoX/config_sft_5b.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.experiments.CogVideoX.config_sft import (
    create_config as create_sft_2b_config)
from fastgen_tpu.configs.net import CogVideoX_5B_Config


def create_config():
    config = create_sft_2b_config()
    config.log_config.name = "sft_cogvideox5b"
    config.model.net = copy.deepcopy(CogVideoX_5B_Config)
    return config
