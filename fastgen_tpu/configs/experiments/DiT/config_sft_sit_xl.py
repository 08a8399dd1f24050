"""SFT on SiT-XL/2 (ref ``configs/experiments/DiT/config_sft_sit_xl.py``):
same backbone as DiT-XL/2 but flow-matching (SiT) prediction."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.experiments.DiT.config_sft_dit_xl import (
    create_config as create_sft_dit_config)
from fastgen_tpu.configs.net import DiT_XL2_Config


def create_config():
    config = create_sft_dit_config()
    config.log_config.name = "sft_sit_xl"
    config.model.net = copy.deepcopy(DiT_XL2_Config)  # flow / rf
    return config
