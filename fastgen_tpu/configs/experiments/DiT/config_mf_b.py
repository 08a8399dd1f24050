"""MeanFlow on DiT-B/2 ImageNet-256 latents
(ref ``configs/experiments/DiT/config_mf_b.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.experiments.DiT.config_mf_xl import (
    create_config as create_mf_xl_config)
from fastgen_tpu.configs.net import DiT_B2_Config


def create_config():
    config = create_mf_xl_config()
    config.log_config.name = "mf_dit_b"
    net = copy.deepcopy(DiT_B2_Config)
    net.r_timestep = True
    net.scale_t = False
    net.time_cond_type = "diff"
    config.model.net = net
    config.model.net_optimizer.optim_type = "adam"
    config.model.net_optimizer.lr = 1e-4
    config.model.net_optimizer.betas = (0.9, 0.95)
    return config
