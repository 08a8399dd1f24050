"""MeanFlow CIFAR-10 recipe (ref ``configs/experiments/EDM/config_mf_cifar10.py``;
reference result: 1-step FID 2.82). Uses the RF schedule + r-timestep UNet."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_mean_flow import create_config as create_mf_config
from fastgen_tpu.configs.net import EDM_CIFAR10_Config
from fastgen_tpu.data.augment import AugmentPipe


def create_config():
    config = create_mf_config()
    config.log_config.group = "cifar10"
    config.log_config.name = "mf_cifar10"
    net = copy.deepcopy(EDM_CIFAR10_Config)
    net.r_timestep = True
    net.schedule_type = "rf"
    net.net_pred_type = "x0"
    config.model.net = net
    config.model.input_shape = [32, 32, 3]
    config.model.use_ema = [0.9999]
    config.model.sample_t_cfg.time_dist_type = "logitnormal"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.model.sample_t_cfg.r_sample_ratio = 0.75
    config.model.cond_dropout_prob = 0.1
    # geometric ADA (6 aug-label dims; ref config_mf_cifar10.py:58-61)
    config.trainer.augment_pipe = L(AugmentPipe)(
        p=0.12, xflip=1e8, yflip=0, scale=1, rotate_frac=0, aniso=1,
        translate_frac=1)
    net.augment_dim = 6
    config.trainer.batch_size_global = 128
    config.trainer.max_iter = 400_000
    return config
