"""sCM on EDM2-XL ImageNet-64 (ref ``configs/experiments/EDM2/config_scm_xl.py``):
continuous-time CM with the TrigFlow wrapper and JVP tangents."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_scm import create_config as create_scm_config
from fastgen_tpu.configs.net import EDM2_IN64_XL_Config
from fastgen_tpu.configs.opt import LambdaInverseSquareRootScheduler


def create_config():
    config = create_scm_config()
    config.log_config.group = "imagenet64"
    config.log_config.name = "scm_edm2_xl"
    net = copy.deepcopy(EDM2_IN64_XL_Config)
    net.dropout = 0.45
    net.dropout_resolutions = [16, 8]
    config.model.net = net
    config.model.input_shape = [64, 64, 3]
    config.model.use_ema = [0.9999]
    config.model.net_optimizer.optim_type = "adam"
    config.model.net_optimizer.lr = 7e-5
    config.model.net_optimizer.betas = (0.9, 0.99)
    config.model.net_optimizer.eps = 1e-11
    config.model.net_optimizer.weight_decay = 0.0
    config.model.net_scheduler = L(LambdaInverseSquareRootScheduler)(
        warm_up_steps=1000, timescale=10_000)
    config.trainer.batch_size_global = 2048
    config.trainer.fsdp = True
    config.trainer.max_iter = 200_000
    return config
