"""sCD ImageNet-64 recipe (ref ``configs/experiments/EDM/config_scd_in64.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.data import ImageNet64_Loader_Config
from fastgen_tpu.configs.experiments.EDM.config_sct_cifar10 import (
    create_config as create_sct_config)
from fastgen_tpu.configs.net import CKPT_ROOT_DIR, EDM_ImageNet64_Config
from fastgen_tpu.configs.opt import LambdaInverseSquareRootScheduler


def create_config():
    config = create_sct_config()
    config.log_config.group = "adm_imagenet64_scm"
    config.log_config.name = "scd_in64"
    config.model.net = copy.deepcopy(EDM_ImageNet64_Config)
    config.model.net.dropout = 0.0
    config.model.input_shape = [64, 64, 3]
    config.model.pretrained_model_path = (
        f"{CKPT_ROOT_DIR}/imagenet-64/edm-imagenet-64x64-cond-adm.pth")
    config.model.loss_config.use_cd = True
    config.model.use_ema = [0.9999, 0.99995, 0.9996]
    config.model.sample_t_cfg.train_p_mean = -1.0
    config.model.sample_t_cfg.train_p_std = 1.6
    config.model.net_optimizer.lr = 7e-5
    config.model.net_optimizer.betas = [0.9, 0.99]
    config.model.net_optimizer.weight_decay = 0.0
    config.model.net_scheduler = L(LambdaInverseSquareRootScheduler)(
        warm_up_steps=0, decay_steps=35_000)
    config.dataloader_train = copy.deepcopy(ImageNet64_Loader_Config)
    config.trainer.batch_size_global = 1024
    config.trainer.max_iter = 600_000
    return config
