"""SFT on EDM ImageNet-64 (ref
``configs/experiments/EDM/config_sft_edm_in64.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.data import ImageNet64_Loader_Config
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import CKPT_ROOT_DIR, EDM_ImageNet64_Config


def create_config():
    config = create_sft_config()
    config.log_config.group = "imagenet64"
    config.log_config.name = "sft_edm_in64"
    config.model.net = copy.deepcopy(EDM_ImageNet64_Config)
    config.model.net.dropout = 0.1
    config.model.input_shape = [64, 64, 3]
    # on TPU bf16 replaces the reference's fp16 + GradScaler
    config.model.precision_amp = "bfloat16"
    config.model.pretrained_model_path = (
        f"{CKPT_ROOT_DIR}/imagenet-64/edm-imagenet-64x64-cond-adm.pth")
    config.model.sample_t_cfg.time_dist_type = "lognormal"
    config.model.sample_t_cfg.train_p_mean = -1.2
    config.model.sample_t_cfg.train_p_std = 1.2
    config.model.net_optimizer.lr = 2e-5
    # power-function EMA profiles (ref EMA_POWER_CALLBACKS)
    config.model.use_ema = [{"type": "power", "gamma": 1.0}, {"type": "power", "gamma": 5.0}, {"type": "power", "gamma": 10.0}]
    config.dataloader_train = copy.deepcopy(ImageNet64_Loader_Config)
    config.trainer.batch_size_global = 1024
    config.trainer.max_iter = 200_000
    return config
