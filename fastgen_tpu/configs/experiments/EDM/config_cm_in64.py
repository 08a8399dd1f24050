"""CM (ECT) ImageNet-64 recipe (ref
``configs/experiments/EDM/config_cm_in64.py``; reference 1-step FID 4.05)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.data import ImageNet64_Loader_Config
from fastgen_tpu.configs.methods.config_cm import create_config as create_cm_config
from fastgen_tpu.configs.net import CKPT_ROOT_DIR, EDM_ImageNet64_Config
from fastgen_tpu.configs.opt import LambdaInverseSquareRootScheduler


def create_config():
    config = create_cm_config()
    config.log_config.group = "edm_imagenet64_cm"
    config.log_config.name = "cm_in64"
    config.model.net = copy.deepcopy(EDM_ImageNet64_Config)
    config.model.net.dropout = 0.2
    config.model.input_shape = [64, 64, 3]
    config.model.pretrained_model_path = (
        f"{CKPT_ROOT_DIR}/imagenet-64/edm-imagenet-64x64-cond-adm.pth")
    # power-function EMA profiles (ref EMA_POWER_CALLBACKS)
    config.model.use_ema = [{"type": "power", "gamma": 1.0}, {"type": "power", "gamma": 5.0}, {"type": "power", "gamma": 10.0}]
    # on TPU bf16 replaces the reference's fp16 + GradScaler
    config.model.precision_amp = "bfloat16"
    config.model.sample_t_cfg.time_dist_type = "lognormal"
    config.model.sample_t_cfg.train_p_mean = -0.8
    config.model.sample_t_cfg.train_p_std = 1.6
    config.model.loss_config.huber_const = 0.06
    config.model.loss_config.weighting_ct_loss = "c_out_sq"
    config.model.net_optimizer.lr = 1e-3
    config.model.net_optimizer.betas = [0.9, 0.99]
    config.model.net_optimizer.weight_decay = 0.0
    config.model.net_scheduler = L(LambdaInverseSquareRootScheduler)(
        warm_up_steps=0, decay_steps=2000)
    config.model.ct_schedule.kimg_per_stage = 3200
    config.model.ct_schedule.q = 4.0
    config.model.ct_schedule.ratio_limit = 0.9961
    config.dataloader_train = copy.deepcopy(ImageNet64_Loader_Config)
    config.trainer.batch_size_global = 1024
    config.trainer.max_iter = 200_000
    return config
