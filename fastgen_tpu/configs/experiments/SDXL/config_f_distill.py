"""f-distill on SDXL (ref ``configs/experiments/SDXL/config_f_distill.py``):
DMD2 + f-divergence weighting, usually resumed from a DMD2 student."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.discriminator import Discriminator_SDXL_Res1024_Config
from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_f_distill import (
    create_config as create_f_distill_config)
from fastgen_tpu.configs.net import SDXL_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_f_distill_config()
    config.log_config.group = "sdxl"
    config.log_config.name = "f_distill_sdxl"
    config.model.net = copy.deepcopy(SDXL_Config)
    config.model.discriminator = copy.deepcopy(Discriminator_SDXL_Res1024_Config)
    config.model.input_shape = [128, 128, 4]
    config.model.gan_loss_weight_gen = 5e-3
    config.model.guidance_scale = 8.0
    config.model.net_optimizer.lr = 5e-7
    config.model.fake_score_optimizer.lr = 5e-7
    config.model.discriminator_optimizer.lr = 5e-7
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/sdxl_latents"], batch_size=6,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy"})
    config.trainer.fsdp = True
    config.trainer.max_iter = 25_000
    config.trainer.logging_iter = 100
    config.trainer.save_ckpt_iter = 2000
    return config
