"""DMD2 on Wan2.2-TI2V-5B T2V (ref
``configs/experiments/WanT2V/config_dmd2_wan22_5b.py``): 2-step student,
multiscale discriminator on blocks 15/22/29."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.discriminator import Discriminator_Wan22_5B_Config
from fastgen_tpu.configs.experiments.WanT2V.config_dmd2 import (
    create_config as create_dmd2_wan_config)
from fastgen_tpu.configs.net import Wan22_T2V_5B_Config


def create_config():
    config = create_dmd2_wan_config()
    config.log_config.name = "dmd2_wan22_5b"
    config.model.net = copy.deepcopy(Wan22_T2V_5B_Config)
    # 16x-spatial 48-ch VAE: [T, H, W, C] = [21, 44, 80, 48]
    config.model.input_shape = [21, 44, 80, 48]
    config.model.net_optimizer.lr = 1e-5
    config.model.fake_score_optimizer.lr = 1e-5
    config.model.discriminator_optimizer.lr = 1e-5
    config.model.discriminator = copy.deepcopy(Discriminator_Wan22_5B_Config)
    config.model.discriminator.disc_type = "multiscale_down_mlp_large"
    config.model.discriminator.feature_indices = [15, 22, 29]
    config.model.gan_loss_weight_gen = 0.03
    config.model.guidance_scale = 5.0
    config.model.sample_t_cfg.time_dist_type = "shifted"
    config.model.fake_score_pred_type = "x0"
    config.model.student_sample_type = "ode"
    config.model.student_sample_steps = 2
    config.model.sample_t_cfg.t_list = [0.999, 0.833, 0.0]
    return config
