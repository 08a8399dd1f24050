"""DMD2 on WanI2V-14B (ref ``configs/experiments/WanI2V/config_dmd2_14b.py``):
bidirectional image-to-video distillation, first-frame conditioning."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_dmd2 import create_config as create_dmd2_config
from fastgen_tpu.configs.net import WanI2V_14B_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_dmd2_config()
    config.log_config.group = "wan_i2v"
    config.log_config.name = "dmd2_wani2v_14b"
    config.model.net = copy.deepcopy(WanI2V_14B_Config)
    config.model.input_shape = [21, 60, 104, 16]
    config.model.gan_loss_weight_gen = 0.0
    config.model.student_sample_steps = 4
    config.model.guidance_scale = 5.0
    config.model.net_optimizer.lr = 1e-5
    config.model.fake_score_optimizer.lr = 1e-5
    config.model.discriminator_optimizer.lr = 1e-5
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/wani2v_latents"], batch_size=1,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy",
                 "first_frame_cond": "ff_cond.npy"})
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 64
    return config
