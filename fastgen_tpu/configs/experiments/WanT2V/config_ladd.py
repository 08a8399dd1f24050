"""LADD on Wan-1.3B T2V (ref ``configs/experiments/WanT2V/config_ladd.py``):
pure adversarial distillation with a VideoDiT discriminator on teacher
features."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.discriminator import Discriminator_Wan_Config
from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_ladd import create_config as create_ladd_config
from fastgen_tpu.configs.net import Wan_1_3B_Config
from fastgen_tpu.data.wds import VideoWDSLoader


def create_config():
    config = create_ladd_config()
    config.log_config.group = "wan_t2v"
    config.log_config.name = "ladd_wan1_3b"
    config.model.net = copy.deepcopy(Wan_1_3B_Config)
    config.model.discriminator = copy.deepcopy(Discriminator_Wan_Config)
    config.model.input_shape = [21, 60, 104, 16]
    config.model.net_optimizer.lr = 5e-7
    config.model.discriminator_optimizer.lr = 5e-7
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = L(VideoWDSLoader)(
        datatags=["WDS:/path/to/wan_video_latents"], batch_size=1,
        sequence_length=81,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy"})
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 32
    return config
