"""DMD2 on SD 1.5 latents (ref ``configs/experiments/SD15/config_dmd2.py``):
4-step T2I distillation from precomputed latent+text-embedding WDS shards."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.discriminator import Discriminator_SD15_Res512_Config
from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_dmd2 import create_config as create_dmd2_config
from fastgen_tpu.configs.net import SD15_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_dmd2_config()
    config.log_config.group = "sd15"
    config.log_config.name = "dmd2_sd15"
    config.model.net = copy.deepcopy(SD15_Config)
    config.model.discriminator = copy.deepcopy(Discriminator_SD15_Res512_Config)
    config.model.input_shape = [64, 64, 4]  # 512px latents
    config.model.student_sample_steps = 4
    config.model.guidance_scale = 3.0
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/sd15_latents"], batch_size=8,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy"},
        files_map={"neg_condition": "/path/to/neg_prompt_emb.npy"})
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 128
    return config
