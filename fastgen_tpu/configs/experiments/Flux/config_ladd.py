"""LADD on Flux.1-dev (ref ``configs/experiments/Flux/config_ladd.py``):
adversarial distillation of the 12B MMDiT with DiT-feature discriminator."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.discriminator import Discriminator_Flux_Config
from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_ladd import create_config as create_ladd_config
from fastgen_tpu.configs.net import Flux_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_ladd_config()
    config.log_config.group = "flux"
    config.log_config.name = "ladd_flux"
    config.model.net = copy.deepcopy(Flux_Config)
    config.model.discriminator = copy.deepcopy(Discriminator_Flux_Config)
    config.model.input_shape = [128, 128, 16]  # 1024px packed latents
    config.model.student_sample_steps = 4
    config.model.sample_t_cfg.time_dist_type = "shifted"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/flux_latents"], batch_size=1,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy",
                 "pooled": "pooled_emb.npy"})
    config.trainer.fsdp = True
    config.trainer.batch_size_global = 64
    return config
