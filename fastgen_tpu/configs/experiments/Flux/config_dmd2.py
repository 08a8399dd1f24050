"""DMD2 on Flux.1-dev (ref ``configs/experiments/Flux/config_dmd2.py``):
4-step T2I distillation; guidance is embedded (net.guidance_scale), not CFG."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.discriminator import Discriminator_Flux_Config
from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_dmd2 import create_config as create_dmd2_config
from fastgen_tpu.configs.net import Flux_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_dmd2_config()
    config.log_config.group = "flux"
    config.log_config.name = "dmd2_flux"
    net = copy.deepcopy(Flux_Config)
    net.guidance_scale = 3.5  # embedded guidance
    config.model.net = net
    config.model.discriminator = copy.deepcopy(Discriminator_Flux_Config)
    config.model.input_shape = [64, 64, 16]  # 512px packed latents
    config.model.student_sample_steps = 4
    config.model.net_optimizer.lr = 1e-5
    config.model.fake_score_optimizer.lr = 1e-5
    config.model.discriminator_optimizer.lr = 1e-5
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/flux_latents"], batch_size=2,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy",
                 "pooled": "pooled_emb.npy"})
    config.trainer.fsdp = True
    config.trainer.max_iter = 5000
    config.trainer.batch_size_global = 64
    return config
