"""SFT on Flux.1-dev (ref ``configs/experiments/Flux/config_sft.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import Flux_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_sft_config()
    config.log_config.group = "flux"
    config.log_config.name = "sft_flux"
    config.model.net = copy.deepcopy(Flux_Config)
    config.model.input_shape = [64, 64, 16]
    config.model.net_optimizer.lr = 1e-5
    config.model.student_sample_steps = 28
    config.model.sample_t_cfg.time_dist_type = "logitnormal"
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/flux_latents"], batch_size=2,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy",
                 "pooled": "pooled_emb.npy"})
    config.trainer.fsdp = True
    config.trainer.max_iter = 100_000
    config.trainer.batch_size_global = 256
    return config
