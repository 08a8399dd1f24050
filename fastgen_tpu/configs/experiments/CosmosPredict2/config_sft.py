"""SFT on Cosmos Predict2-2B video2world
(ref ``configs/experiments/CosmosPredict2/config_sft.py``)."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.configs.net import CosmosPredict2_2B_Config
from fastgen_tpu.data.wds import WDSLoader


def create_config():
    config = create_sft_config()
    config.log_config.group = "cosmos"
    config.log_config.name = "sft_cosmos2b"
    config.model.net = copy.deepcopy(CosmosPredict2_2B_Config)
    config.model.input_shape = [24, 60, 104, 16]  # 480p
    config.model.net_optimizer.lr = 1e-5
    config.model.guidance_scale = 7.0
    config.model.student_sample_steps = 35
    config.model.precision_amp = "bfloat16"
    config.dataloader_train = L(WDSLoader)(
        datatags=["WDS:/path/to/cosmos_latents"], batch_size=1,
        key_map={"real": "latent.npy", "condition": "txt_emb.npy",
                 "conditioning_latents": "cond_latent.npy",
                 "condition_mask": "cond_mask.npy"})
    config.trainer.fsdp = True
    config.trainer.max_iter = 10_000
    config.trainer.batch_size_global = 32
    return config
