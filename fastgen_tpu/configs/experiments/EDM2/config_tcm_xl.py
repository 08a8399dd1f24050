"""TCM on EDM2 ImageNet-64 (ref ``configs/experiments/EDM2/config_tcm_xl.py``;
reference 1-step FID 2.23)."""

from __future__ import annotations


from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_tcm import create_config as create_tcm_config
from fastgen_tpu.configs.net import build_edm2


def create_config():
    config = create_tcm_config()
    config.log_config.group = "imagenet64"
    config.log_config.name = "tcm_edm2_xl"
    config.model.net = L(build_edm2)(
        img_resolution=64, img_channels=3, label_dim=1000, sigma_data=0.5,
        logvar_channels=128, model_channels=448, channel_mult=[1, 2, 3, 4],
        num_blocks=3, attn_resolutions=[16, 8], dropout=0.0)
    config.model.input_shape = [64, 64, 3]
    config.model.use_ema = [0.9999]
    config.trainer.batch_size_global = 2048
    config.trainer.fsdp = True
    config.trainer.max_iter = 200_000
    return config
