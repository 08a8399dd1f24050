"""SFT fine-tune of EDM on CIFAR-10 (ref
``configs/experiments/EDM/config_sft_edm_cifar10.py``): lognormal sigma
sampling, ADA augmentation labels, power-EMA."""

from __future__ import annotations

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config
from fastgen_tpu.data.augment import AugmentPipe


def create_config():
    config = create_sft_config()
    config.log_config.group = "cifar10"
    config.log_config.name = "sft_edm_cifar10"
    config.model.input_shape = [32, 32, 3]
    config.model.sample_t_cfg.time_dist_type = "lognormal"
    config.model.sample_t_cfg.train_p_mean = -1.2
    config.model.sample_t_cfg.train_p_std = 1.2
    config.model.net.dropout = 0.13
    config.model.net_optimizer.lr = 2e-5
    # ADA augmentation labels (EDM paper; 9 dims: scale + rotate(2) +
    # brightness + contrast + lumaflip + hue(2)... ref :48-69)
    config.trainer.augment_pipe = L(AugmentPipe)(
        p=0.12, scale=1, scale_std=0.2, rotate_frac=1, rotate_frac_max=1,
        brightness=1, brightness_std=0.2, contrast=1, contrast_std=0.5,
        lumaflip=1, hue=1, hue_max=1, saturation=1, saturation_std=1)
    config.model.net.augment_dim = 9
    config.model.use_ema = [{"type": "power", "gamma": 6.94}]
    config.trainer.batch_size_global = 512
    config.trainer.max_iter = 200_000
    return config
