"""SFT fine-tune of EDM on CIFAR-10 (ref
``configs/experiments/EDM/config_sft_edm_cifar10.py``): lognormal sigma
sampling, ADA augmentation labels, power-EMA."""

from __future__ import annotations

from fastgen_tpu.configs.methods.config_sft import create_config as create_sft_config


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
    config.model.use_ema = [{"type": "power", "gamma": 6.94}]
    config.trainer.batch_size_global = 512
    config.trainer.max_iter = 200_000
    return config
