"""DMD2 CIFAR-10 full recipe (ref ``configs/experiments/EDM/config_dmd2_cifar10.py``;
reference result: 1-step FID 1.99). Requires ``cifar10-32x32.zip`` under
``$DATA_ROOT_DIR`` and a pretrained EDM teacher checkpoint."""

from __future__ import annotations

from fastgen_tpu.configs.methods.config_dmd2 import create_config as create_dmd2_config


def create_config():
    config = create_dmd2_config()
    config.log_config.group = "cifar10"
    config.log_config.name = "dmd2_cifar10"
    config.model.input_shape = [32, 32, 3]
    config.model.use_ema = [0.9999]
    config.model.student_update_freq = 5
    config.model.gan_loss_weight_gen = 3e-3
    config.model.sample_t_cfg.time_dist_type = "polynomial"
    config.model.net_optimizer.lr = 1e-4
    config.model.fake_score_optimizer.lr = 1e-4
    config.model.discriminator_optimizer.lr = 1e-4
    config.trainer.batch_size_global = 256
    config.trainer.max_iter = 200_000
    config.trainer.validation_iter = 1000
    config.trainer.save_ckpt_iter = 5000
    return config
