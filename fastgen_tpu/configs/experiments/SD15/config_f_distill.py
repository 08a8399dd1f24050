"""f-distill on SD 1.5 (ref ``configs/experiments/SD15/config_f_distill.py``)."""

from __future__ import annotations


from fastgen_tpu.configs.experiments.SD15.config_dmd2 import (
    create_config as create_sd15_dmd2_config)
from fastgen_tpu.configs.methods.config_f_distill import (
    create_config as create_f_distill_config)


def create_config():
    dmd2 = create_sd15_dmd2_config()
    config = create_f_distill_config()
    config.log_config.group = "sd15"
    config.log_config.name = "f_distill_sd15"
    config.model.net = dmd2.model.net
    config.model.discriminator = dmd2.model.discriminator
    config.model.input_shape = dmd2.model.input_shape
    config.model.guidance_scale = 1.75
    config.model.net_optimizer.lr = 1e-5
    config.model.fake_score_optimizer.lr = 1e-5
    config.model.discriminator_optimizer.lr = 1e-5
    config.model.sample_t_cfg.time_dist_type = "uniform"
    config.model.sample_t_cfg.min_t = 0.001
    config.model.sample_t_cfg.max_t = 0.999
    config.dataloader_train = dmd2.dataloader_train
    config.trainer.fsdp = True
    config.trainer.max_iter = 100_000
    config.trainer.batch_size_global = 2048
    return config
