"""DMD2 method config (ref ``fastgen/configs/methods/config_dmd2.py``)."""

from __future__ import annotations

import copy
from typing import Optional

import attrs

from fastgen_tpu.configs.callbacks import DEFAULT_CALLBACKS
from fastgen_tpu.configs.config import BaseConfig, BaseModelConfig
from fastgen_tpu.configs.data import CIFAR10_Loader_Config
from fastgen_tpu.configs.discriminator import Discriminator_EDM_CIFAR10_Config
from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.net import EDM_CIFAR10_Config
from fastgen_tpu.configs.opt import BaseOptimizerConfig, BaseSchedulerConfig
from fastgen_tpu.methods.distribution_matching.dmd2 import DMD2Model


@attrs.define(slots=False)
class ModelConfig(BaseModelConfig):
    net: dict = attrs.field(factory=lambda: copy.deepcopy(EDM_CIFAR10_Config))
    net_optimizer: dict = attrs.field(factory=lambda: copy.deepcopy(BaseOptimizerConfig))
    net_scheduler: dict = attrs.field(factory=lambda: copy.deepcopy(BaseSchedulerConfig))

    fake_score_optimizer: dict = attrs.field(factory=lambda: copy.deepcopy(BaseOptimizerConfig))
    fake_score_scheduler: dict = attrs.field(factory=lambda: copy.deepcopy(BaseSchedulerConfig))

    discriminator: dict = attrs.field(
        factory=lambda: copy.deepcopy(Discriminator_EDM_CIFAR10_Config))
    discriminator_optimizer: dict = attrs.field(factory=lambda: copy.deepcopy(BaseOptimizerConfig))
    discriminator_scheduler: dict = attrs.field(factory=lambda: copy.deepcopy(BaseSchedulerConfig))

    # student update frequency (student every N iters, critic otherwise)
    student_update_freq: int = 5
    # weight for the GAN generator loss (0 disables the discriminator entirely)
    gan_loss_weight_gen: float = 0.001
    # use the same t/noise for real and fake data in the disc update
    gan_use_same_t_noise: bool = False
    # DSM space for the fake score (None = teacher's net_pred_type)
    fake_score_pred_type: Optional[str] = None
    # approximate R1 regularization (APT)
    gan_r1_reg_weight: float = 0.0
    gan_r1_reg_alpha: float = 0.1


@attrs.define(slots=False)
class Config(BaseConfig):
    model: ModelConfig = attrs.field(factory=ModelConfig)
    model_class: dict = attrs.field(factory=lambda: L(DMD2Model)(config=None))


def create_config() -> Config:
    config = Config()
    config.trainer.callbacks = dict(DEFAULT_CALLBACKS)
    config.dataloader_train = copy.deepcopy(CIFAR10_Loader_Config)
    config.dataloader_train.batch_size = 256
    config.model.discriminator_scheduler.warm_up_steps = [0]
    config.model.fake_score_scheduler.warm_up_steps = [0]
    config.model.net_scheduler.warm_up_steps = [0]
    config.model.sample_t_cfg.time_dist_type = "polynomial"
    return config
