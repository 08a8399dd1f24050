"""KD method config (ref ``fastgen/configs/methods/config_kd.py``)."""

from __future__ import annotations

import copy

import attrs

from fastgen_tpu.configs.callbacks import DEFAULT_CALLBACKS
from fastgen_tpu.configs.config import BaseConfig, BaseModelConfig
from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.net import EDM_CIFAR10_Config
from fastgen_tpu.configs.opt import BaseOptimizerConfig, BaseSchedulerConfig
from fastgen_tpu.methods.knowledge_distillation.kd import CausalKDModel, KDModel


@attrs.define(slots=False)
class ModelConfig(BaseModelConfig):
    net: dict = attrs.field(factory=lambda: copy.deepcopy(EDM_CIFAR10_Config))
    net_optimizer: dict = attrs.field(factory=lambda: copy.deepcopy(BaseOptimizerConfig))
    net_scheduler: dict = attrs.field(factory=lambda: copy.deepcopy(BaseSchedulerConfig))


@attrs.define(slots=False)
class Config(BaseConfig):
    model: ModelConfig = attrs.field(factory=ModelConfig)
    model_class: dict = attrs.field(factory=lambda: L(KDModel)(config=None))


def create_config() -> Config:
    config = Config()
    config.trainer.callbacks = dict(DEFAULT_CALLBACKS)
    return config


def create_causal_config() -> Config:
    config = create_config()
    config.model_class = L(CausalKDModel)(config=None)
    return config
