"""SFT method config (ref ``fastgen/configs/methods/config_sft.py``)."""

from __future__ import annotations

import copy
from typing import List, Optional

import attrs

from fastgen_tpu.configs.callbacks import DEFAULT_CALLBACKS
from fastgen_tpu.configs.config import BaseConfig, BaseModelConfig
from fastgen_tpu.configs.data import CIFAR10_Loader_Config
from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.net import EDM_CIFAR10_Config
from fastgen_tpu.configs.opt import BaseOptimizerConfig, BaseSchedulerConfig
from fastgen_tpu.methods.fine_tuning.sft import CausalSFTModel, SFTModel


@attrs.define(slots=False)
class ModelConfig(BaseModelConfig):
    net: dict = attrs.field(factory=lambda: copy.deepcopy(EDM_CIFAR10_Config))
    net_optimizer: dict = attrs.field(factory=lambda: copy.deepcopy(BaseOptimizerConfig))
    net_scheduler: dict = attrs.field(factory=lambda: copy.deepcopy(BaseSchedulerConfig))
    # probability of replacing condition with neg_condition (CFG training)
    cond_dropout_prob: Optional[float] = None
    cond_keys_no_dropout: List[str] = attrs.field(factory=list)


@attrs.define(slots=False)
class Config(BaseConfig):
    model: ModelConfig = attrs.field(factory=ModelConfig)
    model_class: dict = attrs.field(factory=lambda: L(SFTModel)(config=None))


def create_config() -> Config:
    config = Config()
    config.trainer.callbacks = dict(DEFAULT_CALLBACKS)
    config.dataloader_train = copy.deepcopy(CIFAR10_Loader_Config)
    return config


def create_causal_config() -> Config:
    """Diffusion-forcing SFT (ref ``fine_tuning/sft.py:164``)."""
    config = create_config()
    config.model_class = L(CausalSFTModel)(config=None)
    return config
