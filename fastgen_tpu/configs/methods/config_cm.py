"""CM method config (ref ``fastgen/configs/methods/config_cm.py``)."""

from __future__ import annotations

import copy

import attrs

from fastgen_tpu.callbacks.basic import GradClipCallback
from fastgen_tpu.configs.callbacks import DEFAULT_CALLBACKS
from fastgen_tpu.configs.config import BaseConfig, BaseModelConfig
from fastgen_tpu.configs.config import SampleTConfig as BaseSampleTConfig
from fastgen_tpu.configs.data import CIFAR10_Loader_Config
from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.net import EDM_CIFAR10_Config
from fastgen_tpu.configs.opt import (
    BaseSchedulerConfig,
    RAdamOptimizerConfig,
)
from fastgen_tpu.methods.consistency_model.cm import CMModel


@attrs.define(slots=False)
class SampleTConfig(BaseSampleTConfig):
    time_dist_type: str = "lognormal"
    # lowest value for the end point r
    min_r: float = 0.0
    # quantize t and r to sigma-table entries
    quantize: bool = False


@attrs.define(slots=False)
class LossConfig:
    # use consistency distillation (needs a teacher)
    use_cd: bool = False
    # pseudo-huber constant
    huber_const: float = 1e-8
    use_squared_l2: bool = False
    # 'default' | 'c_out' | 'c_out_sq' | 'sigma_sq' | 'sqrt' | 'one'
    weighting_ct_loss: str = "default"


@attrs.define(slots=False)
class CTScheduleConfig:
    """ECT curriculum (ref ``callbacks/ct_schedule.py``), evaluated in-step."""

    enabled: bool = True
    q: float = 2.0
    ratio_limit: float = 0.999
    kimg_per_stage: int = 12500
    batch_size: int = 256


@attrs.define(slots=False)
class ModelConfig(BaseModelConfig):
    net: dict = attrs.field(factory=lambda: copy.deepcopy(EDM_CIFAR10_Config))
    net_optimizer: dict = attrs.field(factory=lambda: copy.deepcopy(RAdamOptimizerConfig))
    net_scheduler: dict = attrs.field(factory=lambda: copy.deepcopy(BaseSchedulerConfig))
    sample_t_cfg: SampleTConfig = attrs.field(factory=SampleTConfig)
    use_ema: object = True
    loss_config: LossConfig = attrs.field(factory=LossConfig)
    ct_schedule: CTScheduleConfig = attrs.field(factory=CTScheduleConfig)


@attrs.define(slots=False)
class Config(BaseConfig):
    model: ModelConfig = attrs.field(factory=ModelConfig)
    model_class: dict = attrs.field(factory=lambda: L(CMModel)(config=None))


def create_config() -> Config:
    config = Config()
    config.trainer.callbacks = dict(DEFAULT_CALLBACKS)
    # CM-family recipes effectively disable the clip (ref config_cm.py:95,
    # config_scm.py:104, config_mean_flow.py:135: grad_norm = 1e6); inherited
    # by sCM/TCM/MeanFlow configs built on top of this one
    config.trainer.callbacks["grad_clip"] = L(GradClipCallback)(
        grad_norm=1e6, model_key="net")
    config.dataloader_train = copy.deepcopy(CIFAR10_Loader_Config)
    config.model.sample_t_cfg.time_dist_type = "lognormal"
    config.model.sample_t_cfg.train_p_mean = -1.1
    config.model.sample_t_cfg.train_p_std = 2.0
    return config
