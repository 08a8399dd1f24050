"""sCM method config (ref ``fastgen/configs/methods/config_scm.py``)."""

from __future__ import annotations

from typing import Optional

import attrs

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_cm import (
    Config as CMConfig,
    CTScheduleConfig,
    ModelConfig as CMModelConfig,
    SampleTConfig as CMSampleTConfig,
    create_config as create_cm_config,
)
from fastgen_tpu.methods.consistency_model.scm import SCMModel


@attrs.define(slots=False)
class SampleTConfig(CMSampleTConfig):
    time_dist_type: str = "lognormal"
    train_p_mean: float = -1.0
    train_p_std: float = 1.4
    # sigma of the data distribution
    sigma_data: float = 0.5
    quantize: bool = False


@attrs.define(slots=False)
class LossConfig:
    use_cd: bool = False
    tangent_warmup_steps: int = 10000
    tangent_warmup_const: float = 0.1
    prior_weighting_enabled: bool = True
    g_norm_spatial_invariance: bool = True
    divide_x_0_spatial_dim: bool = True
    use_jvp_finite_diff: bool = False
    jvp_finite_diff_eps: float = 1e-3


@attrs.define(slots=False)
class ModelConfig(CMModelConfig):
    sample_t_cfg: SampleTConfig = attrs.field(factory=SampleTConfig)
    loss_config: LossConfig = attrs.field(factory=LossConfig)
    # JVP precision override (None = same as precision_amp)
    precision_amp_jvp: Optional[str] = None


@attrs.define(slots=False)
class Config(CMConfig):
    model: ModelConfig = attrs.field(factory=ModelConfig)
    model_class: dict = attrs.field(factory=lambda: L(SCMModel)(config=None))


def create_config() -> Config:
    base = create_cm_config()
    config = Config()
    config.trainer = base.trainer
    config.dataloader_train = base.dataloader_train
    return config
