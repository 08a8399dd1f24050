"""CausVid smoke config: tiny causal Wan + synthetic video latents."""

from __future__ import annotations

import copy

from fastgen_tpu.configs.lazy import LazyCall as L
from fastgen_tpu.configs.methods.config_causvid import create_config as create_causvid_config
from fastgen_tpu.configs.net import CausalWan_Test_Config, Wan_Test_Config
from fastgen_tpu.data.class_cond_dataloader import SyntheticVideoLoader


def create_config():
    config = create_causvid_config()
    config.log_config.group = "wan_test"
    config.log_config.name = "causvid_test"
    config.model.net = copy.deepcopy(CausalWan_Test_Config)
    config.model.teacher = copy.deepcopy(Wan_Test_Config)
    config.model.input_shape = [4, 8, 8, 4]
    config.model.use_ema = False
    config.model.student_sample_steps = 2
    config.dataloader_train = L(SyntheticVideoLoader)(batch_size=2)
    config.trainer.max_iter = 6
    config.trainer.validation_iter = 100
    config.trainer.save_ckpt_iter = 6
    config.trainer.logging_iter = 2
    return config
