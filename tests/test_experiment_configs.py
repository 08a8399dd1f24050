"""Every experiment config must build and instantiate its model class
(mirrors the reference's config-zoo coverage). Data paths are placeholders so
loaders are instantiated lazily by the trainer, not here."""

import glob
import os

import pytest

from fastgen_tpu.configs.config_utils import import_config_from_python_file
from fastgen_tpu.utils import instantiate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(
    REPO, "fastgen_tpu/configs/experiments/*/config_*.py")))

# big-model configs: create_config + model_class resolution only (no init)
HEAVY = {"config_dmd2_in64", "config_cm_s", "config_tcm_xl", "config_mf_xl",
         "config_dmd2_sd15", "config_ladd", "config_dmd2_wan14b", "config_dmd2",
         "config_self_forcing", "config_causvid", "config_sft",
         "config_dmd2_cifar10", "config_cm_cifar10", "config_mf_cifar10",
         "config_sct_cifar10", "config_scd_cifar10", "config_tcm_cifar10"}


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: "/".join(p.split("/")[-2:]))
def test_config_builds(path):
    config = import_config_from_python_file(path)
    assert config.model_class is not None
    assert config.model.net is not None
    # the lazy target must resolve to a class
    from fastgen_tpu.configs.lazy import locate

    target = config.model_class["_target_"]
    cls = locate(target) if isinstance(target, str) else target
    assert callable(cls)
    stem = os.path.splitext(os.path.basename(path))[0]
    if stem.endswith("_test"):
        # smoke configs must fully instantiate
        model = instantiate(config.model_class, config=config.model)
        assert model.net is not None
