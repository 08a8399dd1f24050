"""Callback system tests (ref ``tests/test_callbacks.py``): hook fan-out,
JSONL metrics logging, sample-grid dumps, param counting, profiler
decomposition, CT-schedule logging, and state_dict round-trips."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.callbacks.basic import (
    CTScheduleCallback,
    DeviceStatsCallback,
    ParamCountCallback,
    TrainProfilerCallback,
    WandbCallback,
)
from fastgen_tpu.callbacks.callback import Callback, CallbackDict


class _Cfg:
    """Minimal attribute-tree config for unit-level callback tests."""

    def __init__(self, save_path):
        self.log_config = type("L", (), {})()
        self.log_config.save_path = save_path
        self.log_config.wandb_mode = "jsonl"
        self.log_config.project = "t"
        self.log_config.group = "g"
        self.log_config.name = "n"
        self.trainer = type("T", (), {})()
        self.trainer.logging_iter = 2
        self.trainer.callbacks = None
        self.trainer.visualize_teacher = False


class _State:
    def __init__(self):
        self.params = {"net": {"w": jnp.ones((3, 4))},
                       "teacher": {"w": jnp.ones((2, 2))}}


class _Model:
    vae = None
    input_shape = (8, 8, 3)


class TestCallbackDict:
    def test_fanout_order_and_dispatch(self):
        calls = []

        class A(Callback):
            def on_train_begin(self, model, state=None, iteration=0):
                calls.append(("a", iteration))

        class B(Callback):
            def on_train_begin(self, model, state=None, iteration=0):
                calls.append(("b", iteration))

        cd = CallbackDict()
        cd.add("a", A())
        cd.add("b", B())
        cd.on_train_begin(None, iteration=7)
        assert calls == [("a", 7), ("b", 7)]

    def test_replace_keeps_latest(self):
        cd = CallbackDict()
        first, second = Callback(), Callback()
        cd.add("x", first)
        cd.add("x", second)
        assert cd["x"] is second

    def test_state_dict_roundtrip(self):
        class Stateful(Callback):
            def __init__(self):
                super().__init__()
                self.n = 0

            def state_dict(self):
                return {"n": self.n}

            def load_state_dict(self, state):
                self.n = state["n"]

        cd = CallbackDict()
        cd.add("s", Stateful())
        cd["s"].n = 42
        blob = cd.state_dict()
        cd2 = CallbackDict()
        cd2.add("s", Stateful())
        cd2.load_state_dict(blob)
        assert cd2["s"].n == 42

    def test_unknown_names_in_state_ignored(self):
        cd = CallbackDict()
        cd.add("a", Callback())
        cd.load_state_dict({"gone": {"x": 1}, "a": {}})  # must not raise


class TestWandbJsonl:
    def test_scalar_accumulation_and_flush(self, tmp_path):
        cfg = _Cfg(str(tmp_path))
        cb = WandbCallback(config=cfg, logging_iter=2)
        cb.on_app_begin()
        cb.on_training_step_end(_Model(), loss_map={"loss": 1.0}, iteration=1)
        cb.on_training_step_end(_Model(), loss_map={"loss": 3.0}, iteration=2)
        cb.on_app_end()
        lines = [json.loads(l) for l in
                 open(tmp_path / "metrics.jsonl").read().splitlines()]
        assert lines and lines[0]["iteration"] == 2
        # averaged over the 2-step window
        assert lines[0]["train/loss"] == pytest.approx(2.0)

    def test_non_scalar_losses_skipped(self, tmp_path):
        cfg = _Cfg(str(tmp_path))
        cb = WandbCallback(config=cfg, logging_iter=1)
        cb.on_app_begin()
        cb.on_training_step_end(
            _Model(), loss_map={"ok": 2.0, "bad": np.ones((3, 3))},
            iteration=1)
        cb.on_app_end()
        rec = json.loads(open(tmp_path / "metrics.jsonl").readline())
        assert "train/ok" in rec and "train/bad" not in rec

    def test_validation_sample_grid_saved(self, tmp_path):
        cfg = _Cfg(str(tmp_path))
        cb = WandbCallback(config=cfg, logging_iter=1)
        cb.on_app_begin()
        gen = np.random.RandomState(0).randn(4, 8, 8, 3).astype(np.float32)
        cb.on_validation_step_end(_Model(), state=_State(),
                                  outputs={"gen_rand": gen}, iteration=5, idx=0)
        cb.on_app_end()
        assert os.path.exists(tmp_path / "samples" / "iter_0000005_0.png")

    def test_video_outputs_save_middle_frame(self, tmp_path):
        cfg = _Cfg(str(tmp_path))
        cb = WandbCallback(config=cfg, logging_iter=1)
        cb.on_app_begin()
        gen = np.zeros((2, 5, 8, 8, 3), np.float32)
        cb.on_validation_step_end(_Model(), state=_State(),
                                  outputs={"gen_rand": gen}, iteration=1, idx=1)
        cb.on_app_end()
        assert os.path.exists(tmp_path / "samples" / "iter_0000001_1.png")


class TestParamCount:
    def test_logs_without_error(self, tmp_path, caplog):
        cb = ParamCountCallback(config=_Cfg(str(tmp_path)))
        cb.on_train_begin(_Model(), state=_State())  # must not raise


class TestTrainProfiler:
    def test_decomposition_keys(self, tmp_path):
        cfg = _Cfg(str(tmp_path))
        cb = TrainProfilerCallback(config=cfg, logging_iter=2)
        m = _Model()
        for it in (1, 2):
            cb.on_training_step_begin(m, iteration=it)
            cb.on_training_accum_step_begin(m, iteration=it)
            cb.on_training_step_end(m, iteration=it)
        assert len(cb.iter_times) == 2 and len(cb.data_times) == 2
        assert len(cb.host_times) == 1  # gap exists only between steps
        assert all(t >= 0 for t in cb.iter_times + cb.data_times)

    def test_state_survives_roundtrip(self, tmp_path):
        cfg = _Cfg(str(tmp_path))
        cb = TrainProfilerCallback(config=cfg, logging_iter=2)
        blob = cb.state_dict()
        cb.load_state_dict(blob)


class TestDeviceStats:
    def test_hook_is_exception_free(self, tmp_path):
        cb = DeviceStatsCallback(config=_Cfg(str(tmp_path)), logging_iter=1)
        cb.on_training_step_end(_Model(), iteration=1)


class TestCTSchedule:
    def test_disabled_config_is_noop(self, tmp_path):
        cfg = _Cfg(str(tmp_path))

        class M(_Model):
            config = type("C", (), {"ct_schedule": None})()

        cb = CTScheduleCallback(config=cfg, logging_iter=1)
        cb.on_training_step_end(M(), iteration=1)  # must not raise
