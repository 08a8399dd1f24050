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


class TestGradClip:
    """Grad sanitize + clip semantics (ref ``callbacks/grad_clip.py:118-219``:
    nan_to_num then global-norm clip, composed per net key)."""

    def test_transform_sanitizes_and_clips(self):
        from fastgen_tpu.configs.opt import grad_sanitize_and_clip

        tx = grad_sanitize_and_clip(1.0)
        grads = {"a": jnp.array([jnp.nan, 3.0, -4.0]),
                 "b": jnp.array([jnp.inf, -jnp.inf])}
        st = tx.init(grads)
        out, _ = tx.update(grads, st)
        leaves = jax.tree_util.tree_leaves(out)
        assert all(bool(jnp.isfinite(v).all()) for v in leaves)
        gnorm = float(jnp.sqrt(sum(jnp.sum(v * v) for v in leaves)))
        assert gnorm <= 1.0 + 1e-5

    def test_transform_identity_below_norm(self):
        from fastgen_tpu.configs.opt import grad_sanitize_and_clip

        tx = grad_sanitize_and_clip(100.0)
        grads = {"a": jnp.array([3.0, -4.0])}  # norm 5 < 100
        out, _ = tx.update(grads, tx.init(grads))
        np.testing.assert_allclose(np.asarray(out["a"]), [3.0, -4.0])

    def test_posinf_neginf_overrides(self):
        from fastgen_tpu.configs.opt import grad_sanitize_and_clip

        tx = grad_sanitize_and_clip(None, posinf=7.0, neginf=-2.0)
        out, _ = tx.update({"a": jnp.array([jnp.inf, -jnp.inf, jnp.nan])},
                           tx.init({"a": jnp.zeros(3)}))
        np.testing.assert_allclose(np.asarray(out["a"]), [7.0, -2.0, 0.0])

    def test_callback_spec_and_aliases(self, tmp_path):
        from fastgen_tpu.callbacks.basic import GradClipCallback

        cb = GradClipCallback(config=_Cfg(str(tmp_path)), grad_norm=5.0,
                              model_key="fake_score", posinf=1.0)
        assert cb.clip_spec() == {"norm": 5.0, "posinf": 1.0, "neginf": None}
        legacy = GradClipCallback(config=_Cfg(str(tmp_path)), clip_norm=3.0)
        assert legacy.clip_norm == 3.0 and legacy.model_key == "net"

    def test_apply_step_survives_nan_grads(self):
        """With grad_clip wired, a NaN gradient burst must not poison params
        (the reference's nan_to_num guarantee)."""
        import copy

        from fastgen_tpu.configs.data import Synthetic_Loader_Config
        from fastgen_tpu.configs.methods.config_sft import (
            create_config as create_sft_config,
        )
        from fastgen_tpu.configs.net import EDM_Test_Config
        from fastgen_tpu.utils import instantiate

        config = create_sft_config()
        config.model.net = copy.deepcopy(EDM_Test_Config)
        config.model.input_shape = [16, 16, 3]
        config.model.use_ema = False
        config.dataloader_train = copy.deepcopy(Synthetic_Loader_Config)
        model = instantiate(config.model_class, config=config.model)
        model.grad_clip["net"] = {"norm": 10.0}
        state = model.init_state(jax.random.PRNGKey(0))

        nan_grads = {"net": jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, jnp.nan), state.params["net"]["params"])}
        apply_step = jax.jit(model.make_apply_step("student"))
        new_state = apply_step(state, nan_grads, None)
        leaves = jax.tree_util.tree_leaves(new_state.params["net"])
        assert all(bool(jnp.isfinite(v).all()) for v in leaves
                   if jnp.issubdtype(v.dtype, jnp.floating))

    def test_trainer_wires_callback_spec(self, tmp_path):
        """Trainer.run's wiring: a GradClipCallback in the callbacks dict ends
        up in model.grad_clip before optimizers are built."""
        from fastgen_tpu.callbacks.basic import GradClipCallback

        class FakeModel:
            grad_clip = {}

        cb_obj = GradClipCallback(config=_Cfg(str(tmp_path)), grad_norm=2.5,
                                  model_key="net")
        model = FakeModel()
        for cb in {"grad_clip": cb_obj}.values():
            if isinstance(cb, GradClipCallback) and cb.clip_norm is not None:
                model.grad_clip[cb.model_key] = cb.clip_spec()
        assert model.grad_clip == {"net": {"norm": 2.5, "posinf": None,
                                           "neginf": None}}


class TestEMASpecs:
    """EMA beta schedule math (ref ``test_ema_callback_beta_types`` — here the
    betas live in ``methods/base.py`` and lerp inside the jitted step)."""

    def test_constant_beta(self):
        from fastgen_tpu.methods.base import ema_beta_from_spec, ema_name_from_spec

        assert float(ema_beta_from_spec(0.999)) == pytest.approx(0.999)
        assert float(ema_beta_from_spec({"type": "constant", "beta": 0.99})) \
            == pytest.approx(0.99)
        assert ema_name_from_spec(0.999) == "ema_0.999"

    def test_power_beta_formula(self):
        from fastgen_tpu.methods.base import ema_beta_from_spec

        gamma = 6.94
        it = jnp.asarray(10, jnp.int32)
        beta = float(ema_beta_from_spec({"type": "power", "gamma": gamma}, it))
        assert beta == pytest.approx((1 - 1 / 10) ** (gamma + 1))
        # early iterations never divide by zero
        beta0 = float(ema_beta_from_spec({"type": "power", "gamma": gamma},
                                         jnp.asarray(0, jnp.int32)))
        assert beta0 == 0.0

    def test_halflife_beta(self):
        from fastgen_tpu.methods.base import ema_beta_from_spec

        beta = float(ema_beta_from_spec({"type": "halflife",
                                         "halflife_iters": 100}))
        assert 0 < beta < 1
        assert beta ** 100 == pytest.approx(0.5, rel=1e-5)

    def test_unknown_spec_raises(self):
        from fastgen_tpu.methods.base import ema_beta_from_spec

        with pytest.raises(ValueError):
            ema_beta_from_spec({"type": "nope"})

    def test_ema_lerp_matches_hand_rollout(self):
        """state.ema after N applied steps equals the hand-computed
        beta-lerp recursion over the updated params (ref
        ``test_ema_callback_multiple_steps``)."""
        import copy

        from fastgen_tpu.configs.data import Synthetic_Loader_Config
        from fastgen_tpu.configs.methods.config_sft import (
            create_config as create_sft_config,
        )
        from fastgen_tpu.configs.net import EDM_Test_Config
        from fastgen_tpu.utils import instantiate

        config = create_sft_config()
        config.model.net = copy.deepcopy(EDM_Test_Config)
        config.model.input_shape = [16, 16, 3]
        config.model.use_ema = [0.9]
        config.dataloader_train = copy.deepcopy(Synthetic_Loader_Config)
        model = instantiate(config.model_class, config=config.model)
        state = model.init_state(jax.random.PRNGKey(1))
        apply_step = jax.jit(model.make_apply_step("student"))

        def flat(tree):
            return np.concatenate([np.asarray(l).ravel() for l in
                                   jax.tree_util.tree_leaves(tree)])

        ema_ref = flat(state.ema["ema_0.9"])
        cur = state
        for i in range(3):
            g = {"net": jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, 0.01 * (i + 1)),
                cur.params["net"]["params"])}
            cur = apply_step(cur, g, None)
            ema_ref = ema_ref * 0.9 + flat(cur.params["net"]) * 0.1
        np.testing.assert_allclose(flat(cur.ema["ema_0.9"]), ema_ref,
                                   rtol=2e-5, atol=1e-6)
