"""Checkpoint/resume invariant matrix (mirrors the reference's
``tests/test_checkpointing.py:155-960``): full-state round-trip equality,
optimizer-state equality, EMA independence from net updates, tolerant load on
missing/extra/mismatched keys, max_to_keep pruning, metadata sidecar, and
variable-update persistence. Toy DMD2/EDM state, CPU mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.configs.experiments.EDM.config_dmd2_test import (
    create_config as create_dmd2_test_config)
from fastgen_tpu.utils import instantiate
from fastgen_tpu.utils.checkpointer import Checkpointer, tolerant_merge

KEY = jax.random.PRNGKey(0)


def tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


@pytest.fixture(scope="module")
def model_and_state():
    cfg = create_dmd2_test_config()
    cfg.trainer.callbacks = {}
    cfg.model.net.model_channels = 8
    cfg.model.net.num_blocks = 1
    model = instantiate(cfg.model_class, config=cfg.model)
    model.init_optimizers()
    state = model.init_state(KEY)
    return cfg, model, state


def _one_step(model, state, batch_size=4, seed=7, phase="student"):
    batch = {
        "real": jax.random.normal(jax.random.PRNGKey(seed),
                                  (batch_size, 16, 16, 3)),
        "condition": jax.nn.one_hot(jnp.arange(batch_size) % 10, 10),
        "neg_condition": jnp.zeros((batch_size, 10)),
    }
    step = jax.jit(model.make_train_step(phase))
    new_state, loss_map, _ = step(state, batch, jax.random.PRNGKey(seed))
    return new_state, loss_map


class TestRoundTrip:
    def test_full_state_roundtrip_exact(self, model_and_state, tmp_path):
        _, model, state = model_and_state
        ckpt = Checkpointer(str(tmp_path / "ck"), async_save=False)
        ckpt.save(1, state, metadata={"callbacks": {"ema": 1}})
        ckpt.wait()
        restored, meta, step = ckpt.load(state)
        assert step == 1 and meta == {"callbacks": {"ema": 1}}
        # params, optimizer states (adam mu/nu), EMA and iteration all equal
        assert tree_equal(restored.params, state.params)
        assert tree_equal(restored.opt_states, state.opt_states)
        assert tree_equal(restored.ema, state.ema)
        assert int(restored.iteration) == int(state.iteration)
        ckpt.close()

    def test_optimizer_state_progresses_and_restores(self, model_and_state,
                                                     tmp_path):
        _, model, state = model_and_state
        state2, _ = _one_step(model, state)
        # optimizer state changed by the step (mu/nu accumulated)
        assert not tree_equal(state2.opt_states, state.opt_states)
        ckpt = Checkpointer(str(tmp_path / "ck2"), async_save=False)
        ckpt.save(2, state2)
        ckpt.wait()
        restored, _, _ = ckpt.load(state2)
        assert tree_equal(restored.opt_states, state2.opt_states)
        ckpt.close()

    def test_ema_independent_of_net(self, model_and_state):
        """EMA tracks but does not equal the net after an update, and the
        stored teacher params stay frozen (ref EMA-independence +
        teacher-exclusion invariants)."""
        _, model, state = model_and_state
        state2, _ = _one_step(model, state)
        if not state2.ema:
            pytest.skip("config has no EMA")
        name = sorted(state2.ema)[0]
        assert not tree_equal(state2.ema[name], state2.params["net"])
        assert not tree_equal(state2.ema[name], state.ema[name])
        assert tree_equal(state2.params["teacher"], state.params["teacher"])


class TestTolerantLoad:
    def test_missing_key_keeps_init(self, model_and_state, tmp_path):
        _, model, state = model_and_state
        ckpt = Checkpointer(str(tmp_path / "ck3"), async_save=False)
        # save a state whose params lack the discriminator entry
        slim_params = {k: v for k, v in state.params.items()
                       if k != "discriminator"}
        slim_opt = {k: v for k, v in state.opt_states.items()
                    if k != "discriminator"}
        ckpt.save(1, state.replace(params=slim_params, opt_states=slim_opt))
        ckpt.wait()
        restored, _, step = ckpt.load(state)
        assert step == 1
        # present keys restored, missing key kept its initialized value
        assert tree_equal(restored.params["net"], state.params["net"])
        assert tree_equal(restored.params["discriminator"],
                          state.params["discriminator"])
        ckpt.close()

    def test_extra_key_dropped(self, model_and_state, tmp_path):
        _, model, state = model_and_state
        ckpt = Checkpointer(str(tmp_path / "ck4"), async_save=False)
        fat_params = dict(state.params)
        fat_params["obsolete_net"] = {"params": {"w": jnp.ones((3, 3))}}
        ckpt.save(1, state.replace(params=fat_params))
        ckpt.wait()
        restored, _, _ = ckpt.load(state)
        assert "obsolete_net" not in restored.params
        assert tree_equal(restored.params["net"], state.params["net"])
        ckpt.close()

    def test_shape_mismatch_keeps_init(self):
        tmpl = {"a": jnp.zeros((2, 2)), "b": jnp.ones((3,))}
        raw = {"a": np.full((4, 4), 7.0), "b": np.full((3,), 5.0)}
        out = tolerant_merge(tmpl, raw)
        np.testing.assert_array_equal(np.asarray(out["a"]), np.zeros((2, 2)))
        np.testing.assert_array_equal(np.asarray(out["b"]), np.full((3,), 5.0))

    def test_namedtuple_and_dataclass_merge(self, model_and_state):
        _, model, state = model_and_state
        # orbax raw trees are dicts: build one from the real state and merge
        def rawify(t):
            if isinstance(t, dict):
                return {k: rawify(v) for k, v in t.items()}
            if isinstance(t, tuple) and hasattr(t, "_fields"):
                return {f: rawify(getattr(t, f)) for f in t._fields}
            if isinstance(t, (list, tuple)):
                return [rawify(v) for v in t]
            if hasattr(t, "replace") and hasattr(t, "params"):
                import dataclasses
                return {f.name: rawify(getattr(t, f.name))
                        for f in dataclasses.fields(t)}
            return np.asarray(t) if hasattr(t, "shape") else t

        merged = tolerant_merge(state, rawify(state))
        assert tree_equal(merged, state)
        assert type(merged) is type(state)


class TestRetentionAndLayout:
    def test_max_to_keep_prunes(self, model_and_state, tmp_path):
        _, model, state = model_and_state
        d = tmp_path / "ck5"
        ckpt = Checkpointer(str(d), max_to_keep=2, async_save=False)
        for step in (1, 2, 3):
            ckpt.save(step, state)
        ckpt.wait()
        assert ckpt.latest_step() == 3
        kept = sorted(int(n) for n in os.listdir(d) if n.isdigit())
        assert kept == [2, 3]
        ckpt.close()

    def test_commit_marker_guard(self, model_and_state, tmp_path):
        """A step dir without the Orbax commit marker is dropped by the
        S3-download guard (crash-safety invariant)."""
        _, model, state = model_and_state
        d = tmp_path / "ck6"
        ckpt = Checkpointer(str(d), async_save=False)
        ckpt.save(1, state)
        ckpt.wait()
        ckpt.close()
        # simulate a partially-uploaded step
        bad = d / "2"
        bad.mkdir()
        (bad / "array.bin").write_bytes(b"junk")
        Checkpointer._drop_uncommitted_steps(str(d))
        assert not bad.exists()
        assert (d / "1").exists()


class TestNativePretrainedLoad:
    """Stage-1 -> stage-2 handoff: pretrained_model_path pointing at a native
    Orbax run dir loads that run's net (preferring EMA) into the new method's
    teacher/net (the zero-egress counterpart of the reference loading its own
    trained torch checkpoints, ``model.py:600-644``)."""

    def test_load_native_net_params_prefers_ema(self, model_and_state, tmp_path):
        from fastgen_tpu.utils.checkpointer import load_native_net_params

        _, model, state = model_and_state
        ck = Checkpointer(str(tmp_path / "ck"), async_save=False)
        ck.save(3, state)
        ck.wait()
        loaded = load_native_net_params(str(tmp_path / "ck"))
        want = (sorted(state.ema)[0] and state.ema[sorted(state.ema)[0]]) \
            if state.ema else state.params["net"]
        assert tree_equal(loaded, want)

    def test_npz_snapshot_roundtrip(self, model_and_state, tmp_path):
        """save_net_params_npz <-> load_net_params_npz is exact at f32 and
        value-preserving through the bf16 storage path."""
        from fastgen_tpu.utils.checkpointer import (load_net_params_npz,
                                                    save_net_params_npz)

        _, model, state = model_and_state
        variables = state.params["net"]
        f32 = str(tmp_path / "net_f32.npz")
        save_net_params_npz(variables, f32, dtype="float32")
        assert tree_equal(load_net_params_npz(f32), variables)

        bf16 = str(tmp_path / "net_bf16.npz")
        save_net_params_npz(variables, bf16, dtype="bfloat16")
        loaded = load_net_params_npz(bf16)
        la = jax.tree_util.tree_leaves(loaded)
        lb = jax.tree_util.tree_leaves(variables)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(x, np.float32), np.asarray(y, np.float32),
                rtol=8e-3, atol=1e-6)

    def test_dmd2_consumes_npz_snapshot(self, model_and_state, tmp_path):
        """pretrained_model_path=<file>.npz warm-starts teacher+fake_score —
        the committed-snapshot path for sessions whose Orbax root died
        (QUALITY.md v6)."""
        from fastgen_tpu.utils.checkpointer import save_net_params_npz

        _, model, state = model_and_state
        src = state.ema[sorted(state.ema)[0]] if state.ema \
            else state.params["net"]
        snap = str(tmp_path / "teacher.npz")
        save_net_params_npz(src, snap, dtype="float32")

        cfg2 = create_dmd2_test_config()
        cfg2.trainer.callbacks = {}
        cfg2.model.net.model_channels = 8
        cfg2.model.net.num_blocks = 1
        cfg2.model.pretrained_model_path = snap
        model2 = instantiate(cfg2.model_class, config=cfg2.model)
        model2.init_optimizers()
        state2 = model2.init_state(jax.random.PRNGKey(9))
        assert tree_equal(state2.params["teacher"], src)
        assert tree_equal(state2.params["fake_score"], src)

    def test_dmd2_student_npz_overlay(self, model_and_state, tmp_path):
        """pretrained_student_net_path=<file>.npz overlays ONLY the student
        net while pretrained_model_path seeds teacher/fake_score — the
        recovery path when a distillation run's Orbax root dies and both
        curves must warm-start from committed snapshots (QUALITY.md v8b)."""
        from fastgen_tpu.utils.checkpointer import save_net_params_npz

        _, model, state = model_and_state
        teacher_src = state.ema[sorted(state.ema)[0]] if state.ema \
            else state.params["net"]
        student_src = jax.tree_util.tree_map(lambda a: a + 1.0,
                                             state.params["net"])
        tsnap = str(tmp_path / "teacher.npz")
        ssnap = str(tmp_path / "student.npz")
        save_net_params_npz(teacher_src, tsnap, dtype="float32")
        save_net_params_npz(student_src, ssnap, dtype="float32")

        cfg2 = create_dmd2_test_config()
        cfg2.trainer.callbacks = {}
        cfg2.model.net.model_channels = 8
        cfg2.model.net.num_blocks = 1
        cfg2.model.pretrained_model_path = tsnap
        cfg2.model.pretrained_student_net_path = ssnap
        model2 = instantiate(cfg2.model_class, config=cfg2.model)
        model2.init_optimizers()
        state2 = model2.init_state(jax.random.PRNGKey(9))
        assert tree_equal(state2.params["teacher"], teacher_src)
        assert tree_equal(state2.params["fake_score"], teacher_src)
        assert tree_equal(state2.params["net"], student_src)
        # EMA starts at the warm-started student, not the teacher
        if state2.ema:
            assert tree_equal(state2.ema[sorted(state2.ema)[0]], student_src)

    def test_dmd2_consumes_stage1_checkpoint(self, model_and_state, tmp_path):
        _, model, state = model_and_state
        ck = Checkpointer(str(tmp_path / "stage1"), async_save=False)
        ck.save(5, state)
        ck.wait()

        cfg2 = create_dmd2_test_config()
        cfg2.trainer.callbacks = {}
        cfg2.model.net.model_channels = 8
        cfg2.model.net.num_blocks = 1
        cfg2.model.pretrained_model_path = str(tmp_path / "stage1")
        model2 = instantiate(cfg2.model_class, config=cfg2.model)
        model2.init_optimizers()
        state2 = model2.init_state(jax.random.PRNGKey(9))

        src = state.ema[sorted(state.ema)[0]] if state.ema \
            else state.params["net"]
        # teacher took the stage-1 weights; fake_score is seeded from teacher
        assert tree_equal(state2.params["teacher"], src)
        assert tree_equal(state2.params["fake_score"], src)


class TestTeacherExclusion:
    """Frozen nets are not persisted (ref ``test_teacher_excluded_from_
    checkpoint`` / ``test_teacher_state_unchanged_after_load``,
    ``tests/test_checkpointing.py:405-486``)."""

    def test_frozen_keys_derivation(self, model_and_state):
        _, model, _ = model_and_state
        # DMD2: student phase trains net; critic phase trains fake_score(+disc)
        frozen = model.frozen_net_keys()
        assert "teacher" in frozen
        assert "net" not in frozen and "fake_score" not in frozen

    def test_pruned_state_drops_teacher_only(self, model_and_state):
        _, model, state = model_and_state
        pruned = model.prune_for_checkpoint(state)
        assert "teacher" not in pruned.params
        assert set(pruned.params) == set(state.params) - model.frozen_net_keys()
        assert set(pruned.opt_states) == set(state.opt_states)  # teacher has no tx
        # original state untouched
        assert "teacher" in state.params

    def test_checkpoint_excludes_teacher_and_restores_it(self, model_and_state,
                                                         tmp_path):
        _, model, state = model_and_state
        ckpt = Checkpointer(str(tmp_path / "ck"), async_save=False)
        stepped, _ = _one_step(model, state)
        ckpt.save(1, model.prune_for_checkpoint(stepped))
        ckpt.wait()

        # on-disk tree has no teacher entry
        raw = ckpt.manager.restore(1)
        assert "teacher" not in raw["state"]["params"]

        # restore into a pruned template, then re-attach the frozen teacher
        restored, _, _ = ckpt.load(model.prune_for_checkpoint(state))
        full = model.restore_frozen(restored, state)
        assert tree_equal(full.params["teacher"], state.params["teacher"])
        assert tree_equal(full.params["net"], stepped.params["net"])
        ckpt.close()

    def test_legacy_full_checkpoint_still_loads(self, model_and_state, tmp_path):
        """Old checkpoints that included the teacher load via the tolerant
        path: extra keys dropped, everything else exact."""
        _, model, state = model_and_state
        ckpt = Checkpointer(str(tmp_path / "legacy"), async_save=False)
        stepped, _ = _one_step(model, state, seed=3)
        ckpt.save(1, stepped)  # full state, the pre-pruning layout
        ckpt.wait()
        restored, _, _ = ckpt.load(model.prune_for_checkpoint(state))
        full = model.restore_frozen(restored, state)
        assert tree_equal(full.params["net"], stepped.params["net"])
        assert tree_equal(full.params["teacher"], state.params["teacher"])
        ckpt.close()

    def test_sft_prune_is_noop(self):
        """Methods with no frozen nets (SFT teacher-run layout) round-trip
        identically through the pruning helpers."""
        import copy

        from fastgen_tpu.configs.data import Synthetic_Loader_Config
        from fastgen_tpu.configs.methods.config_sft import (
            create_config as create_sft_config,
        )
        from fastgen_tpu.configs.net import EDM_Test_Config

        cfg = create_sft_config()
        cfg.model.net = copy.deepcopy(EDM_Test_Config)
        cfg.model.input_shape = [16, 16, 3]
        cfg.dataloader_train = copy.deepcopy(Synthetic_Loader_Config)
        model = instantiate(cfg.model_class, config=cfg.model)
        state = model.init_state(KEY)
        assert model.frozen_net_keys() == frozenset()
        assert model.prune_for_checkpoint(state) is state
        assert model.restore_frozen(state, state) is state


class TestPretrainedWarmStart:
    """trainer.load_pretrained_ckpt equivalent: warm-start nets from another
    run's checkpoint with key remapping (ref ``trainer.py:233-261``)."""

    def test_key_remap_seeds_fake_score(self, model_and_state, tmp_path):
        from fastgen_tpu.trainer import Trainer

        cfg, model, state = model_and_state
        # a "previous run": one student step, saved under tmp
        stepped, _ = _one_step(model, state, seed=11)
        src = Checkpointer(str(tmp_path / "src"), async_save=False)
        src.save(5, model.prune_for_checkpoint(stepped))
        src.wait()
        src.close()

        import copy

        cfg2 = copy.deepcopy(cfg)
        cfg2.trainer.checkpointer.pretrained_ckpt_path = str(tmp_path / "src")
        # remap: this model's fake_score <- checkpoint's net
        cfg2.trainer.checkpointer.pretrained_ckpt_key_map = {
            "fake_score": "net", "ghost": "net", "net": "missing_key"}
        from fastgen_tpu.parallel import mesh as mesh_lib

        # lightweight stand-in with the two attributes the helper reads
        class _T:
            config = cfg2

        _, _T.state_shardings = mesh_lib.shard_state(
            state, mesh_lib.build_mesh(), fsdp=False)
        warm = Trainer._load_pretrained_ckpt(_T(), model, state)
        assert tree_equal(warm.params["fake_score"], stepped.params["net"])
        # unknown model key and missing ckpt key are skipped, not fatal
        assert tree_equal(warm.params["net"], state.params["net"])
