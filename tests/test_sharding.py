"""Mesh/sharding tests on the 8-virtual-device CPU mesh (the TPU-native
replacement for the reference's spawned-NCCL FSDP test matrix,
``tests/test_fsdp.py:810-1627``: weight sync, sharded-vs-replicated forward
parity, HSDP groups, full-method wrap, sharded checkpoint round-trip)."""


import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fastgen_tpu.configs.experiments.EDM.config_dmd2_test import (
    create_config as create_dmd2_test_config)
from fastgen_tpu.parallel import mesh as mesh_lib
from fastgen_tpu.utils import instantiate

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def model_state():
    config = create_dmd2_test_config()
    config.trainer.callbacks = {}
    model = instantiate(config.model_class, config=config.model)
    model.init_optimizers()
    state = model.init_state(KEY)
    return config, model, state


def make_batch(n=8):
    x = jax.random.normal(KEY, (n, 16, 16, 3))
    cond = jax.nn.one_hot(jnp.arange(n) % 10, 10)
    return {"real": x, "condition": cond, "neg_condition": jnp.zeros_like(cond)}


def test_mesh_building():
    assert len(jax.devices()) == 8
    m = mesh_lib.build_mesh(dp=2, fsdp=4)
    assert dict(m.shape) == {"dp": 2, "fsdp": 4, "tp": 1, "sp": 1}
    m2 = mesh_lib.build_mesh(dp=1, fsdp=-1)
    assert m2.shape["fsdp"] == 8
    with pytest.raises(AssertionError):
        mesh_lib.build_mesh(dp=3, fsdp=-1)  # 8 % 3 != 0


def test_trainer_flag_resolution():
    config = create_dmd2_test_config()
    config.trainer.ddp = True
    m = mesh_lib.mesh_from_trainer_config(config.trainer)
    assert m.shape["dp"] == 8 and m.shape["fsdp"] == 1
    config.trainer.ddp = False
    config.trainer.fsdp = True
    m = mesh_lib.mesh_from_trainer_config(config.trainer)
    assert m.shape["fsdp"] == 8
    config.trainer.fsdp_sharding_group_size = 4  # HSDP
    m = mesh_lib.mesh_from_trainer_config(config.trainer)
    assert m.shape["dp"] == 2 and m.shape["fsdp"] == 4
    # an explicit tp/sp mesh wins over the ddp/fsdp flags (the flags keep
    # controlling param sharding, not geometry)
    config.trainer.mesh.dp = 2
    config.trainer.mesh.fsdp = 2
    config.trainer.mesh.sp = 2
    m = mesh_lib.mesh_from_trainer_config(config.trainer)
    assert dict(m.shape) == {"dp": 2, "fsdp": 2, "tp": 1, "sp": 2}
    config.trainer.mesh.sp = 1
    config.trainer.mesh.tp = 2
    m = mesh_lib.mesh_from_trainer_config(config.trainer)
    assert dict(m.shape) == {"dp": 2, "fsdp": 2, "tp": 2, "sp": 1}


def test_fsdp_spec_rule():
    spec = mesh_lib._fsdp_spec_for((256, 512), 8)
    assert spec == P(None, "fsdp")
    spec = mesh_lib._fsdp_spec_for((3, 3, 16, 64), 8, min_size=1)
    assert spec == P(None, None, None, "fsdp")
    # too small -> replicate
    assert mesh_lib._fsdp_spec_for((10,), 8) == P()
    # indivisible -> replicate
    assert mesh_lib._fsdp_spec_for((30001, 7), 8, min_size=1) == P()


@pytest.mark.parametrize("fsdp", [False, True])
def test_sharded_step_matches_single_device(model_state, fsdp):
    """DDP/FSDP-sharded train step == single-device step (weight-sync +
    forward-parity equivalent of the reference FSDP tests)."""
    config, model, state0 = model_state
    batch = make_batch()
    step = model.make_train_step("critic")

    # single device baseline
    single = jax.jit(step)(state0, batch, KEY)
    base_loss = float(single[1]["total_loss"])

    mesh = mesh_lib.build_mesh(dp=2, fsdp=4)
    state = jax.tree_util.tree_map(jnp.copy, state0)
    state, shardings = mesh_lib.shard_state(state, mesh, fsdp=fsdp)
    sharded_batch = mesh_lib.shard_batch(batch, mesh)
    out = jax.jit(step, donate_argnums=0)(state, sharded_batch, KEY)
    shard_loss = float(out[1]["total_loss"])
    assert abs(shard_loss - base_loss) / max(abs(base_loss), 1e-6) < 1e-4

    # updated params match too
    for a, b in zip(jax.tree_util.tree_leaves(single[0].params["fake_score"]),
                    jax.tree_util.tree_leaves(out[0].params["fake_score"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_fsdp_actually_shards(model_state):
    config, model, state0 = model_state
    mesh = mesh_lib.build_mesh(dp=1, fsdp=8)
    state = jax.tree_util.tree_map(jnp.copy, state0)
    state, shardings = mesh_lib.shard_state(state, mesh, fsdp=True)
    sharded_leaves = [l for l in jax.tree_util.tree_leaves(state.params["net"])
                      if hasattr(l, "sharding") and
                      l.sharding.spec != P()]
    assert sharded_leaves, "no parameter was sharded on the fsdp axis"
    # a sharded leaf's addressable shard is 1/8 of the global rows
    leaf = max(sharded_leaves, key=lambda l: l.size)
    shard_size = leaf.addressable_shards[0].data.size
    assert shard_size == leaf.size // 8


def test_checkpoint_roundtrip_across_topologies(model_state, tmp_path):
    """Save sharded on a (2,4) mesh, restore on (1,8) (DCP resharding
    equivalent, ref ``test_checkpointing.py:649-927``)."""
    from fastgen_tpu.utils.checkpointer import Checkpointer

    config, model, state0 = model_state
    mesh_a = mesh_lib.build_mesh(dp=2, fsdp=4)
    state_a, _ = mesh_lib.shard_state(jax.tree_util.tree_map(jnp.copy, state0),
                                      mesh_a, fsdp=True)
    ckpt = Checkpointer(str(tmp_path / "ckpt"), async_save=False)
    ckpt.save(1, state_a)
    ckpt.wait()

    mesh_b = mesh_lib.build_mesh(dp=1, fsdp=8)
    template, _ = mesh_lib.shard_state(jax.tree_util.tree_map(jnp.copy, state0),
                                       mesh_b, fsdp=True)
    restored, _, step = ckpt.load(template)
    assert step == 1
    for a, b in zip(jax.tree_util.tree_leaves(state0.params["net"]),
                    jax.tree_util.tree_leaves(restored.params["net"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_hsdp_replicates_within_dp_groups(model_state):
    """HSDP: params shard over the fsdp axis only — every dp replica holds an
    identical 1/fsdp shard (ref 2-D replicate x shard device mesh,
    ``utils/distributed/fsdp.py:104-113``)."""
    config, model, state0 = model_state
    mesh = mesh_lib.build_mesh(dp=2, fsdp=4)
    state = jax.tree_util.tree_map(jnp.copy, state0)
    state, _ = mesh_lib.shard_state(state, mesh, fsdp=True)
    leaves = [l for l in jax.tree_util.tree_leaves(state.params["net"])
              if hasattr(l, "sharding") and l.sharding.spec != P()]
    assert leaves
    leaf = max(leaves, key=lambda l: l.size)
    # sharded over 4, replicated over 2 -> 8 addressable shards of size/4
    assert leaf.addressable_shards[0].data.size == leaf.size // 4
    by_data = {}
    for sh in leaf.addressable_shards:
        by_data.setdefault(sh.index, []).append(np.asarray(sh.data))
    for idx, datas in by_data.items():
        assert len(datas) == 2  # one per dp replica
        np.testing.assert_array_equal(datas[0], datas[1])


def test_student_phase_sharded_parity(model_state):
    """The DMD2 student phase (VSD + GAN-gen losses, EMA lerp in-step) also
    matches single-device under the (2,4) mesh — including the EMA tree."""
    config, model, state0 = model_state
    batch = make_batch()
    step = model.make_train_step("student")

    single = jax.jit(step)(state0, batch, KEY)
    base_loss = float(single[1]["total_loss"])

    mesh = mesh_lib.build_mesh(dp=2, fsdp=4)
    state = jax.tree_util.tree_map(jnp.copy, state0)
    state, _ = mesh_lib.shard_state(state, mesh, fsdp=True)
    out = jax.jit(step, donate_argnums=0)(state, mesh_lib.shard_batch(batch, mesh),
                                          KEY)
    assert abs(float(out[1]["total_loss"]) - base_loss) / max(abs(base_loss),
                                                              1e-6) < 1e-4
    # the sharded in-step EMA lerp (the reference gathers full tensors per
    # step instead, ``callbacks/ema.py:119-130``) must produce the same EMA
    ema_a = jax.tree_util.tree_leaves(single[0].ema)
    ema_b = jax.tree_util.tree_leaves(out[0].ema)
    assert ema_a and len(ema_a) == len(ema_b)
    for a, b in zip(ema_a, ema_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_generator_fn_sharded_parity(model_state):
    """Few-step sampling under the mesh == single-device sampling (the
    validation/FID path, ref ``test_fsdp.py`` forward-parity tier)."""
    config, model, state0 = model_state
    noise = jax.random.normal(KEY, (8, 16, 16, 3))
    cond = jax.nn.one_hot(jnp.arange(8) % 10, 10)
    base = model.generator_fn(state0.params["net"], noise, rng=KEY,
                              condition=cond)

    mesh = mesh_lib.build_mesh(dp=2, fsdp=4)
    state = jax.tree_util.tree_map(jnp.copy, state0)
    state, _ = mesh_lib.shard_state(state, mesh, fsdp=True)
    out = model.generator_fn(state.params["net"],
                             mesh_lib.shard_batch({"x": noise}, mesh)["x"],
                             rng=KEY,
                             condition=mesh_lib.shard_batch({"c": cond}, mesh)["c"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=2e-4,
                               atol=2e-4)
