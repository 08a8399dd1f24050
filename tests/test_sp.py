"""Sequence-parallel (sp mesh axis) tests on the 8-virtual-device CPU mesh.

The reference has no sequence/context parallelism (SURVEY.md §5); here it is
pure GSPMD — ``parallel/sp.py`` pins the token axis of video-DiT activations
with sharding constraints — so the invariants are: exact numerical parity
with unsharded execution, no-op behavior without an active sp mesh, and
composition with dp/tp.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from fastgen_tpu.networks.wan.network import WanVideoDiT
from fastgen_tpu.parallel import mesh as mesh_lib
from fastgen_tpu.parallel import sp as sp_lib

KEY = jax.random.PRNGKey(0)


@pytest.fixture(autouse=True)
def _reset_active_mesh():
    yield
    sp_lib.set_active_mesh(None)


@pytest.fixture(scope="module")
def wan_setup():
    net = WanVideoDiT(dim=96, num_layers=2, num_heads=4, ffn_dim=128,
                      in_channels=4, out_channels=4, text_dim=32,
                      rope_max_seq_len=64)
    x = jax.random.normal(KEY, (4, 4, 8, 8, 4))  # 4*16=64 tokens, %4==0
    t = jnp.full((4,), 0.7)
    cond = {"text_embeds": jax.random.normal(KEY, (4, 6, 32))}
    params = net.init({"params": KEY}, x, t, condition=cond)
    return net, params, x, t, cond


def test_shard_seq_noop_without_mesh():
    x = jnp.ones((2, 64, 8))
    assert sp_lib.shard_seq(x) is x
    assert sp_lib.sp_size() == 1


def test_shard_seq_noop_on_sp1_mesh():
    mesh = mesh_lib.build_mesh(dp=2, fsdp=4, sp=1)
    sp_lib.set_active_mesh(mesh)
    x = jnp.ones((2, 64, 8))
    assert sp_lib.shard_seq(x) is x


def test_shard_seq_noop_on_indivisible_tokens():
    mesh = mesh_lib.build_mesh(dp=1, fsdp=2, sp=4)
    sp_lib.set_active_mesh(mesh)
    x = jnp.ones((2, 63, 8))  # 63 % 4 != 0
    assert sp_lib.shard_seq(x) is x


def test_shard_seq_places_tokens():
    mesh = mesh_lib.build_mesh(dp=2, fsdp=1, sp=4)
    sp_lib.set_active_mesh(mesh)
    x = jnp.ones((4, 64, 8))
    y = jax.jit(sp_lib.shard_seq)(x)
    # the compiler normalizes away size-1 axes; check physical placement
    assert y.sharding.shard_shape(y.shape) == (2, 16, 8)
    assert "sp" in tuple(y.sharding.spec)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_sp_forward_parity(wan_setup):
    net, params, x, t, cond = wan_setup
    ref = net.apply(params, x, t, condition=cond)

    mesh = mesh_lib.build_mesh(dp=2, fsdp=1, sp=4)
    sp_lib.set_active_mesh(mesh)
    sparams = jax.device_put(params, mesh_lib.fsdp_param_shardings(params, mesh))
    bs = mesh_lib.batch_sharding(mesh)

    @jax.jit
    def fwd(p, x, t, c):
        return net.apply(p, x, t, condition=c)

    out = fwd(sparams, jax.device_put(x, bs), jax.device_put(t, bs),
              {"text_embeds": jax.device_put(cond["text_embeds"], bs)})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sp_block_causal_forward_parity(wan_setup):
    """Diffusion-forcing (block-causal mask) under sp — the long-video
    training configuration sp exists for."""
    net, params, x, t, cond = wan_setup
    ref = net.apply(params, x, t, condition=cond, causal_chunk_frames=2)

    mesh = mesh_lib.build_mesh(dp=1, fsdp=2, sp=4)
    sp_lib.set_active_mesh(mesh)
    sparams = jax.device_put(
        params, mesh_lib.fsdp_param_shardings(params, mesh, min_size=1024))
    bs = mesh_lib.batch_sharding(mesh)

    @jax.jit
    def fwd(p, x, t, c):
        return net.apply(p, x, t, condition=c, causal_chunk_frames=2)

    out = fwd(sparams, jax.device_put(x, bs), jax.device_put(t, bs),
              {"text_embeds": jax.device_put(cond["text_embeds"], bs)})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sp_grad_parity(wan_setup):
    net, params, x, t, cond = wan_setup

    def loss_fn(p, x, t, c):
        out = net.apply(p, x, t, condition=c, causal_chunk_frames=2)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss_fn)(params, x, t, cond)

    mesh = mesh_lib.build_mesh(dp=2, fsdp=1, sp=4)
    sp_lib.set_active_mesh(mesh)
    sparams = jax.device_put(params, mesh_lib.fsdp_param_shardings(params, mesh))
    bs = mesh_lib.batch_sharding(mesh)
    g_sp = jax.jit(jax.grad(loss_fn))(
        sparams, jax.device_put(x, bs), jax.device_put(t, bs),
        {"text_embeds": jax.device_put(cond["text_embeds"], bs)})

    flat_sp = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, g_sp)))
    checked = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_ref):
        np.testing.assert_allclose(flat_sp[path], np.asarray(leaf),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))
        checked += 1
    assert checked > 20


def test_sp_tp_composition(wan_setup):
    """sp and tp together: heads over tp, tokens over sp, batch over dp."""
    net, params, x, t, cond = wan_setup
    ref = net.apply(params, x, t, condition=cond)

    mesh = mesh_lib.build_mesh(dp=2, fsdp=1, tp=2, sp=2)
    sp_lib.set_active_mesh(mesh)
    sparams = jax.device_put(params, mesh_lib.fsdp_param_shardings(params, mesh))
    bs = mesh_lib.batch_sharding(mesh)

    @jax.jit
    def fwd(p, x, t, c):
        return net.apply(p, x, t, condition=c)

    out = fwd(sparams, jax.device_put(x, bs), jax.device_put(t, bs),
              {"text_embeds": jax.device_put(cond["text_embeds"], bs)})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sp_scan_blocks_parity():
    """sp composes with the scan-over-blocks long-sequence layout."""
    net = WanVideoDiT(dim=96, num_layers=2, num_heads=4, ffn_dim=128,
                      in_channels=4, out_channels=4, text_dim=32,
                      rope_max_seq_len=64, scan_blocks=True, remat=True)
    x = jax.random.normal(KEY, (4, 4, 8, 8, 4))
    t = jnp.full((4,), 0.7)
    cond = {"text_embeds": jax.random.normal(KEY, (4, 6, 32))}
    params = net.init({"params": KEY}, x, t, condition=cond)
    ref = net.apply(params, x, t, condition=cond, causal_chunk_frames=2)

    mesh = mesh_lib.build_mesh(dp=1, fsdp=2, sp=4)
    sp_lib.set_active_mesh(mesh)
    sparams = jax.device_put(
        params, mesh_lib.fsdp_param_shardings(params, mesh, min_size=1024))
    bs = mesh_lib.batch_sharding(mesh)

    @jax.jit
    def fwd(p, x, t, c):
        return net.apply(p, x, t, condition=c, causal_chunk_frames=2)

    out = fwd(sparams, jax.device_put(x, bs), jax.device_put(t, bs),
              {"text_embeds": jax.device_put(cond["text_embeds"], bs)})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
