"""Tensor-parallel sharding tests on the 8-virtual-device CPU mesh.

TP is a capability the reference does not have (SURVEY.md §2.4: DDP/FSDP2
only); here it is pure GSPMD — column/row PartitionSpecs from
``fastgen_tpu/parallel/tp.py`` — so the invariant to test is that tp-sharded
execution is numerically identical to single-device execution, and that the
specs actually land on the weights (heads/hidden split, all-reduce inserted
by the compiler rather than by hand)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fastgen_tpu.networks.wan.network import WanVideoDiT
from fastgen_tpu.parallel import mesh as mesh_lib
from fastgen_tpu.parallel.tp import tp_dim_for, tp_rule_for

KEY = jax.random.PRNGKey(0)


def test_tp_rules():
    assert tp_rule_for("['net']['blocks_0']['self_attn']['to_q']['kernel']") == "column"
    assert tp_rule_for("['blocks_0']['ffn']['fc1']['bias']") == "column"
    assert tp_rule_for("['blocks_0']['self_attn']['to_out']['kernel']") == "row"
    assert tp_rule_for("['blocks_3']['qkv_mlp']['kernel']") == "column"
    assert tp_rule_for("['double_0']['img_proj']['kernel']") == "row"
    # no false positives on embedders / unrelated projections
    assert tp_rule_for("['time_proj']['kernel']") is None
    assert tp_rule_for("['crossattn_proj']['kernel']") is None
    assert tp_rule_for("['patch_embed']['projection']['kernel']") is None


def test_tp_dims():
    # Dense kernel [in, out]: column -> out, row -> in
    assert tp_dim_for("['to_q']['kernel']", (96, 96), 4) == 1
    assert tp_dim_for("['to_out']['kernel']", (96, 96), 4) == 0
    # column bias shards, row bias must replicate (added after the all-reduce)
    assert tp_dim_for("['to_q']['bias']", (96,), 4) == 0
    assert tp_dim_for("['to_out']['bias']", (96,), 4) is None
    # non-divisible -> replicate over tp
    assert tp_dim_for("['to_q']['kernel']", (96, 70), 4) is None
    assert tp_dim_for("['to_q']['kernel']", (96, 96), 1) is None


@pytest.fixture(scope="module")
def wan_setup():
    net = WanVideoDiT(dim=96, num_layers=2, num_heads=4, ffn_dim=128,
                      in_channels=4, out_channels=4, text_dim=32,
                      rope_max_seq_len=64)
    x = jax.random.normal(KEY, (8, 4, 8, 8, 4))
    t = jnp.full((8,), 0.7)
    cond = {"text_embeds": jax.random.normal(KEY, (8, 6, 32))}
    params = net.init({"params": KEY}, x, t, condition=cond)
    return net, params, x, t, cond


def _spec_of(sharded_params, *path):
    node = sharded_params
    for k in path:
        node = node[k]
    return node.sharding.spec


def test_tp_param_placement(wan_setup):
    net, params, x, t, cond = wan_setup
    mesh = mesh_lib.build_mesh(dp=2, fsdp=1, tp=4)
    shardings = mesh_lib.fsdp_param_shardings(params, mesh)
    sharded = jax.device_put(params, shardings)
    p = sharded["params"]["blocks_0"]
    assert _spec_of(p, "attn1", "to_q", "kernel") == P(None, "tp")
    assert _spec_of(p, "attn1", "to_out", "kernel") == P("tp", None)
    assert _spec_of(p, "ffn", "fc1", "kernel") == P(None, "tp")
    assert _spec_of(p, "ffn", "fc2", "kernel") == P("tp", None)
    # a column-sharded weight is physically split: per-device shard is 1/4
    kern = p["attn1"]["to_q"]["kernel"]
    db = kern.sharding.shard_shape(kern.shape)
    assert db == (96, 24)


def test_tp_fsdp_composition(wan_setup):
    """With tp and fsdp both >1, weights get 2-D sharding on distinct dims."""
    net, params, x, t, cond = wan_setup
    mesh = mesh_lib.build_mesh(dp=1, fsdp=2, tp=4)
    shardings = mesh_lib.fsdp_param_shardings(params, mesh, min_size=1024)
    sharded = jax.device_put(params, shardings)
    spec = _spec_of(sharded["params"]["blocks_0"], "attn1", "to_q", "kernel")
    assert spec == P("fsdp", "tp")


def test_tp_forward_parity(wan_setup):
    net, params, x, t, cond = wan_setup
    ref = net.apply(params, x, t, condition=cond)

    mesh = mesh_lib.build_mesh(dp=2, fsdp=1, tp=4)
    sharded_params = jax.device_put(
        params, mesh_lib.fsdp_param_shardings(params, mesh))
    bs = mesh_lib.batch_sharding(mesh)
    sx = jax.device_put(x, bs)
    st = jax.device_put(t, bs)
    scond = {"text_embeds": jax.device_put(cond["text_embeds"], bs)}

    @jax.jit
    def fwd(p, x, t, c):
        return net.apply(p, x, t, condition=c)

    out = fwd(sharded_params, sx, st, scond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tp_grad_parity(wan_setup):
    net, params, x, t, cond = wan_setup

    def loss_fn(p, x, t, c):
        out = net.apply(p, x, t, condition=c)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss_fn)(params, x, t, cond)

    mesh = mesh_lib.build_mesh(dp=2, fsdp=1, tp=4)
    shardings = mesh_lib.fsdp_param_shardings(params, mesh)
    sharded_params = jax.device_put(params, shardings)
    bs = mesh_lib.batch_sharding(mesh)
    g_tp = jax.jit(jax.grad(loss_fn))(
        sharded_params, jax.device_put(x, bs), jax.device_put(t, bs),
        {"text_embeds": jax.device_put(cond["text_embeds"], bs)})

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_tp = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, g_tp)))
    checked = 0
    for path, leaf in flat_ref:
        got = flat_tp[path]
        np.testing.assert_allclose(got, np.asarray(leaf), rtol=5e-4, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))
        checked += 1
    assert checked > 20


def test_tp_train_step(wan_setup):
    """An SFT-style optimizer step runs on a (dp=2, tp=4) mesh and keeps the
    tp shardings on the updated params (state_shardings path-awareness)."""
    import optax

    net, params, x, t, cond = wan_setup
    mesh = mesh_lib.build_mesh(dp=2, fsdp=1, tp=4)
    shardings = mesh_lib.fsdp_param_shardings(params, mesh)
    sparams = jax.device_put(params, shardings)
    opt = optax.adam(1e-3)
    opt_state = opt.init(sparams)  # moments inherit the param shardings

    @jax.jit
    def step(p, o, x, t, c):
        def loss_fn(p_):
            return jnp.mean(net.apply(p_, x, t, condition=c) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, o = opt.update(g, o, p)
        return optax.apply_updates(p, updates), o, loss

    bs = mesh_lib.batch_sharding(mesh)
    new_p, opt_state, loss = step(
        sparams, opt_state, jax.device_put(x, bs), jax.device_put(t, bs),
        {"text_embeds": jax.device_put(cond["text_embeds"], bs)})
    assert np.isfinite(float(loss))
    spec = _spec_of(new_p["params"]["blocks_0"], "attn1", "to_q", "kernel")
    assert spec == P(None, "tp")
