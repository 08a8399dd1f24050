"""Remat-policy and scan-grouping parity for WanVideoDiT.

The 32k-token diffusion-forcing train step relies on three layered
mechanisms (see ``WanVideoDiT``): scan-over-blocks with per-segment remat,
the ``save_attn`` checkpoint policy (flash forward runs once per step —
``ops/kernels/flash_attention.py:save_attn_policy``), and ``scan_group``
(g blocks per remat segment, shrinking the carry stack g-fold). Each must
be a pure scheduling change: gradients identical to the unrematted
reference. Ref workload: diffusion-forcing training,
``/root/reference/fastgen/networks/Wan/network_causal.py:131-196``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastgen_tpu.networks.wan.network import WanVideoDiT, stack_block_params

KW = dict(dim=96, num_heads=4, num_layers=4, ffn_dim=192, text_dim=32,
          in_channels=4, out_channels=4, patch_size=(1, 2, 2), freq_dim=32)


@pytest.fixture(scope="module")
def ref():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 3, 8, 8), jnp.float32)
    t = jnp.full((1,), 0.5)
    ctx = jnp.asarray(np.random.RandomState(1).randn(1, 5, 32), jnp.float32)
    net = WanVideoDiT(**KW, remat=False, scan_blocks=False)
    params = net.init(jax.random.PRNGKey(0), x, t, ctx)

    def loss(p):
        return jnp.sum(net.apply(p, x, t, ctx) ** 2)

    g_ref = jax.jit(jax.grad(loss))(params)
    scale = max(float(jnp.max(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g_ref))
    return x, t, ctx, params, g_ref, scale


@pytest.mark.parametrize("scan_group", [1, 2, 4])
@pytest.mark.parametrize("mode", ["ffn", "save_attn", "save_attn_noffn",
                                  "offload_attn"])
def test_scan_remat_grad_parity(ref, scan_group, mode):
    """scan_blocks + remat policy + grouping change scheduling, not math."""
    x, t, ctx, params, g_ref, scale = ref
    net = WanVideoDiT(**KW, remat=True, scan_blocks=True,
                      remat_inner_mode=mode, scan_group=scan_group)

    def loss(p):
        sp = {"params": stack_block_params(p["params"])}
        return jnp.sum(net.apply(sp, x, t, ctx) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g)))
    assert worst < 1e-3 * scale, (
        f"scan_group={scan_group} mode={mode}: grad deviates {worst:.3e} "
        f"from the unrematted reference (scale {scale:.2e})")


@pytest.mark.parametrize("mode", ["save_attn", "offload_attn"])
def test_group_unroll_matches_scan(ref, mode):
    """group_unroll: python loop over checkpointed groups (the named-offload
    escape hatch for the libtpu async-offload-under-scan bug, r4 verdict
    task 2) — identical remat boundaries to the grouped scan, identical
    gradients."""
    x, t, ctx, params, g_ref, scale = ref
    net = WanVideoDiT(**KW, remat=True, scan_blocks=True, group_unroll=True,
                      remat_inner_mode=mode, scan_group=2)

    def loss(p):
        sp = {"params": stack_block_params(p["params"])}
        return jnp.sum(net.apply(sp, x, t, ctx) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g)))
    assert worst < 1e-3 * scale, (
        f"group_unroll mode={mode}: grad deviates {worst:.3e} "
        f"(scale {scale:.2e})")


@pytest.mark.parametrize("mode", ["all", "ffn", "save_attn", "save_attn_noffn",
                                  "offload_attn_noffn"])
def test_pyloop_remat_grad_parity(ref, mode):
    """The python-loop (scan_blocks=False) remat path, all inner modes."""
    x, t, ctx, params, g_ref, scale = ref
    net = WanVideoDiT(**KW, remat=True, scan_blocks=False,
                      remat_inner_mode=mode)

    def loss(p):
        return jnp.sum(net.apply(p, x, t, ctx) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g)))
    assert worst < 1e-3 * scale


def test_bf16_residual_stream_numerics():
    """residual_f32=False (reference torch-autocast numerics): forward within
    bf16 tolerance of the f32-residual path, grads within bf16 noise."""
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 3, 8, 8),
                    jnp.bfloat16)
    t = jnp.full((1,), 0.5)
    ctx = jnp.asarray(np.random.RandomState(1).randn(1, 5, 32), jnp.bfloat16)
    net32 = WanVideoDiT(**KW, residual_f32=True)
    net16 = WanVideoDiT(**KW, residual_f32=False)
    params = net32.init(jax.random.PRNGKey(0), x, t, ctx)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    y32 = net32.apply(params, x, t, ctx).astype(jnp.float32)
    y16 = net16.apply(params, x, t, ctx).astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(y32 - y16)) / (jnp.max(jnp.abs(y32)) + 1e-8))
    assert rel < 0.02, f"bf16 residual forward deviates {rel:.3e}"

    def gradfor(net):
        def f(p):
            return jnp.sum(net.apply(p, x, t, ctx).astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(f))(params)

    g32, g16 = gradfor(net32), gradfor(net16)
    num = sum(float(jnp.sum((a.astype(jnp.float32)
                             - b.astype(jnp.float32)) ** 2))
              for a, b in zip(jax.tree_util.tree_leaves(g32),
                              jax.tree_util.tree_leaves(g16)))
    den = sum(float(jnp.sum(a.astype(jnp.float32) ** 2))
              for a in jax.tree_util.tree_leaves(g32))
    assert (num / (den + 1e-30)) ** 0.5 < 0.02


def test_save_attn_grouped_scan_under_fsdp_mesh():
    """The save_attn + scan_group path must compile and grad correctly under
    a GSPMD (dp, fsdp) mesh — the config the wan_train bench and multichip
    training use (carry stack + saved attention interact with sharding)."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "fsdp"))

    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 3, 8, 8),
                    jnp.float32)
    t = jnp.full((2,), 0.5)
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 5, 32), jnp.float32)
    net = WanVideoDiT(**KW, remat=True, scan_blocks=True,
                      remat_inner_mode="save_attn", scan_group=2)
    ref_net = WanVideoDiT(**KW, remat=False, scan_blocks=False)
    params = ref_net.init(jax.random.PRNGKey(0), x, t, ctx)

    def loss(p, xb):
        sp = {"params": stack_block_params(p["params"])}
        return jnp.sum(net.apply(sp, xb, t, ctx) ** 2)

    g_single = jax.jit(jax.grad(loss))(params, x)

    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        g_sharded = jax.jit(jax.grad(loss))(ps, xs)

    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(
        jax.tree_util.tree_leaves(g_single),
        jax.tree_util.tree_leaves(g_sharded)))
    den = sum(float(jnp.sum(a ** 2))
              for a in jax.tree_util.tree_leaves(g_single))
    assert (num / (den + 1e-30)) ** 0.5 < 1e-5
