"""Per-network FSDP-sharding smoke tests on the 8-virtual-device CPU mesh
(ref ``tests/test_network_fsdp.py:693-1026``: every backbone fully_shards and
its sharded forward matches the replicated one).

Each tiny backbone's params are sharded with the GSPMD FSDP rule
(``_fsdp_spec_for``) and the jitted forward must (a) run under the mesh and
(b) match the replicated forward bitwise-close."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.parallel import mesh as mesh_lib
from fastgen_tpu.configs.lazy import instantiate
from fastgen_tpu.configs import net as net_zoo

KEY = jax.random.PRNGKey(0)


def _image_inputs(net, b=8):
    res = getattr(net, "img_resolution", 16)
    ch = getattr(net, "img_channels", 3)
    x = jax.random.normal(KEY, (b, res, res, ch))
    t = jnp.full((b,), 1.0, jnp.float32)
    label_dim = getattr(net, "label_dim", 0)
    if label_dim:
        cond = jax.nn.one_hot(jnp.arange(b) % label_dim, label_dim)
    else:
        cond = {"text_embeds": jax.random.normal(KEY, (b, 4, net.text_dim))}
    return x, t, cond


def _video_inputs(net, b=8):
    x = jax.random.normal(KEY, (b, 4, 8, 8, net.in_channels))
    t = jnp.full((b,), 0.7, jnp.float32)
    cond = {"text_embeds": jax.random.normal(KEY, (b, 4, net.text_dim))}
    return x, t, cond


CASES = {
    "edm": (net_zoo.EDM_Test_Config, _image_inputs),
    "edm2": (net_zoo.EDM2_Test_Config, _image_inputs),
    "dit": (net_zoo.DiT_Test_Config, None),
    "sd15": (net_zoo.SD15_Test_Config, None),
    "wan": (net_zoo.Wan_Test_Config, _video_inputs),
    "causal_wan": (net_zoo.CausalWan_Test_Config, _video_inputs),
    "ltx2": (net_zoo.LTX2_Test_Config, None),
}


def _inputs_for(name, net):
    if name == "dit":
        x = jax.random.normal(KEY, (8, 8, 8, 4))
        t = jnp.full((8,), 0.7, jnp.float32)
        cond = jax.nn.one_hot(jnp.arange(8) % 10, 10)
        return x, t, cond
    if name == "sd15":
        x = jax.random.normal(KEY, (8, 16, 16, 4))
        t = jnp.full((8,), 500.0, jnp.float32)
        cond = {"text_embeds": jax.random.normal(KEY, (8, 4, net.context_dim))}
        return x, t, cond
    if name == "ltx2":
        x = jax.random.normal(KEY, (8, 2, 8, 8, 4))
        t = jnp.full((8,), 0.7, jnp.float32)
        cond = {"text_embeds": jax.random.normal(KEY, (8, 4, net.caption_channels))}
        return x, t, cond
    return CASES[name][1](net)


@pytest.mark.parametrize("name", sorted(CASES))
def test_backbone_fsdp_forward_parity(name):
    import copy

    net = instantiate(copy.deepcopy(CASES[name][0]))
    x, t, cond = _inputs_for(name, net)
    params = net.init({"params": KEY}, x, t, condition=cond)

    fn = jax.jit(lambda p, x_, t_, c: net.apply(p, x_, t_, condition=c))
    ref = np.asarray(fn(params, x, t, cond))

    mesh = mesh_lib.build_mesh(dp=2, fsdp=4)
    shardings = mesh_lib.fsdp_param_shardings(params, mesh, min_size=256)
    params_sh = jax.device_put(params, shardings)
    # at least one leaf actually sharded on the fsdp axis
    from jax.sharding import PartitionSpec as P
    assert any(getattr(l, "sharding", None) is not None
               and l.sharding.spec != P()
               for l in jax.tree_util.tree_leaves(params_sh)), name
    batch = mesh_lib.shard_batch({"x": x, "t": t, "cond": cond}, mesh)
    out = np.asarray(fn(params_sh, batch["x"], batch["t"], batch["cond"]))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def _module_cases():
    """Backbones without tiny zoo configs, built directly (mirrors the rest of
    ref ``test_network_fsdp.py:693-1026``). Returns name -> (net, x, t, cond)
    factories so heavy modules build lazily inside the test."""
    from fastgen_tpu.networks.cogvideox.network import CogVideoX
    from fastgen_tpu.networks.cosmos.network import CosmosPredict2
    from fastgen_tpu.networks.flux.network import Flux
    from fastgen_tpu.networks.wan.network_i2v import WanI2V
    from fastgen_tpu.networks.wan.network_vace import VACEWan

    WAN_KW = dict(dim=96, num_layers=2, num_heads=4, ffn_dim=128,
                  in_channels=4, out_channels=4, text_dim=32,
                  rope_max_seq_len=64)

    def vid(b=8):
        return (jax.random.normal(KEY, (b, 4, 8, 8, 4)),
                jnp.full((b,), 0.7, jnp.float32),
                {"text_embeds": jax.random.normal(KEY, (b, 6, 32))})

    def flux_case():
        net = Flux(dim=128, num_layers=2, num_single_layers=2, num_heads=4,
                   in_channels=4, text_dim=32, pooled_dim=16)
        x = jax.random.normal(KEY, (8, 8, 8, 4))
        t = jnp.full((8,), 0.7, jnp.float32)
        cond = {"text_embeds": jax.random.normal(KEY, (8, 6, 32)),
                "pooled_embeds": jax.random.normal(KEY, (8, 16))}
        return net, x, t, cond

    def cogvideox_case():
        net = CogVideoX(dim=96, num_layers=2, num_heads=6, in_channels=4,
                        text_dim=32, use_rotary=True, sample_frames=4,
                        sample_height=8, sample_width=8)
        x, t, cond = vid()
        return net, x, t, cond

    def cosmos_case():
        net = CosmosPredict2(**WAN_KW)
        x, t, cond = vid()
        cond = dict(cond)
        cond["conditioning_latents"] = jax.random.normal(KEY, (8, 4, 8, 8, 4))
        cond["condition_mask"] = jnp.concatenate(
            [jnp.ones((8, 1, 8, 8, 1)), jnp.zeros((8, 3, 8, 8, 1))], axis=1)
        return net, x, t, cond

    def wani2v_case():
        net = WanI2V(image_embed_dim=16, **WAN_KW)
        x, t, cond = vid()
        cond = dict(cond)
        cond["first_frame_cond"] = jax.random.normal(KEY, (8, 4, 8, 8, 8))
        return net, x, t, cond

    def vace_case():
        net = VACEWan(num_vace_layers=1, **WAN_KW)
        x, t, cond = vid()
        cond = dict(cond)
        cond["vid_context"] = jax.random.normal(KEY, (8, 4, 8, 8, 4))
        return net, x, t, cond

    return {"flux": flux_case, "cogvideox": cogvideox_case,
            "cosmos": cosmos_case, "wani2v": wani2v_case, "vace": vace_case}


@pytest.mark.parametrize("name", sorted(_module_cases()))
def test_module_fsdp_forward_parity(name):
    net, x, t, cond = _module_cases()[name]()
    params = net.init({"params": KEY}, x, t, condition=cond)
    fn = jax.jit(lambda p, x_, t_, c: net.apply(p, x_, t_, condition=c))
    ref = np.asarray(fn(params, x, t, cond))

    mesh = mesh_lib.build_mesh(dp=2, fsdp=4)
    shardings = mesh_lib.fsdp_param_shardings(params, mesh, min_size=256)
    params_sh = jax.device_put(params, shardings)
    from jax.sharding import PartitionSpec as P
    assert any(getattr(l, "sharding", None) is not None
               and l.sharding.spec != P()
               for l in jax.tree_util.tree_leaves(params_sh)), name
    batch = mesh_lib.shard_batch({"x": x, "t": t, "cond": cond}, mesh)
    out = np.asarray(fn(params_sh, batch["x"], batch["t"], batch["cond"]))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_fsdp_gradient_parity():
    """Gradients of a sharded loss match the replicated ones (the invariant
    behind the reference's DDP/FSDP forward-backward equivalence checks,
    ``test_fsdp.py:810-1100``)."""
    import copy

    net = instantiate(copy.deepcopy(net_zoo.EDM_Test_Config))
    x, t, cond = _inputs_for("edm", net)
    params = net.init({"params": KEY}, x, t, condition=cond)

    def loss(p, x_, t_, c):
        return jnp.mean(net.apply(p, x_, t_, condition=c) ** 2)

    gfn = jax.jit(jax.grad(loss))
    g_ref = gfn(params, x, t, cond)

    mesh = mesh_lib.build_mesh(dp=2, fsdp=4)
    shardings = mesh_lib.fsdp_param_shardings(params, mesh, min_size=256)
    params_sh = jax.device_put(params, shardings)
    batch = mesh_lib.shard_batch({"x": x, "t": t, "cond": cond}, mesh)
    g_sh = gfn(params_sh, batch["x"], batch["t"], batch["cond"])
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
