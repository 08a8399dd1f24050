"""Pipeline parallelism (parallel/pp.py): GPipe microbatched block stack.

Parity invariant: pipelined execution over a pp mesh axis must equal the
serial scan over the full stack (same math, different schedule), for both
the forward values and the gradients flowing to params and inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastgen_tpu.parallel import mesh as mesh_lib
from fastgen_tpu.parallel.pp import chunk_scan, pipeline_blocks

D = 16
L = 8


def _toy_block(p, x, bias):
    return jnp.tanh(x @ p["w"] + p["b"] + bias)


def _toy_stack(key):
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (L, D, D)) * (0.5 / np.sqrt(D)),
        "b": jax.random.normal(kb, (L, D)) * 0.1,
    }


def _pp_mesh(pp):
    # (dp, fsdp, tp, sp) covers 8 devices; pp pipelines need their own axis,
    # so build a dedicated 1-D mesh here
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:pp])
    return Mesh(devs, ("pp",))


class TestPipelineBlocks:
    @pytest.mark.parametrize("pp,mb", [(2, 4), (4, 4), (8, 2)])
    def test_forward_parity(self, pp, mb):
        params = _toy_stack(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (8, D))
        bias = jnp.linspace(-1, 1, D)
        serial = chunk_scan(_toy_block)(params, x, bias)
        piped = pipeline_blocks(chunk_scan(_toy_block), params, x, bias,
                                mesh=_pp_mesh(pp), num_microbatches=mb)
        np.testing.assert_allclose(np.asarray(piped), np.asarray(serial),
                                   rtol=1e-6, atol=1e-6)

    def test_grad_parity(self):
        params = _toy_stack(jax.random.PRNGKey(2))
        x = jax.random.normal(jax.random.PRNGKey(3), (8, D))
        bias = jnp.zeros((D,))
        mesh = _pp_mesh(4)

        def loss_serial(p, x):
            return jnp.sum(chunk_scan(_toy_block)(p, x, bias) ** 2)

        def loss_piped(p, x):
            return jnp.sum(pipeline_blocks(chunk_scan(_toy_block), p, x, bias,
                                           mesh=mesh, num_microbatches=4) ** 2)

        gs = jax.grad(loss_serial, argnums=(0, 1))(params, x)
        gp = jax.grad(loss_piped, argnums=(0, 1))(params, x)
        for a, b in zip(jax.tree_util.tree_leaves(gs),
                        jax.tree_util.tree_leaves(gp)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-5)

    def test_jit_and_pp1_passthrough(self):
        params = _toy_stack(jax.random.PRNGKey(4))
        x = jax.random.normal(jax.random.PRNGKey(5), (4, D))
        bias = jnp.zeros((D,))
        mesh = _pp_mesh(2)
        f = jax.jit(lambda p, x: pipeline_blocks(
            chunk_scan(_toy_block), p, x, bias, mesh=mesh, num_microbatches=2))
        piped = f(params, x)
        one = pipeline_blocks(chunk_scan(_toy_block), params, x, bias,
                              mesh=_pp_mesh(1), num_microbatches=2)
        np.testing.assert_allclose(np.asarray(piped), np.asarray(one),
                                   rtol=1e-6, atol=1e-6)

    def test_shape_errors(self):
        params = _toy_stack(jax.random.PRNGKey(6))
        mesh = _pp_mesh(2)
        with pytest.raises(AssertionError):  # batch 6 % microbatches 4 != 0
            pipeline_blocks(chunk_scan(_toy_block), params, jnp.zeros((6, D)),
                            jnp.zeros((D,)), mesh=mesh, num_microbatches=4)
        bad = {k: v[:7] for k, v in params.items()}  # 7 layers % pp 2 != 0
        with pytest.raises(AssertionError):
            pipeline_blocks(chunk_scan(_toy_block), bad, jnp.zeros((4, D)),
                            jnp.zeros((D,)), mesh=mesh, num_microbatches=2)

    def test_wan_block_pipeline(self):
        """Pipeline a real WanBlock stack: parity vs the serial scan."""
        from fastgen_tpu.networks.wan.network import (WanBlock, _build_rope,
                                                      _rope_freqs)

        dim, heads, ffn, f, h, w = 24, 2, 48, 2, 2, 2
        n_tok, frame_seqlen = f * h * w, h * w
        block = WanBlock(dim, heads, ffn, qk_norm=True, cross_attn_norm=True,
                         attn_impl="xla")
        x = jax.random.normal(jax.random.PRNGKey(7), (2, n_tok, dim))
        tproj = jax.random.normal(jax.random.PRNGKey(8), (2, f, 6, dim)) * 0.1
        ctx = jax.random.normal(jax.random.PRNGKey(9), (2, 3, dim))
        tables, splits = _rope_freqs(dim // heads, 16)
        cos, sin = _build_rope(tables, splits, f, h, w)

        # stack 4 identical-structure layers with different weights
        layers = [block.init(jax.random.PRNGKey(11 + i), x, tproj, ctx,
                             (cos, sin), frame_seqlen)["params"]
                  for i in range(4)]
        stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layers)

        def one(p, x, tproj, ctx, cos, sin):
            return block.apply({"params": p}, x, tproj, ctx, (cos, sin),
                               frame_seqlen)[0]

        serial = chunk_scan(one)(stacked, x, tproj, ctx, cos, sin)
        # tproj/ctx are per-sample -> microbatched in lockstep via `batched`;
        # the RoPE tables are batch-independent -> broadcast
        piped = pipeline_blocks(chunk_scan(one), stacked, x, cos, sin,
                                batched=(tproj, ctx),
                                mesh=_pp_mesh(2), num_microbatches=2)
        np.testing.assert_allclose(np.asarray(piped), np.asarray(serial),
                                   rtol=2e-5, atol=2e-5)


class TestWanModelPipeline:
    def test_wan_videodit_pp_forward_parity(self):
        """Full WanVideoDiT forward with the pp mesh active == without."""
        from fastgen_tpu.networks.wan.network import WanVideoDiT
        from fastgen_tpu.parallel import pp as pp_lib

        net = WanVideoDiT(dim=24, num_layers=4, num_heads=2, ffn_dim=48,
                          in_channels=4, out_channels=4, text_dim=16,
                          freq_dim=32, rope_max_seq_len=16, scan_blocks=True,
                          attn_impl="xla")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 4, 4, 4))
        t = jnp.full((2,), 0.6)
        cond = {"text_embeds": jax.random.normal(jax.random.PRNGKey(1),
                                                 (2, 3, 16))}
        params = net.init(jax.random.PRNGKey(2), x, t, condition=cond)
        ref = net.apply(params, x, t, condition=cond)
        try:
            pp_lib.set_active_mesh(_pp_mesh(2))
            piped = net.apply(params, x, t, condition=cond)
        finally:
            pp_lib.set_active_mesh(None)
        np.testing.assert_allclose(np.asarray(piped), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_auto_microbatches(self):
        from fastgen_tpu.parallel.pp import auto_microbatches

        assert auto_microbatches(16, 2) == 8
        assert auto_microbatches(6, 2) == 6
        assert auto_microbatches(5, 2) == 5
        assert auto_microbatches(7, 4) == 7
        assert auto_microbatches(1, 8) == 1
        assert auto_microbatches(64, 2) == 8
