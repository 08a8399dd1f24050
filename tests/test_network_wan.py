"""Wan video DiT tests: forward shapes, per-frame t, causal masking, and the
key invariant — KV-cached autoregressive generation exactly matches the
parallel block-causal forward (mirrors the reference's KV-cache equivalence
test, ``tests/test_network.py:935``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastgen_tpu.networks.wan.network import CausalWanVideoDiT, WanVideoDiT

KEY = jax.random.PRNGKey(0)


def nets():
    kwargs = dict(dim=96, num_layers=2, num_heads=4, ffn_dim=128, in_channels=4,
                  out_channels=4, text_dim=32, rope_max_seq_len=64)
    net = WanVideoDiT(**kwargs)
    cnet = CausalWanVideoDiT(chunk_size=2, total_num_frames=4, frame_height=8,
                             frame_width=8, **kwargs)
    return net, cnet


def inputs(b=2):
    x = jax.random.normal(KEY, (b, 4, 8, 8, 4))
    t = jnp.array([0.5, 0.9])[:b]
    cond = {"text_embeds": jax.random.normal(KEY, (b, 6, 32))}
    return x, t, cond


@pytest.fixture(scope="module")
def setup():
    net, cnet = nets()
    x, t, cond = inputs()
    params = net.init({"params": KEY}, x, t, condition=cond)
    cparams = cnet.init({"params": KEY}, x, t, condition=cond)
    return net, cnet, params, cparams


def test_parallel_forward(setup):
    net, _, params, _ = setup
    x, t, cond = inputs()
    out = net.apply(params, x, t, condition=cond)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())
    # per-frame inhomogeneous t
    t_inhom = jnp.tile(jnp.array([[0.9, 0.9, 0.5, 0.5]]), (2, 1))
    out2 = net.apply(params, x, t_inhom, condition=cond)
    assert out2.shape == x.shape


def test_pred_type_and_features(setup):
    net, _, params, _ = setup
    x, t, cond = inputs()
    x0 = net.apply(params, x, t, condition=cond, fwd_pred_type="x0")
    flow = net.apply(params, x, t, condition=cond, fwd_pred_type="flow")
    ns = net.noise_scheduler
    np.testing.assert_allclose(np.asarray(ns.flow_to_x0(x, flow, t)),
                               np.asarray(x0), rtol=1e-4, atol=1e-4)
    feats = net.apply(params, x, t, condition=cond, feature_indices=(0,),
                      return_features_early=True)
    assert feats[0].shape == (2, 4, 4, 4, 96)


def test_skip_layers(setup):
    net, _, params, _ = setup
    x, t, cond = inputs()
    out_full = net.apply(params, x, t, condition=cond)
    out_skip = net.apply(params, x, t, condition=cond, skip_layers=(1,))
    assert not np.allclose(np.asarray(out_full), np.asarray(out_skip))


def test_causal_chunk0_isolation(setup):
    _, cnet, _, cparams = setup
    x, t, cond = inputs()
    t_inhom = jnp.tile(jnp.array([[0.9, 0.9, 0.5, 0.5]]), (2, 1))
    x_mod = x.at[:, 2:].set(jax.random.normal(jax.random.fold_in(KEY, 5),
                                              (2, 2, 8, 8, 4)))
    o_a = cnet.apply(cparams, x, t_inhom, condition=cond, causal=True)
    o_b = cnet.apply(cparams, x_mod, t_inhom, condition=cond, causal=True)
    np.testing.assert_array_equal(np.asarray(o_a[:, :2]), np.asarray(o_b[:, :2]))
    assert not np.allclose(np.asarray(o_a[:, 2:]), np.asarray(o_b[:, 2:]))


def test_ar_cache_matches_parallel(setup):
    """KV-cached AR chunks == parallel block-causal forward."""
    _, cnet, _, cparams = setup
    x, t, cond = inputs()
    t_inhom = jnp.tile(jnp.array([[0.9, 0.9, 0.5, 0.5]]), (2, 1))
    parallel = cnet.apply(cparams, x, t_inhom, condition=cond, causal=True)

    cache = cnet.init_cache(2, dtype=jnp.float32)
    cross_kv = cnet.apply(cparams, cond, method=cnet.precompute_cross_kv)
    outs = []
    for start in range(0, 4, 2):
        o, cache = cnet.apply(cparams, x[:, start:start + 2],
                              t_inhom[:, start:start + 2], cache, start,
                              condition=cond, cross_kv=cross_kv,
                              method=cnet.forward_chunk)
        outs.append(o)
    ar = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(ar), np.asarray(parallel),
                               rtol=1e-4, atol=1e-5)


def test_ar_scan_blocks_matches_parallel(setup):
    """The stacked-param (scan_blocks=True) AR path — nn.scan over blocks,
    stacked KV caches — matches the per-block AR path and the parallel
    block-causal forward on the same weights."""
    from fastgen_tpu.networks.wan.network import stack_block_params

    _, cnet, _, cparams = setup
    x, t, cond = inputs()
    t_inhom = jnp.tile(jnp.array([[0.9, 0.9, 0.5, 0.5]]), (2, 1))
    parallel = cnet.apply(cparams, x, t_inhom, condition=cond, causal=True)

    snet = CausalWanVideoDiT(chunk_size=2, total_num_frames=4, frame_height=8,
                             frame_width=8, scan_blocks=True,
                             dim=96, num_layers=2, num_heads=4, ffn_dim=128,
                             in_channels=4, out_channels=4, text_dim=32,
                             rope_max_seq_len=64)
    sparams = {"params": stack_block_params(cparams["params"])}
    cache = snet.init_cache(2, dtype=jnp.float32)
    assert cache["self"]["k"].shape[0] == 2  # stacked [L] leading axis
    cross_kv = snet.apply(sparams, cond, method=snet.precompute_cross_kv)
    assert cross_kv[0].shape[0] == 2
    outs = []
    for start in range(0, 4, 2):
        o, cache = snet.apply(sparams, x[:, start:start + 2],
                              t_inhom[:, start:start + 2], cache, start,
                              condition=cond, cross_kv=cross_kv,
                              method=snet.forward_chunk)
        outs.append(o)
    ar = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(ar), np.asarray(parallel),
                               rtol=1e-4, atol=1e-5)
    # without precomputed cross-KV (context recomputed per chunk) — the
    # second scan variant
    cache2 = snet.init_cache(2, dtype=jnp.float32)
    o2, _ = snet.apply(sparams, x[:, :2], t_inhom[:, :2], cache2, 0,
                       condition=cond, method=snet.forward_chunk)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(outs[0]),
                               rtol=1e-4, atol=1e-5)


def test_store_kv_false_returns_no_cache(setup):
    """Denoise passes must not echo the cache through jit (a 6 GB copy at
    Wan-1.3B@480p scale) — store_kv=False returns None for the cache slot."""
    _, cnet, _, cparams = setup
    x, t, cond = inputs()
    cache = cnet.init_cache(2, dtype=jnp.float32)
    cross_kv = cnet.apply(cparams, cond, method=cnet.precompute_cross_kv)
    out, cache2 = cnet.apply(cparams, x[:, :2], t[:, None].repeat(2, 1), cache, 0,
                             condition=cond, cross_kv=cross_kv, store_kv=False,
                             method=cnet.forward_chunk)
    assert cache2 is None
    assert np.all(np.isfinite(np.asarray(out)))


def test_rope_offset_changes_output(setup):
    _, cnet, _, cparams = setup
    x, t, cond = inputs()
    cache = cnet.init_cache(2, dtype=jnp.float32)
    cross_kv = cnet.apply(cparams, cond, method=cnet.precompute_cross_kv)
    tt = t[:, None].repeat(2, 1)
    o0, _ = cnet.apply(cparams, x[:, :2], tt, cache, 0, condition=cond,
                       cross_kv=cross_kv, store_kv=False, method=cnet.forward_chunk)
    o2, _ = cnet.apply(cparams, x[:, :2], tt, cache, 2, condition=cond,
                       cross_kv=cross_kv, store_kv=False, method=cnet.forward_chunk)
    # temporal RoPE offset must change attention (different phase rotation)...
    assert not np.allclose(np.asarray(o0), np.asarray(o2), atol=1e-6)


def test_i2v_frame_replacement_variant():
    """Wan2.2 TI2V (concat_mask=False): first latent frame pinned to the
    clean conditioning latent, per-frame t=0 on frame 0
    (ref ``WanI2V/network.py:184-190,297-341``)."""
    from fastgen_tpu.networks.wan.network_i2v import WanI2V

    kwargs = dict(dim=96, num_layers=2, num_heads=4, ffn_dim=128, in_channels=4,
                  out_channels=4, text_dim=32, rope_max_seq_len=64,
                  image_embed_dim=16)
    net = WanI2V(concat_mask=False, **kwargs)
    x, t, cond = inputs()
    ffc = jax.random.normal(jax.random.PRNGKey(3), x[:, :1].shape)
    cond = dict(cond, first_frame_cond=ffc, first_frame_latent=ffc)
    params = net.init({"params": KEY}, x, t, condition=cond)
    out = net.apply(params, x, t, condition=cond, fwd_pred_type="x0")
    assert out.shape == x.shape
    # output frame 0 is the clean conditioning latent
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(ffc[:, 0]),
                               rtol=1e-5, atol=1e-5)
    # preserve_conditioning pins frame 0 as well
    pinned = net.preserve_conditioning(x, cond)
    np.testing.assert_array_equal(np.asarray(pinned[:, 0]), np.asarray(ffc[:, 0]))
    # no mask channels: patch embedding consumes C channels (not C+4+C)
    k = params["params"]["patch_embedding"]["kernel"]
    assert k.shape[-2] == 4


def test_causal_i2v_frame_replacement_chunks():
    """Causal Wan2.2 I2V: only the chunk containing frame 0 is conditioned."""
    from fastgen_tpu.networks.wan.network_i2v import CausalWanI2V

    kwargs = dict(dim=96, num_layers=2, num_heads=4, ffn_dim=128, in_channels=4,
                  out_channels=4, text_dim=32, rope_max_seq_len=64,
                  chunk_size=2, total_num_frames=4, frame_height=8,
                  frame_width=8)
    net = CausalWanI2V(concat_mask=False, **kwargs)
    x, t, cond = inputs()
    ffc = jax.random.normal(jax.random.PRNGKey(3), x[:, :1].shape)
    cond = dict(cond, first_frame_cond=ffc, first_frame_latent=ffc)
    params = net.init({"params": KEY}, x, t, condition=cond)
    cache = net.init_cache(batch_size=2, dtype=jnp.float32)
    chunk = x[:, :2]
    out0, _ = net.apply(params, chunk, t, cache, 0, condition=cond,
                        method=net.forward_chunk)
    out1, _ = net.apply(params, chunk, t, cache, 2, condition=cond,
                        method=net.forward_chunk)
    assert out0.shape == chunk.shape and out1.shape == chunk.shape
    # chunk at start_frame=0 sees the clean first frame -> different output
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_multiscale_discriminator_head():
    from fastgen_tpu.networks.discriminators import Discriminator_VideoDiT

    disc = Discriminator_VideoDiT(feature_indices=(0, 1), num_blocks=2,
                                  inner_dim=16,
                                  disc_type="multiscale_down_mlp_large")
    feats = [jax.random.normal(KEY, (2, 3, 4, 4, 16)) for _ in range(2)]
    params = disc.init({"params": KEY}, feats)
    logits = disc.apply(params, feats)
    assert logits.shape == (2, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_i2v_concat_mask_pred_type_conversion():
    """Regression: fwd_pred_type conversion must run on the noisy-latent
    slice, not the widened concat-mask input (x + 4ch mask + latents)."""
    from fastgen_tpu.networks.wan.network_i2v import WanI2V

    net = WanI2V(dim=96, num_layers=1, num_heads=4, ffn_dim=128, in_channels=4,
                 out_channels=4, text_dim=32, rope_max_seq_len=64,
                 image_embed_dim=16, net_pred_type="flow", schedule_type="rf")
    x, t, cond = inputs(b=1)
    ffc = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 8, 8, 8))
    cond = dict(cond, first_frame_cond=ffc, first_frame_latent=ffc[..., 4:])
    params = net.init({"params": KEY}, x[:1], t[:1], condition=cond)
    for pred in ("x0", "eps", "v", "flow"):
        out = net.apply(params, x[:1], t[:1], condition=cond,
                        fwd_pred_type=pred)
        assert out.shape == x[:1].shape
        assert np.isfinite(np.asarray(out)).all()
    # algebra consistency: flow output converts to the same x0 externally
    ns = net.noise_scheduler
    v = net.apply(params, x[:1], t[:1], condition=cond, fwd_pred_type="flow")
    x0 = net.apply(params, x[:1], t[:1], condition=cond, fwd_pred_type="x0")
    x0_ext = ns.convert_model_output(x[:1], v, t[:1], src_pred_type="flow",
                                     target_pred_type="x0")
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x0_ext), rtol=2e-4,
                               atol=2e-4)


class TestScanBlocks:
    """scan_blocks=True: stacked-param lax.scan over identical blocks — the
    long-sequence training layout (see WanVideoDiT.scan_blocks)."""

    def _pair(self):
        from fastgen_tpu.networks.wan.network import stack_block_params

        kwargs = dict(dim=96, num_layers=2, num_heads=4, ffn_dim=128,
                      in_channels=4, out_channels=4, text_dim=32,
                      rope_max_seq_len=64)
        net = WanVideoDiT(**kwargs)
        net_s = WanVideoDiT(scan_blocks=True, **kwargs)
        x, t, cond = inputs()
        params = net.init({"params": KEY}, x, t, condition=cond)
        stacked = {"params": stack_block_params(params["params"])}
        return net, net_s, params, stacked, (x, t, cond)

    def test_forward_parity_and_roundtrip(self):
        from fastgen_tpu.networks.wan.network import (stack_block_params,
                                                      unstack_block_params)

        net, net_s, params, stacked, (x, t, cond) = self._pair()
        o1 = net.apply(params, x, t, condition=cond)
        o2 = net_s.apply(stacked, x, t, condition=cond)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=2e-5, atol=2e-5)
        # layout round-trip
        rt = unstack_block_params(stacked["params"])
        for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(params["params"]),
                                  jax.tree_util.tree_leaves(rt)):
            np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b))

    def test_remat_grads_match(self):
        """scan+segment-remat backward == python-loop backward."""
        kwargs = dict(dim=96, num_layers=2, num_heads=4, ffn_dim=128,
                      in_channels=4, out_channels=4, text_dim=32,
                      rope_max_seq_len=64)
        from fastgen_tpu.networks.wan.network import stack_block_params

        net = WanVideoDiT(**kwargs)
        net_sr = WanVideoDiT(scan_blocks=True, remat=True, **kwargs)
        x, t, cond = inputs()
        params = net.init({"params": KEY}, x, t, condition=cond)
        stacked = {"params": stack_block_params(params["params"])}

        g1 = jax.grad(lambda p: (net.apply(p, x, t, condition=cond) ** 2
                                 ).sum())(params)
        g2 = jax.grad(lambda p: (net_sr.apply(p, x, t, condition=cond) ** 2
                                 ).sum())(stacked)
        g1s = stack_block_params(g1["params"])
        flat1 = {jax.tree_util.keystr(k): v for k, v
                 in jax.tree_util.tree_leaves_with_path(g1s)}
        flat2 = {jax.tree_util.keystr(k): v for k, v
                 in jax.tree_util.tree_leaves_with_path(g2["params"])}
        assert set(flat1) == set(flat2)
        for k in flat1:
            np.testing.assert_allclose(np.asarray(flat1[k]),
                                       np.asarray(flat2[k]),
                                       rtol=2e-4, atol=2e-4, err_msg=k)

    def test_feature_taps_rejected(self):
        _, net_s, _, stacked, (x, t, cond) = self._pair()
        with pytest.raises(ValueError, match="per-block access"):
            net_s.apply(stacked, x, t, condition=cond, feature_indices=(0,))

    def test_causal_scan_blocks_forward(self):
        """CausalWan training forward (block-causal mask) under scan."""
        from fastgen_tpu.networks.wan.network import stack_block_params

        kwargs = dict(dim=96, num_layers=2, num_heads=4, ffn_dim=128,
                      in_channels=4, out_channels=4, text_dim=32,
                      rope_max_seq_len=64, chunk_size=2, total_num_frames=4,
                      frame_height=8, frame_width=8)
        cnet = CausalWanVideoDiT(**kwargs)
        cnet_s = CausalWanVideoDiT(scan_blocks=True, **kwargs)
        x, t, cond = inputs()
        params = cnet.init({"params": KEY}, x, t, condition=cond)
        stacked = {"params": stack_block_params(params["params"])}
        o1 = cnet.apply(params, x, t, condition=cond, causal=True)
        o2 = cnet_s.apply(stacked, x, t, condition=cond, causal=True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=2e-5, atol=2e-5)
