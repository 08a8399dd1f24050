"""Wan-style video diffusion transformer, native JAX (NTHWC latents).

TPU-native rebuild of ``fastgen/networks/Wan/network.py`` +
``network_causal.py``. The reference wraps diffusers' WanTransformer3DModel and
monkey-patches its forward; here the backbone is built from scratch:

* 3D patchify (p_t, p_h, p_w) -> tokens; 3D RoPE with head_dim split across
  (t, h, w) (ref ``network_causal.py:79-128``), temporal offset for
  autoregressive decoding;
* blocks: RMS-qk-norm self-attention + text cross-attention + FFN with
  per-block ``scale_shift_table`` AdaLN 6-way modulation, per-frame timestep
  conditioning (ref ``block_forward``, ``Wan/network.py:106-153``);
* diffusion-forcing training uses the Pallas flash kernel's analytic
  block-causal mask instead of FlexAttention BlockMask
  (ref ``network_causal.py:131-196``);
* autoregressive generation uses explicit fixed-shape KV-cache pytrees
  ``[B, max_tokens, H, Dh]`` + ``lax.dynamic_update_slice`` and a validity
  mask — the reference already pre-allocates caches this way
  (``network_causal.py:703-816``), so the functional mapping is direct;
* text conditioning consumes precomputed embeddings (the latent-loader path);
  a UMT5 encoder port is gated behind the preprocessors API.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.network import CausalFastGenNetwork, FastGenNetwork
from fastgen_tpu.ops.attention import dot_product_attention
from fastgen_tpu.ops.schedules import NET_PRED_TYPES
from fastgen_tpu.parallel.sp import shard_seq


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x):
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        if self.elementwise_affine:
            scale = self.param("scale", nn.initializers.ones, (self.dim,))
            y = y * scale
        return y.astype(x.dtype)


def sinusoidal_embedding_1d(dim: int, position):
    """Wan's sinusoidal t embedding (ref ``Wan/network.py:96-104``)."""
    half = dim // 2
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = jnp.outer(position.astype(jnp.float32), freqs)
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1)


def _rope_freqs(head_dim: int, max_seq_len: int, theta: float = 10000.0):
    """Per-axis RoPE tables; head_dim split (t: d-2*(d//3), h: d//3, w: d//3)."""
    d_t = head_dim - 2 * (head_dim // 3)
    d_h = d_w = head_dim // 3
    assert d_t % 2 == 0 and d_h % 2 == 0, (
        f"head_dim {head_dim} must split into even RoPE parts (e.g. 128->44/42/42); "
        f"got t={d_t}, h/w={d_h}")
    tables = {}
    for name, d in (("t", d_t), ("h", d_h), ("w", d_w)):
        freqs = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        angles = np.outer(np.arange(max_seq_len), freqs)  # [S, d/2]
        tables[name] = (np.cos(angles), np.sin(angles))
    return tables, (d_t, d_h, d_w)


def _build_rope(tables, splits, f, h, w, start_frame: int = 0):
    """[N, head_dim/2] cos/sin for an (f, h, w) token grid with temporal offset."""
    cos_list, sin_list = [], []
    (d_t, d_h, d_w) = splits
    for name, size, d, axis in (("t", f, d_t, 0), ("h", h, d_h, 1), ("w", w, d_w, 2)):
        cos_tab, sin_tab = tables[name]
        if name == "t":
            idx = np.clip(np.arange(start_frame, start_frame + size), 0,
                          cos_tab.shape[0] - 1)
        else:
            idx = np.arange(size)
        cos = cos_tab[idx]  # [size, d/2]
        sin = sin_tab[idx]
        shape = [1, 1, 1, cos.shape[-1]]
        shape[axis] = size
        reps = [f, h, w, 1]
        reps[axis] = 1
        cos_list.append(np.tile(cos.reshape(shape), reps))
        sin_list.append(np.tile(sin.reshape(shape), reps))
    cos = np.concatenate(cos_list, axis=-1).reshape(f * h * w, -1)
    sin = np.concatenate(sin_list, axis=-1).reshape(f * h * w, -1)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def apply_rope(x, cos, sin):
    """x: [B, N, H, D]; cos/sin: [N, D/2]. Interleaved complex rotation."""
    b, n, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, n, h, d // 2, 2)
    x_re, x_im = xf[..., 0], xf[..., 1]
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    out_re = x_re * cos - x_im * sin
    out_im = x_re * sin + x_im * cos
    out = jnp.stack([out_re, out_im], axis=-1).reshape(b, n, h, d)
    return out.astype(x.dtype)


class WanSelfAttention(nn.Module):
    dim: int
    num_heads: int
    qk_norm: bool = True
    attn_impl: Optional[str] = None

    def setup(self):
        self.to_q = nn.Dense(self.dim, name="to_q")
        self.to_k = nn.Dense(self.dim, name="to_k")
        self.to_v = nn.Dense(self.dim, name="to_v")
        self.to_out = nn.Dense(self.dim, name="to_out")
        if self.qk_norm:
            self.norm_q = RMSNorm(self.dim, name="norm_q")
            self.norm_k = RMSNorm(self.dim, name="norm_k")

    def qkv(self, x):
        q, k, v = self.to_q(x), self.to_k(x), self.to_v(x)
        if self.qk_norm:
            q, k = self.norm_q(q), self.norm_k(k)
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        shape = (b, n, self.num_heads, head_dim)
        return q.reshape(shape), k.reshape(shape), v.reshape(shape)

    def __call__(self, x, rope=None, causal_block=None):
        q, k, v = self.qkv(x)
        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        # remat_name: lets the "save_attn" block-remat policy save this
        # attention's (out, lse) so its forward kernel never re-runs in the
        # backward recompute (ops/kernels/flash_attention.py save_attn_policy)
        out = dot_product_attention(q, k, v, impl=self.attn_impl,
                                    causal_block=causal_block,
                                    remat_name="wan_self_attn")
        b, n, h, d = out.shape
        return self.to_out(out.reshape(b, n, h * d))

    def cached(self, x, rope, cache, start_token, store_kv: bool = True):
        """Autoregressive step: attend over the cached prefix plus this chunk's
        own K/V; write them into the fixed-shape cache iff ``store_kv``
        (the reference denoises with store_kv=False and writes the finalized
        block in a separate pass, ``self_forcing.py:212-235``)."""
        q, k, v = self.qkv(x)
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        new_k = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype),
                                             (0, start_token, 0, 0))
        new_v = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype),
                                             (0, start_token, 0, 0))
        n_chunk = x.shape[1]
        valid_len = start_token + n_chunk
        impl = self.attn_impl or os.environ.get("FASTGEN_ATTN_IMPL", "auto")
        if impl != "xla" and jax.default_backend() == "tpu":
            # flash decode kernel: no [Nq, Nkv] logits materialization
            # (6.9 GB at 21f 480p with the masked-dense path)
            from fastgen_tpu.ops.kernels.flash_attention import flash_decode_attention

            out = flash_decode_attention(q, new_k.astype(q.dtype),
                                         new_v.astype(q.dtype), valid_len)
        else:
            max_tokens = cache["k"].shape[1]
            mask = jnp.arange(max_tokens)[None, None, None, :] < valid_len
            out = dot_product_attention(q, new_k.astype(q.dtype),
                                        new_v.astype(q.dtype), mask=mask, impl="xla")
        b, n, h, d = out.shape
        out = self.to_out(out.reshape(b, n, h * d))
        if store_kv:
            return out, {"k": new_k, "v": new_v}
        return out, cache


class WanCrossAttention(nn.Module):
    dim: int
    num_heads: int
    qk_norm: bool = True
    attn_impl: Optional[str] = None

    def setup(self):
        self.to_q = nn.Dense(self.dim, name="to_q")
        self.to_k = nn.Dense(self.dim, name="to_k")
        self.to_v = nn.Dense(self.dim, name="to_v")
        self.to_out = nn.Dense(self.dim, name="to_out")
        if self.qk_norm:
            self.norm_q = RMSNorm(self.dim, name="norm_q")
            self.norm_k = RMSNorm(self.dim, name="norm_k")

    def kv(self, context):
        k, v = self.to_k(context), self.to_v(context)
        if self.qk_norm:
            k = self.norm_k(k)
        b, l, _ = context.shape
        head_dim = self.dim // self.num_heads
        return (k.reshape(b, l, self.num_heads, head_dim),
                v.reshape(b, l, self.num_heads, head_dim))

    def __call__(self, x, context=None, cached_kv=None):
        q = self.to_q(x)
        if self.qk_norm:
            q = self.norm_q(q)
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        q = q.reshape(b, n, self.num_heads, head_dim)
        k, v = cached_kv if cached_kv is not None else self.kv(context)
        out = dot_product_attention(q, k.astype(q.dtype), v.astype(q.dtype),
                                    impl=self.attn_impl)
        return self.to_out(out.reshape(b, n, self.dim))


class WanFFN(nn.Module):
    dim: int
    ffn_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.ffn_dim, name="fc1")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.dim, name="fc2")(h)


class WanBlock(nn.Module):
    """One transformer block (ref ``block_forward``, ``Wan/network.py:106-153``)."""

    dim: int
    num_heads: int
    ffn_dim: int
    qk_norm: bool = True
    cross_attn_norm: bool = True
    attn_impl: Optional[str] = None
    # segment-level rematerialization: checkpoint only the three residual-
    # stream boundaries inside the block so a block-level remat backward
    # holds max(one segment's internals) instead of ALL of them at once —
    # the forward recompute's intermediates are consumed in reverse order by
    # the backward, so without this every [N, ffn_dim]/f32 [N, D] buffer of
    # the block co-lives (~6 GB at 32,760 tokens vs ~3 GB with segments)
    remat_inner: bool = False
    # which segments get the inner remat when remat_inner is set:
    #   "all" — self-attn, cross-attn, and FFN (minimum memory; flash
    #           attention forward runs 3x per step: primal + outer block
    #           recompute + segment recompute)
    #   "ffn" — only the FFN segment (the [N, ffn_dim] memory hog); the
    #           attention segments are covered by the outer block remat
    #           alone, so flash forward runs 2x instead of 3x (~1 GB more
    #           backward workspace, measurably higher train MFU)
    #   "save_attn" — "ffn" segments here, plus the OUTER block remat saves
    #           the self-attention (out, lse) by name (WanVideoDiT wires the
    #           save_attn_policy): flash forward runs exactly 1x per step —
    #           ~100 MB bf16 saved per block at 32,760 tokens
    #   "save_attn_noffn" — "save_attn" without the inner FFN segment remat:
    #           the FFN forward runs 2x per step (primal + outer block
    #           recompute) instead of 3x, trading ~1.2 GB of transient
    #           backward workspace (the [N, ffn_dim] gelu interiors of one
    #           block) for ~6% fewer executed FLOPs.
    #           DEAD UNDER scan_blocks: with the grouped-scan double
    #           checkpoint, XLA CSEs the inner FFN remat (prevent_cse=False)
    #           so both modes compile to the same executed FLOPs — verified
    #           by compiled cost_analysis on the toy CausalWan (6.506e7
    #           flops for BOTH, vs 7.122e7 for "ffn"; r4 sweep timings were
    #           bit-identical for the same reason). The distinction is only
    #           live on the python-loop (scan_blocks=False) path.
    #   "offload_attn" — "save_attn" but the saved (out, lse) live in pinned
    #           host memory instead of HBM (the ~2.8 GB 30-block stack does
    #           not fit a 16 GB v5e next to params+grads; the 94 MB/block
    #           PCIe transfers hide under ~200 ms of block compute)
    #   "offload_attn_noffn" — offload_attn + the save_attn_noffn FFN
    #           schedule (FFN fwd 2x instead of 3x), spending the HBM the
    #           offload frees on the FFN backward workspace
    remat_inner_mode: str = "all"
    # keep the residual stream in f32 (default) or the input dtype. bf16
    # residuals match the reference's torch-autocast training numerics and
    # halve the HBM traffic of every norm/modulation/residual-add fusion
    # (the [N, D] stream is 201 MB f32 vs 100 MB bf16 at 32,760 tokens);
    # norm statistics and the gated adds still accumulate in f32 inside the
    # fusions (LayerNorm dtype=f32, gate multiply promotes), only what
    # crosses fusion/kernel boundaries narrows.
    residual_f32: bool = True

    def setup(self):
        # dtype=f32: norm statistics always compute in f32 even when the
        # residual stream is bf16 (residual_f32=False); no-op on f32 streams
        self.norm1 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                                  dtype=jnp.float32, name="norm1")
        self.attn1 = WanSelfAttention(self.dim, self.num_heads, self.qk_norm,
                                      self.attn_impl, name="attn1")
        self.norm2 = (nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                   name="norm2")
                      if self.cross_attn_norm else
                      nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                                   dtype=jnp.float32, name="norm2"))
        self.attn2 = WanCrossAttention(self.dim, self.num_heads, self.qk_norm,
                                       self.attn_impl, name="attn2")
        self.norm3 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                                  dtype=jnp.float32, name="norm3")
        self.ffn = WanFFN(self.dim, self.ffn_dim, name="ffn")
        self.scale_shift_table = self.param(
            "scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / shape[-1] ** 0.5,
            (1, 6, self.dim))

    def _mod_params(self, temb):
        """temb: [B, F, 6, D] -> 6 per-frame params [B, F, D] (fp32).

        Applied by broadcasting over each frame's tokens — NEVER expanded to
        [B, N, D]: at 21x1560 tokens that materialization is 1.1 GB fp32 per
        block and OOMs a v5e."""
        table = self.scale_shift_table[:, None]  # [1, 1, 6, D]
        params = table + temb.astype(jnp.float32)  # [B, F, 6, D]
        return [params[:, :, i, :] for i in range(6)]

    @staticmethod
    def _mod(x_tokens, scale, shift):
        """x [B, N, D] fp32; scale/shift [B, F, D] broadcast per frame."""
        b, n, d = x_tokens.shape
        f = scale.shape[1]
        xv = x_tokens.reshape(b, f, n // f, d)
        out = xv * (1 + scale[:, :, None]) + shift[:, :, None]
        return out.reshape(b, n, d)

    @staticmethod
    def _gate(x_tokens, gate):
        b, n, d = x_tokens.shape
        f = gate.shape[1]
        xv = x_tokens.reshape(b, f, n // f, d)
        return (xv * gate[:, :, None]).reshape(b, n, d)

    def __call__(self, x, temb, context, rope, frame_seqlen, causal_block=None,
                 self_cache=None, start_token=None, cross_kv=None,
                 store_kv: bool = True):
        (shift_msa, scale_msa, gate_msa,
         c_shift, c_scale, c_gate) = self._mod_params(temb)
        # residual-stream dtype: what crosses fusion/kernel boundaries.
        # The gated adds below still accumulate in f32 either way (the f32
        # gate promotes the add), and norm stats are f32 via LayerNorm dtype.
        rdt = jnp.float32 if self.residual_f32 else x.dtype

        def seg_self(mdl, x_):
            xf = x_.astype(rdt)
            norm_x = mdl._mod(mdl.norm1(xf), scale_msa, shift_msa).astype(x_.dtype)
            attn_out = mdl.attn1(norm_x, rope=rope, causal_block=causal_block)
            return (xf + mdl._gate(attn_out.astype(jnp.float32),
                                   gate_msa)).astype(x_.dtype)

        def seg_cross(mdl, x_):
            norm_x = mdl.norm2(x_).astype(x_.dtype)
            return x_ + mdl.attn2(norm_x, context=context, cached_kv=cross_kv)

        def seg_ffn(mdl, x_):
            xf = x_.astype(rdt)
            norm_x = mdl._mod(mdl.norm3(xf), c_scale, c_shift).astype(x_.dtype)
            ff = mdl.ffn(norm_x)
            return (xf + mdl._gate(ff.astype(jnp.float32),
                                   c_gate)).astype(x_.dtype)

        if self_cache is not None:
            xf = x.astype(rdt)
            norm_x = self._mod(self.norm1(xf), scale_msa, shift_msa).astype(x.dtype)
            attn_out, new_cache = self.attn1.cached(norm_x, rope, self_cache,
                                                    start_token, store_kv=store_kv)
            x = (xf + self._gate(attn_out.astype(jnp.float32),
                                 gate_msa)).astype(x.dtype)
        elif self.remat_inner and self.remat_inner_mode == "all":
            x = nn.remat(seg_self, prevent_cse=False)(self, x)
            new_cache = None
        else:
            x = seg_self(self, x)
            new_cache = None

        if self.remat_inner and self_cache is None:
            if self.remat_inner_mode == "all":
                x = nn.remat(seg_cross, prevent_cse=False)(self, x)
            else:
                x = seg_cross(self, x)
            if self.remat_inner_mode in ("save_attn_noffn",
                                         "offload_attn_noffn"):
                x = seg_ffn(self, x)
            else:
                x = nn.remat(seg_ffn, prevent_cse=False)(self, x)
        else:
            x = seg_cross(self, x)
            x = seg_ffn(self, x)
        return x, new_cache


class TimestepEmbedder(nn.Module):
    """sinusoidal(freq_dim) -> MLP -> temb [.., D]; time_proj -> [.., 6, D]."""

    dim: int
    freq_dim: int = 256

    def setup(self):
        self.time_embedder_0 = nn.Dense(self.dim, name="time_embedder_0")
        self.time_embedder_2 = nn.Dense(self.dim, name="time_embedder_2")
        self.time_proj = nn.Dense(self.dim * 6, name="time_proj")

    def __call__(self, t_flat):
        feats = sinusoidal_embedding_1d(self.freq_dim, t_flat)
        temb = self.time_embedder_2(nn.silu(self.time_embedder_0(feats)))
        proj = self.time_proj(nn.silu(temb)).reshape(temb.shape[:-1] + (6, self.dim))
        return temb, proj


class WanVideoDiT(FastGenNetwork):
    """Parallel (bidirectional) Wan video DiT (ref ``Wan/network.py:542-918``).

    Input latents [B, T, H, W, C]; condition is a dict with ``text_embeds``
    [B, L, text_dim] (+ optional ``first_frame_cond``/``vid_context`` handled
    by subclasses).
    """

    dim: int = 1536
    num_layers: int = 30
    num_heads: int = 12
    ffn_dim: int = 8960
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    qk_norm: bool = True
    cross_attn_norm: bool = True
    rope_max_seq_len: int = 1024
    enable_logvar_linear: bool = False
    r_timestep: bool = False
    time_cond_type: str = "abs"
    attn_impl: Optional[str] = None
    remat: bool = False
    # see WanBlock.remat_inner_mode ("all" = min memory, "ffn" = min
    # attention recompute)
    remat_inner_mode: str = "all"
    # blocks per remat segment under scan_blocks: the outer remat saves ONE
    # carry per segment, so group g shrinks the [L, B, N, D] carry stack by
    # g at the cost of re-running g blocks per segment backward (same total
    # recompute FLOPs, slightly more live workspace). Stored param layout is
    # unchanged ([L, ...]); grouping reshapes to [L/g, g, ...] on the fly.
    # Main use: scan_group=2 frees the ~1.4 GB that lets "save_attn" fit a
    # 16 GB v5e next to params+grads at 32,760 tokens.
    scan_group: int = 1
    # see WanBlock.residual_f32 (bf16 residual stream = reference autocast
    # numerics, half the boundary-crossing HBM traffic)
    residual_f32: bool = True
    # stacked-parameter lax.scan over the 30 identical blocks: the TPU-native
    # layout for long-sequence training — XLA compiles ONE block and the
    # scan loop hard-serializes per-block backward recomputation, bounding
    # activation workspace to saved-inputs + one block (the python loop's
    # latency-hiding scheduler overlaps ~12 blocks' remat workspace and OOMs
    # a 16G v5e at 32,760 tokens). Param layout: params['blocks'] leaves get
    # a leading [num_layers] axis (use stack_block_params to convert).
    # Feature taps / skip_layers / KV-cache paths need per-block access and
    # require scan_blocks=False.
    scan_blocks: bool = False
    # with scan_group > 1: unroll the outer group loop in python instead of
    # lax.scan — same remat boundaries, but named-offload policies compile
    # (the libtpu async-offload-under-scan bug only triggers inside scan
    # bodies; see _remat_policy). Trades L/g x group-HLO compile time.
    group_unroll: bool = False
    net_pred_type: str = "flow"
    schedule_type: str = "rf"

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    def _remat_policy(self):
        """Checkpoint policy for the per-block remat (scan body / py-loop).

        ``remat_inner_mode="save_attn"``: save each block's self-attention
        (out, lse) across the remat boundary so the backward recompute skips
        the flash forward — the biggest single FLOP sink of the 32k-token
        diffusion-forcing step (block-causal attention is ~60% of per-layer
        forward FLOPs at 21f@480p). Costs ~100 MB bf16 per block.

        ``"offload_attn"``: same, but the saved values are staged to pinned
        host memory — the 30-block save stack is ~2.8 GB, which does not fit
        a 16 GB v5e next to params+grads+the carry stack; PCIe traffic is
        94 MB/block each way, hidden under the block's ~200 ms of compute."""
        if self.remat_inner_mode in ("save_attn", "save_attn_noffn"):
            from fastgen_tpu.ops.kernels.flash_attention import save_attn_policy

            return save_attn_policy("wan_self_attn")
        if self.remat_inner_mode in ("offload_attn", "offload_attn_noffn"):
            # offload only the bf16 attention outputs; the f32 lse stays on
            # device (47 MB total). NOTE: the current TPU toolchain (libtpu
            # 2026.x via the axon AOT compiler) rejects BOTH variants under
            # lax.scan at post-optimization — "async-start expects the shape
            # of operand 0 to match the async shape ... {T(8,128)} vs
            # {T(8,128)S(5)}" — i.e. named-offload remat inside a scan body
            # cannot currently compile for this target (measured 2026-08-21,
            # quality/wan_train_sweep.jsonl). The modes stay: they are
            # grad-parity-tested on CPU (tests/test_wan_remat.py) and the
            # blocker is the compiler, not the program.
            return jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=["wan_self_attn_lse"],
                names_which_can_be_offloaded=["wan_self_attn_out"],
                offload_src="device", offload_dst="pinned_host")
        return None

    def setup(self):
        self.patch_embedding = nn.Conv(
            self.dim, self.patch_size, strides=self.patch_size, padding="VALID",
            name="patch_embedding")
        self.condition_embedder = TimestepEmbedder(self.dim, self.freq_dim,
                                                   name="condition_embedder")
        self.r_embedder = (TimestepEmbedder(self.dim, self.freq_dim, name="r_embedder")
                           if self.r_timestep else None)
        self.text_embedder_0 = nn.Dense(self.dim, name="text_embedder_0")
        self.text_embedder_2 = nn.Dense(self.dim, name="text_embedder_2")
        if self.scan_blocks:
            self.block_stack = WanBlock(self.dim, self.num_heads, self.ffn_dim,
                                        self.qk_norm, self.cross_attn_norm,
                                        self.attn_impl, remat_inner=self.remat,
                                        remat_inner_mode=self.remat_inner_mode,
                                        residual_f32=self.residual_f32,
                                        name="blocks")
            self.blocks = []
        else:
            self.blocks = [WanBlock(self.dim, self.num_heads, self.ffn_dim,
                                    self.qk_norm, self.cross_attn_norm,
                                    self.attn_impl, remat_inner=self.remat,
                                    remat_inner_mode=self.remat_inner_mode,
                                    residual_f32=self.residual_f32,
                                    name=f"blocks_{i}")
                           for i in range(self.num_layers)]
        self.norm_out = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                                     name="norm_out")
        self.proj_out = nn.Dense(int(np.prod(self.patch_size)) * self.out_channels,
                                 name="proj_out")
        self.out_scale_shift_table = self.param(
            "out_scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / shape[-1] ** 0.5,
            (1, 2, self.dim))
        self.logvar_linear = (nn.Dense(1, name="logvar_linear")
                              if self.enable_logvar_linear else None)
        self._rope_tables, self._rope_splits = _rope_freqs(self.head_dim,
                                                           self.rope_max_seq_len)

    # ------------------------------------------------------------------ parts
    def _embed_text(self, text_embeds):
        return self.text_embedder_2(nn.gelu(self.text_embedder_0(text_embeds),
                                            approximate=True))

    def _per_frame_t(self, t, num_frames):
        """t [B] or [B, T_latent] -> per-patched-frame [B, F] in model scale."""
        t = self.noise_scheduler.rescale_t(t)
        p_t = self.patch_size[0]
        if t.ndim == 1:
            t = t[:, None]
        if t.shape[1] == 1:
            t = jnp.repeat(t, num_frames, axis=1)
        else:
            t = t[:, ::p_t]
        return t.astype(jnp.float32)

    def _time_embeds(self, embedder, t_frames):
        b, f = t_frames.shape
        temb_flat, proj_flat = embedder(t_frames.reshape(-1))
        return (temb_flat.reshape(b, f, self.dim),
                proj_flat.reshape(b, f, 6, self.dim))

    def _patchify(self, x):
        b, t, h, w, c = x.shape
        tokens = self.patch_embedding(x)  # [B, F, H', W', D]
        f, hp, wp = tokens.shape[1:4]
        return tokens.reshape(b, f * hp * wp, self.dim), (f, hp, wp)

    def _unpatchify(self, tokens, grid, batch):
        f, hp, wp = grid
        p_t, p_h, p_w = self.patch_size
        c = self.out_channels
        x = tokens.reshape(batch, f, hp, wp, p_t, p_h, p_w, c)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # [B, F, pt, hp, ph, wp, pw, C]
        return x.reshape(batch, f * p_t, hp * p_h, wp * p_w, c)

    # ---------------------------------------------------------------- forward
    def __call__(self, x_t, t, condition=None, r=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (),
                 return_logvar: bool = False,
                 fwd_pred_type: Optional[str] = None,
                 skip_layers: Optional[Tuple[int, ...]] = None,
                 causal_chunk_frames: Optional[int] = None,
                 extra_context=None,
                 train: bool = False, **kwargs):
        if fwd_pred_type is not None:
            assert fwd_pred_type in NET_PRED_TYPES
        x_in, t_in = x_t, t

        if isinstance(condition, dict):
            text_embeds = condition["text_embeds"]
        else:
            text_embeds = condition
        if text_embeds is None:
            text_embeds = jnp.zeros((x_t.shape[0], 1, self.text_dim), x_t.dtype)

        tokens, grid = self._patchify(x_t)
        f, hp, wp = grid
        frame_seqlen = hp * wp
        cos, sin = _build_rope(self._rope_tables, self._rope_splits, f, hp, wp)

        t_frames = self._per_frame_t(t, f)
        temb, timestep_proj = self._time_embeds(self.condition_embedder, t_frames)

        if self.r_embedder is not None and r is not None:
            r_in = r if self.time_cond_type == "abs" else \
                jnp.maximum(t - r, 0.0)
            r_frames = self._per_frame_t(r_in, f)
            remb, r_proj = self._time_embeds(self.r_embedder, r_frames)
            timestep_proj = timestep_proj + r_proj
            temb = temb + remb
        elif r is not None:
            raise ValueError("r provided but r_timestep is not enabled")

        context = self._embed_text(text_embeds)
        if extra_context is not None:
            # e.g. CLIP image tokens for I2V (prepended, ref image branch
            # ``network_causal.py:294-322``)
            context = jnp.concatenate([extra_context.astype(context.dtype),
                                       context], axis=1)

        causal_block = (causal_chunk_frames * frame_seqlen
                        if causal_chunk_frames else None)

        features = []
        # sequence parallelism: pin the token axis to the sp mesh axis (no-op
        # on sp=1 meshes); every per-token activation below is then N/sp per
        # device and GSPMD gathers K/V around attention (parallel/sp.py)
        x = shard_seq(tokens)
        if self.scan_blocks:
            if feature_indices or skip_layers:
                raise ValueError(
                    "feature_indices/skip_layers need per-block access; "
                    "use scan_blocks=False for discriminator taps and SLG")

            from fastgen_tpu.parallel import pp as pp_lib

            pp = pp_lib.pp_size()
            if (pp > 1 and not self.is_initializing()
                    and self.num_layers % pp == 0):
                # pipeline parallelism (parallel/pp.py): the stacked block
                # params already carry the leading [L] layer axis the GPipe
                # schedule shards per stage; microbatches flow stage-to-stage
                # over neighbor ppermute hops. Registered via
                # pp_lib.set_active_mesh; exact same math as the scan below.
                stacked = self.variables["params"]["blocks"]
                block = self.block_stack.clone()

                def _one(p, x_, tp_, ctx_, cos_, sin_):
                    y, _ = block.apply({"params": p}, x_, tp_, ctx_,
                                       (cos_, sin_), frame_seqlen,
                                       causal_block=causal_block)
                    return y

                x = pp_lib.pipeline_blocks(
                    pp_lib.chunk_scan(_one), stacked, x, cos, sin,
                    batched=(timestep_proj, context),
                    mesh=pp_lib.get_active_mesh(),
                    num_microbatches=pp_lib.auto_microbatches(x.shape[0], pp))
            elif (self.scan_group > 1 and self.group_unroll
                  and not self.is_initializing()
                  and self.num_layers % self.scan_group == 0):
                # UNROLLED grouped remat: a python loop over L/g checkpointed
                # group segments, each containing a python loop over its g
                # blocks — NO lax.scan anywhere, so the named-offload remat
                # policy ("offload_attn") sits outside any scan body and
                # sidesteps the libtpu async-start-under-scan compile bug
                # documented in _remat_policy (r4 verdict task 2). Costs
                # L/g x the group HLO in compile time vs the scan path;
                # the remat boundary is identical to the grouped scan's, so
                # activation workspace matches (grad parity:
                # tests/test_wan_remat.py::test_group_unroll_matches_scan).
                g = self.scan_group
                stacked = self.variables["params"]["blocks"]
                block = self.block_stack.clone()
                grouped = jax.tree_util.tree_map(
                    lambda a: a.reshape((self.num_layers // g, g)
                                        + a.shape[1:]), stacked)

                def _group_fn(y, p_group):
                    for bi in range(g):
                        p_b = jax.tree_util.tree_map(lambda a: a[bi], p_group)
                        y, _ = block.apply(
                            {"params": p_b}, y, timestep_proj, context,
                            (cos, sin), frame_seqlen,
                            causal_block=causal_block)
                        y = shard_seq(y)
                    return y

                group_fn = jax.checkpoint(_group_fn, prevent_cse=False,
                                          policy=self._remat_policy()) \
                    if self.remat else _group_fn
                for gi in range(self.num_layers // g):
                    p_group = jax.tree_util.tree_map(lambda a: a[gi], grouped)
                    x = group_fn(x, p_group)
            elif (self.scan_group > 1 and not self.is_initializing()
                  and self.num_layers % self.scan_group == 0):
                # grouped scan: [L, ...] params reshaped to [L/g, g, ...];
                # the remat boundary wraps g blocks, so the carry stack is
                # [L/g, B, N, D] instead of [L, B, N, D]
                g = self.scan_group
                stacked = self.variables["params"]["blocks"]
                block = self.block_stack.clone()
                grouped = jax.tree_util.tree_map(
                    lambda a: a.reshape((self.num_layers // g, g)
                                        + a.shape[1:]), stacked)

                def _apply(y, p):
                    out, _ = block.apply(
                        {"params": p}, y, timestep_proj, context,
                        (cos, sin), frame_seqlen, causal_block=causal_block)
                    return shard_seq(out)

                if self.remat:
                    # nested remat: the inner per-block checkpoint keeps each
                    # block's interior transient during the group's backward
                    # (without it the inner scan stacks f32 [g, B, N, D]
                    # residuals per intermediate); the policy on BOTH levels
                    # keeps the saved attention dead in every recompute
                    _apply = jax.checkpoint(_apply, prevent_cse=False,
                                            policy=self._remat_policy())

                def _group_body(carry, p_group):
                    y, _ = jax.lax.scan(
                        lambda y_, p_: (_apply(y_, p_), None), carry, p_group)
                    return y, None

                if self.remat:
                    _group_body = jax.checkpoint(
                        _group_body, prevent_cse=False,
                        policy=self._remat_policy())
                x, _ = jax.lax.scan(_group_body, x, grouped)
            else:
                def _body(blk, carry, tp_, ctx_, cos_, sin_):
                    y, _ = blk(carry, tp_, ctx_, (cos_, sin_), frame_seqlen,
                               causal_block=causal_block)
                    return shard_seq(y), None

                if self.remat:
                    # prevent_cse=False: lax.scan's loop body is already a CSE
                    # barrier, and it lets XLA fuse the block cleanly
                    _body = nn.remat(_body, prevent_cse=False,
                                     policy=self._remat_policy())
                scan = nn.scan(_body, variable_axes={"params": 0},
                               split_rngs={"params": True},
                               in_axes=(nn.broadcast,) * 4,
                               length=self.num_layers)
                x, _ = scan(self.block_stack, x, timestep_proj, context,
                            cos, sin)
        else:
            for idx, block in enumerate(self.blocks):
                if skip_layers is not None and idx in skip_layers:
                    continue
                if self.remat:
                    # rematerialize each block under grad: at diffusion-forcing
                    # video lengths (21f@480p = 32,760 tokens) the per-block FFN
                    # activations are ~560 MB bf16 — without remat the backward
                    # OOMs HBM. frame_seqlen/causal_block are python ints and
                    # stay static via the closure.
                    def _blk(blk, x_, tp_, ctx_, cos_, sin_):
                        return blk(x_, tp_, ctx_, (cos_, sin_), frame_seqlen,
                                   causal_block=causal_block)[0]

                    x = shard_seq(nn.remat(_blk, policy=self._remat_policy())(
                        block, x, timestep_proj, context, cos, sin))
                else:
                    x, _ = block(x, timestep_proj, context, (cos, sin),
                                 frame_seqlen, causal_block=causal_block)
                    x = shard_seq(x)
                if idx in feature_indices:
                    features.append(x.reshape(x.shape[0], f, hp, wp, self.dim))
                if return_features_early and len(features) == len(feature_indices):
                    return features
            if return_features_early:
                return features

        # output modulation: per-frame (ref ``classify_forward`` norm_out path)
        def _head(mdl, x_, temb_):
            shift, scale = [p.squeeze(2) for p in jnp.split(
                mdl.out_scale_shift_table[:, None].astype(jnp.float32)
                + temb_[:, :, None].astype(jnp.float32), 2, axis=2)]
            xn = mdl.norm_out(x_.astype(jnp.float32)).reshape(
                x_.shape[0], f, frame_seqlen, mdl.dim)
            xn = xn * (1 + scale[:, :, None]) + shift[:, :, None]
            xo = xn.reshape(x_.shape[0], f * frame_seqlen, mdl.dim).astype(x_.dtype)
            return mdl.proj_out(xo)

        if self.remat:
            # remat the output head: its f32 [N, D] norm/modulation buffers
            # (~0.6 GB at 32,760 tokens) otherwise persist to the backward
            x = nn.remat(_head, prevent_cse=False)(self, x, temb)
        else:
            x = _head(self, x, temb)
        out = self._unpatchify(x, grid, x_t.shape[0])

        t_conv = t_in if t_in.ndim == 1 else t_in[:, :, None, None, None]
        # conditioned variants (I2V concat-mask) widen the input channels;
        # pred-type algebra runs on the noisy-latent slice only
        out = self.noise_scheduler.convert_model_output(
            x_in[..., :out.shape[-1]], out, t_conv,
            src_pred_type=self.net_pred_type,
            target_pred_type=fwd_pred_type or self.net_pred_type)

        result = out if not feature_indices else [out, features]
        if return_logvar:
            assert self.logvar_linear is not None, "enable_logvar_linear required"
            logvar = self.logvar_linear(temb.mean(axis=1))
            return result, logvar
        return result

    def sample(self, noise, condition=None, neg_condition=None,
               guidance_scale: Optional[float] = 5.0, num_steps: int = 50,
               shift: float = 5.0, solver: str = "euler",
               skip_layers: Optional[Tuple[int, ...]] = None,
               skip_layers_start_percent: float = 0.0, **kwargs):
        """Euler flow sampler with CFG + skip-layer guidance (teacher
        sampling; the reference uses UniPC, ``Wan/network.py:919`` — Euler at
        50 steps is the same family of multi-step teacher sampling).
        ``shift`` warps the timestep grid like UniPC's ``flow_shift``
        (more steps near t=1). ``skip_layers`` drop transformer layers on the
        *unconditional* branch from ``skip_layers_start_percent`` of the
        schedule onward (ref ``Wan/network.py:927-982``)."""
        ns = self.noise_scheduler
        t_list = np.linspace(ns.max_t, 0.0, num_steps + 1)
        if shift and shift != 1.0:
            t_list = shift * t_list / (1.0 + (shift - 1.0) * t_list)
        if solver in ("dpm2m", "unipc"):
            # second-order data-prediction multistep (ops/solvers.py):
            # "unipc" is the reference's exact teacher sampler (bh2 + UniC
            # corrector, ref Wan/network.py:919); "dpm2m" is the corrector-
            # free DPM-Solver++(2M). CFG on x0 is algebraically the same
            # combination as on velocity for affine schedules.
            from fastgen_tpu.ops.solvers import MULTISTEP_SOLVERS

            ms_solver = MULTISTEP_SOLVERS[solver]

            use_cfg_ms = guidance_scale is not None and guidance_scale > 1.0 \
                and neg_condition is not None
            n_steps = len(t_list) - 1

            def make_x0_fn(slg):
                # slg is static per segment: layer skipping changes the
                # graph, so it can't be a traced choice inside the scan
                def x0_fn(x, t_cur):
                    tb = jnp.full((x.shape[0],), t_cur, jnp.float32)
                    x0 = self(x, tb, condition=condition, fwd_pred_type="x0")
                    if use_cfg_ms:
                        x0_neg = self(x, tb, condition=neg_condition,
                                      fwd_pred_type="x0", skip_layers=slg)
                        x0 = x0_neg + guidance_scale * (x0 - x0_neg)
                    preserve_ = getattr(self, "preserve_conditioning", None)
                    return (preserve_(x0, condition)
                            if preserve_ is not None else x0)
                return x0_fn

            slg_start = (int(np.ceil(skip_layers_start_percent * n_steps))
                         if skip_layers is not None and use_cfg_ms else n_steps)
            if 0 < slg_start < n_steps:
                # SLG turns on mid-schedule: run two chained scans (plain
                # CFG, then SLG-CFG). The 2M history restarts first-order at
                # the seam — the standard multistep-restart behavior.
                x = ms_solver(make_x0_fn(None), ns, noise,
                              t_list[:slg_start + 1])
                return ms_solver(make_x0_fn(skip_layers), ns, noise,
                                 t_list[slg_start:], latents=x)
            slg0 = skip_layers if slg_start == 0 and use_cfg_ms else None
            return ms_solver(make_x0_fn(slg0), ns, noise, t_list)
        x = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        preserve = getattr(self, "preserve_conditioning", None)
        if preserve is not None:
            x = preserve(x, condition)
        use_cfg = guidance_scale is not None and guidance_scale > 1.0 and \
            neg_condition is not None
        b = x.shape[0]

        # lax.scan over the schedule: one compiled step, O(1) HLO in
        # num_steps (see EDMPrecond.sample). SLG changes the *graph* (layers
        # are dropped), so it splits the schedule into two chained scans at
        # its static start index instead of being a traced choice.
        def euler_seg(x, t_seg, slg):
            def step(x, pair):
                t_cur, t_next = pair[0], pair[1]
                tb = jnp.full((b,), t_cur, jnp.float32)
                v = self(x, tb, condition=condition, fwd_pred_type="flow")
                if use_cfg:
                    v_neg = self(x, tb, condition=neg_condition,
                                 fwd_pred_type="flow", skip_layers=slg)
                    v = v_neg + guidance_scale * (v - v_neg)
                x_n = x - (t_cur - t_next).astype(x.dtype) * v
                # I2V/V2W subclasses pin conditioning frames after each step
                # (ref WanI2V/network.py sample loop)
                if preserve is not None:
                    x_n = preserve(x_n, condition)
                return x_n, None

            t_arr = jnp.asarray(t_seg, jnp.float32)
            x, _ = jax.lax.scan(step, x,
                                jnp.stack([t_arr[:-1], t_arr[1:]], axis=1))
            return x

        slg_on = skip_layers is not None and use_cfg
        slg_start = (int(np.ceil(skip_layers_start_percent * num_steps))
                     if slg_on else num_steps)
        if 0 < slg_start < num_steps:
            x = euler_seg(x, t_list[:slg_start + 1], None)
            return euler_seg(x, t_list[slg_start:], skip_layers)
        return euler_seg(x, t_list,
                         skip_layers if slg_on and slg_start == 0 else None)


class CausalWanVideoDiT(WanVideoDiT, CausalFastGenNetwork):
    """Causal Wan: diffusion-forcing training + KV-cached AR generation
    (ref ``network_causal.py:928-1295``)."""

    chunk_size: int = 3
    total_num_frames: int = 21
    frame_height: int = 60
    frame_width: int = 104

    @property
    def frame_seqlen(self) -> int:
        return (self.frame_height // self.patch_size[1]) * \
            (self.frame_width // self.patch_size[2])

    def __call__(self, x_t, t, condition=None, causal: bool = True, **kwargs):
        kwargs.setdefault("causal_chunk_frames",
                          self.chunk_size if causal else None)
        return super().__call__(x_t, t, condition=condition, **kwargs)

    def init_cache(self, batch_size: int, dtype=jnp.bfloat16,
                   max_frames: Optional[int] = None) -> Dict[str, Any]:
        """Fixed-shape KV cache pytree (ref ``_create_external_caches``,
        ``network_causal.py:703-816``)."""
        max_tokens = (max_frames or self.total_num_frames) * self.frame_seqlen
        head_dim = self.head_dim
        cache = {"self": [], "cross": None, "len": jnp.zeros((), jnp.int32)}
        if self.scan_blocks:
            # stacked layout (leading [L] axis) so forward_chunk's nn.scan
            # can consume one block's cache slice per step
            cache["self"] = {
                "k": jnp.zeros((self.num_layers, batch_size, max_tokens,
                                self.num_heads, head_dim), dtype),
                "v": jnp.zeros((self.num_layers, batch_size, max_tokens,
                                self.num_heads, head_dim), dtype),
            }
            return cache
        for _ in range(self.num_layers):
            cache["self"].append({
                "k": jnp.zeros((batch_size, max_tokens, self.num_heads, head_dim),
                               dtype),
                "v": jnp.zeros((batch_size, max_tokens, self.num_heads, head_dim),
                               dtype),
            })
        return cache

    def init_cross_cache(self, params_scope_unused, condition):
        raise NotImplementedError("use apply(..., method=net.precompute_cross_kv)")

    def precompute_cross_kv(self, condition):
        """Static cross-attn K/V per block (ref ``network_causal.py:330-358``).

        scan_blocks=True returns the stacked ``(k, v)`` pair with a leading
        [L] axis (matching the stacked param/cache layout); otherwise a list
        of per-block ``(k, v)`` tuples."""
        text_embeds = condition["text_embeds"] if isinstance(condition, dict) else condition
        context = self._embed_text(text_embeds)
        if self.scan_blocks:
            def _kv(blk, carry, ctx_):
                return carry, blk.attn2.kv(ctx_)

            scan = nn.scan(_kv, variable_axes={"params": 0},
                           split_rngs={"params": True},
                           in_axes=(nn.broadcast,), length=self.num_layers)
            _, kvs = scan(self.block_stack, 0, context)
            return kvs
        return [blk.attn2.kv(context) for blk in self.blocks]

    def forward_chunk(self, x_chunk, t, cache, start_frame,
                      condition=None, cross_kv=None,
                      fwd_pred_type: Optional[str] = None,
                      store_kv: bool = True, **kwargs):
        """One AR chunk: x_chunk [B, T_chunk, H, W, C]; returns (out, cache).

        ``start_frame`` may be a traced int32 — the RoPE table for the full
        ``total_num_frames`` grid is built once and sliced dynamically, so a
        single compiled program serves every chunk position (the reference
        recomputes RoPE per chunk on host, ``network_causal.py:79-128``).
        Cache writes use dynamic_update_slice at the derived offset.
        """
        b = x_chunk.shape[0]
        tokens, grid = self._patchify(x_chunk)
        f, hp, wp = grid
        frame_seqlen = hp * wp
        start_frame = jnp.asarray(start_frame, jnp.int32)
        start_token = start_frame * frame_seqlen
        cos_full, sin_full = _build_rope(
            self._rope_tables, self._rope_splits,
            max(self.total_num_frames, f), hp, wp)
        n_chunk = f * frame_seqlen
        cos = jax.lax.dynamic_slice_in_dim(cos_full, start_token, n_chunk, axis=0)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, start_token, n_chunk, axis=0)

        t_frames = self._per_frame_t(t, f)
        temb, timestep_proj = self._time_embeds(self.condition_embedder, t_frames)

        if cross_kv is None:
            text_embeds = (condition["text_embeds"] if isinstance(condition, dict)
                           else condition)
            context = self._embed_text(text_embeds)
        else:
            context = None

        x = tokens
        if self.scan_blocks:
            # stacked-cache AR path: scan one compiled block over the [L]
            # axis of params, KV cache, and (optionally) precomputed cross-KV
            have_ckv = cross_kv is not None

            def _chunk_body(blk, carry, tp_, ctx_, cos_, sin_, *scanned):
                cache_i = scanned[0]
                ckv_i = scanned[1] if have_ckv else None
                y, upd = blk(carry, tp_, ctx_, (cos_, sin_), frame_seqlen,
                             self_cache=cache_i, start_token=start_token,
                             cross_kv=ckv_i, store_kv=store_kv)
                return y, (upd if store_kv else 0)

            scan = nn.scan(_chunk_body, variable_axes={"params": 0},
                           split_rngs={"params": True},
                           in_axes=(nn.broadcast,) * 4 + (0,) * (1 + have_ckv),
                           length=self.num_layers)
            xs = (cache["self"], cross_kv) if have_ckv else (cache["self"],)
            x, new_self = scan(self.block_stack, x, timestep_proj, context,
                               cos, sin, *xs)
        else:
            new_self = []
            for idx, block in enumerate(self.blocks):
                x, updated = block(
                    x, timestep_proj, context, (cos, sin), frame_seqlen,
                    self_cache=cache["self"][idx], start_token=start_token,
                    cross_kv=cross_kv[idx] if cross_kv is not None else None,
                    store_kv=store_kv)
                new_self.append(updated)

        shift, scale = [p.squeeze(2) for p in jnp.split(
            self.out_scale_shift_table[:, None].astype(jnp.float32)
            + temb[:, :, None].astype(jnp.float32), 2, axis=2)]
        xn = self.norm_out(x.astype(jnp.float32)).reshape(b, f, frame_seqlen, self.dim)
        xn = xn * (1 + scale[:, :, None]) + shift[:, :, None]
        x = xn.reshape(b, f * frame_seqlen, self.dim).astype(x_chunk.dtype)
        x = self.proj_out(x)
        out = self._unpatchify(x, grid, b)

        out = self.noise_scheduler.convert_model_output(
            x_chunk[..., :out.shape[-1]], out, t,
            src_pred_type=self.net_pred_type,
            target_pred_type=fwd_pred_type or self.net_pred_type)

        if store_kv:
            new_cache = {"self": new_self, "cross": cache.get("cross"),
                         "len": (start_token + f * frame_seqlen).astype(jnp.int32)}
        else:
            # denoise pass: do NOT return the cache — an undonated input
            # echoed as a jit output forces XLA to copy the full cache
            # (~6 GB for Wan-1.3B@480p) on every denoising step
            new_cache = None
        return out, new_cache


def stack_block_params(params):
    """Convert a per-block param tree (``blocks_0`` .. ``blocks_{L-1}``, the
    ``scan_blocks=False`` / checkpoint-converter layout) into the stacked
    ``blocks`` layout used by ``scan_blocks=True`` (leading [L] axis on every
    block leaf). Non-block entries pass through unchanged."""
    out = {k: v for k, v in params.items() if not k.startswith("blocks_")}
    idxs = sorted((int(k.split("_")[-1]) for k in params
                   if k.startswith("blocks_")))
    if idxs:
        assert idxs == list(range(len(idxs))), f"non-contiguous blocks: {idxs}"
        out["blocks"] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[params[f"blocks_{i}"] for i in idxs])
    return out


def unstack_block_params(params):
    """Inverse of :func:`stack_block_params`."""
    out = {k: v for k, v in params.items() if k != "blocks"}
    if "blocks" in params:
        num_layers = jax.tree_util.tree_leaves(params["blocks"])[0].shape[0]
        for i in range(num_layers):
            out[f"blocks_{i}"] = jax.tree_util.tree_map(
                lambda x: x[i], params["blocks"])
    return out
