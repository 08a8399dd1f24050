"""LTX-2 video DiT (flax, video-only).

TPU-native counterpart of the reference's in-tree LTX2 stack
(``fastgen/networks/LTX2/network.py:380`` wrapping the video-only
``transformer_ltx2.py:791`` with ``audio_enabled=False`` — audio modules are
never allocated there either, so this port is video-only by construction):

* latents are **packed** to tokens host-side (``network.py:46-83``
  ``_pack_latents``/``_unpack_latents``) and projected with a Linear
  ``proj_in`` — no conv patch embedding;
* **AdaLN-single** (``transformer_ltx2.py:101-137``): one shared 6-param
  modulation MLP; per-block learned ``scale_shift_table`` offsets; timestep
  may be **per-token** (diffusion forcing), reshaped ``[B, N, 6, D]``;
* blocks (``transformer_ltx2.py:290-608``): RMSNorm (no affine) -> RoPE
  self-attention with qk RMSNorm and biases -> unmodulated text
  cross-attention -> gated FFN;
* interleaved 3D RoPE (``transformer_ltx2.py:611-789``) — reuses the Wan
  rope tables (same interleaved complex rotation);
* output: 2-param scale-shift + affine-free LayerNorm + ``proj_out``
  (``transformer_ltx2.py:171-175``); optional ``logvar_linear`` head the
  reference adds for sCM/distillation (``network.py:462-466``);
* ``feature_indices`` taps mirror ``classify_forward`` (``network.py:144``).

Caption projection expects Gemma3-connector embeddings (3840-d at full size,
``caption_channels``); any ``condition["text_embeds"]`` of that width works —
precomputed embeddings or the offline T5 stand-in.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.network import FastGenNetwork
from fastgen_tpu.networks.wan.network import (
    RMSNorm,
    _build_rope,
    _rope_freqs,
    apply_rope,
    sinusoidal_embedding_1d,
)
from fastgen_tpu.ops.attention import dot_product_attention
from fastgen_tpu.ops.schedules import NET_PRED_TYPES


def pack_latents(x, patch_size: int = 1, patch_size_t: int = 1):
    """[B,T,H,W,C] -> [B, N, C*pt*p*p] tokens (ref ``network.py:46-55``)."""
    b, t, h, w, c = x.shape
    pt, p = patch_size_t, patch_size
    x = x.reshape(b, t // pt, pt, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, (t // pt) * (h // p) * (w // p), pt * p * p * c)


def unpack_latents(tokens, grid, out_channels: int, patch_size: int = 1,
                   patch_size_t: int = 1):
    """Inverse of :func:`pack_latents` (ref ``network.py:56-66``)."""
    b = tokens.shape[0]
    f, hp, wp = grid
    pt, p = patch_size_t, patch_size
    x = tokens.reshape(b, f, hp, wp, pt, p, p, out_channels)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, f * pt, hp * p, wp * p, out_channels)


class LTX2AdaLNSingle(nn.Module):
    """Shared timestep-modulation MLP (ref ``transformer_ltx2.py:101-137``):
    sinusoidal t -> SiLU MLP -> ``num_mod_params * dim`` values."""

    dim: int
    num_mod_params: int = 6

    @nn.compact
    def __call__(self, t_tokens):
        # t_tokens: [B, N'] (N'=1 for homogeneous t, N tokens for forcing)
        emb = sinusoidal_embedding_1d(256, t_tokens.reshape(-1) * 1000.0)
        emb = nn.Dense(self.dim, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, name="linear_2")(emb)
        proj = nn.Dense(self.num_mod_params * self.dim, name="linear")(nn.silu(emb))
        b, n = t_tokens.shape
        return (emb.reshape(b, n, self.dim),
                proj.reshape(b, n, self.num_mod_params, self.dim))


class LTX2Attention(nn.Module):
    """RoPE self- or text-cross-attention with qk RMSNorm-across-heads and
    biases (ref ``transformer_ltx2.py:215-288``)."""

    dim: int
    num_heads: int
    attn_impl: Optional[str] = None

    def setup(self):
        self.to_q = nn.Dense(self.dim, use_bias=True, name="to_q")
        self.to_k = nn.Dense(self.dim, use_bias=True, name="to_k")
        self.to_v = nn.Dense(self.dim, use_bias=True, name="to_v")
        self.to_out = nn.Dense(self.dim, use_bias=True, name="to_out")
        self.norm_q = RMSNorm(self.dim, name="norm_q")
        self.norm_k = RMSNorm(self.dim, name="norm_k")

    def __call__(self, x, context=None, rope=None):
        kv_src = x if context is None else context
        q = self.norm_q(self.to_q(x))
        k = self.norm_k(self.to_k(kv_src))
        v = self.to_v(kv_src)
        b, nq, _ = q.shape
        nk = k.shape[1]
        hd = self.dim // self.num_heads
        q = q.reshape(b, nq, self.num_heads, hd)
        k = k.reshape(b, nk, self.num_heads, hd)
        v = v.reshape(b, nk, self.num_heads, hd)
        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        out = dot_product_attention(q, k, v, impl=self.attn_impl)
        return self.to_out(out.reshape(b, nq, self.dim))


class LTX2Block(nn.Module):
    """Video transformer block (ref ``transformer_ltx2.py:290-608``,
    audio path never built)."""

    dim: int
    num_heads: int
    ffn_mult: int = 4
    attn_impl: Optional[str] = None

    def setup(self):
        self.norm1 = RMSNorm(self.dim, elementwise_affine=False, name="norm1")
        self.attn1 = LTX2Attention(self.dim, self.num_heads, self.attn_impl,
                                   name="attn1")
        self.norm2 = RMSNorm(self.dim, elementwise_affine=False, name="norm2")
        self.attn2 = LTX2Attention(self.dim, self.num_heads, self.attn_impl,
                                   name="attn2")
        self.norm3 = RMSNorm(self.dim, elementwise_affine=False, name="norm3")
        self.ff_in = nn.Dense(self.ffn_mult * self.dim, name="ff_in")
        self.ff_out = nn.Dense(self.dim, name="ff_out")
        self.scale_shift_table = self.param(
            "scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / shape[-1] ** 0.5,
            (6, self.dim))

    def __call__(self, x, temb_proj, context, rope):
        # temb_proj: [B, N', 6, D] with N' in {1, N} (per-token forcing)
        ada = (self.scale_shift_table[None, None].astype(jnp.float32)
               + temb_proj.astype(jnp.float32))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = [a.squeeze(2) for a in
                                            jnp.split(ada, 6, axis=2)]
        xn = self.norm1(x).astype(jnp.float32) * (1 + scale_msa) + shift_msa
        x = x + (self.attn1(xn.astype(x.dtype), rope=rope).astype(jnp.float32)
                 * gate_msa).astype(x.dtype)

        x = x + self.attn2(self.norm2(x), context=context)

        xn = self.norm3(x).astype(jnp.float32) * (1 + scale_mlp) + shift_mlp
        y = self.ff_out(nn.gelu(self.ff_in(xn.astype(x.dtype)), approximate=True))
        return x + (y.astype(jnp.float32) * gate_mlp).astype(x.dtype)


class LTX2VideoDiT(FastGenNetwork):
    """Video-only LTX-2 transformer (ref ``transformer_ltx2.py:791-1203``)."""

    in_channels: int = 128           # packed latent channels
    out_channels: int = 128
    patch_size: int = 1
    patch_size_t: int = 1
    num_heads: int = 32
    head_dim: int = 128
    num_layers: int = 48
    caption_channels: int = 3840     # Gemma3 connector width
    ffn_mult: int = 4
    rope_max_seq_len: int = 4096
    enable_logvar_linear: bool = True
    attn_impl: Optional[str] = None
    remat: bool = False

    net_pred_type: str = "flow"
    schedule_type: str = "rf"

    @property
    def dim(self):
        return self.num_heads * self.head_dim

    @property
    def text_dim(self):
        return self.caption_channels

    def setup(self):
        self.proj_in = nn.Dense(self.dim, name="proj_in")
        self.caption_projection_0 = nn.Dense(self.dim, name="caption_projection_0")
        self.caption_projection_1 = nn.Dense(self.dim, name="caption_projection_1")
        self.time_embed = LTX2AdaLNSingle(self.dim, 6, name="time_embed")
        block = LTX2Block
        if self.remat:
            block = nn.remat(LTX2Block, static_argnums=())
        self.blocks = [block(self.dim, self.num_heads, self.ffn_mult,
                             self.attn_impl, name=f"block_{i}")
                       for i in range(self.num_layers)]
        self.norm_out = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                                     name="norm_out")
        self.proj_out = nn.Dense(self.out_channels *
                                 self.patch_size_t * self.patch_size ** 2,
                                 name="proj_out")
        self.out_scale_shift_table = self.param(
            "out_scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / shape[-1] ** 0.5,
            (2, self.dim))
        self.logvar_linear = (nn.Dense(1, name="logvar_linear")
                              if self.enable_logvar_linear else None)
        self._rope_tables, self._rope_splits = _rope_freqs(self.head_dim,
                                                           self.rope_max_seq_len)

    def _per_token_t(self, t, grid):
        """t [B] | [B, T_latent] -> [B, 1] or [B, N] model-scale timesteps."""
        f, hp, wp = grid
        t = self.noise_scheduler.rescale_t(t).astype(jnp.float32)
        if t.ndim == 1:
            return t[:, None]
        # per-frame t (diffusion forcing) -> per-token
        t = t[:, ::self.patch_size_t]
        return jnp.repeat(t, hp * wp, axis=1)

    def __call__(self, x_t, t, condition=None, r=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (),
                 return_logvar: bool = False,
                 fwd_pred_type: Optional[str] = None,
                 skip_layers: Optional[Tuple[int, ...]] = None,
                 train: bool = False, **kwargs):
        if fwd_pred_type is not None:
            assert fwd_pred_type in NET_PRED_TYPES
        x_in, t_in = x_t, t

        text_embeds = (condition.get("text_embeds")
                       if isinstance(condition, dict) else condition)
        if text_embeds is None:
            text_embeds = jnp.zeros((x_t.shape[0], 1, self.caption_channels),
                                    x_t.dtype)

        b, tt, hh, ww, _ = x_t.shape
        grid = (tt // self.patch_size_t, hh // self.patch_size,
                ww // self.patch_size)
        f, hp, wp = grid
        tokens = self.proj_in(pack_latents(x_t, self.patch_size,
                                           self.patch_size_t))
        cos, sin = _build_rope(self._rope_tables, self._rope_splits, f, hp, wp)

        t_tok = self._per_token_t(t, grid)
        temb, temb_proj = self.time_embed(t_tok)   # [B,N',D], [B,N',6,D]

        context = self.caption_projection_1(
            nn.gelu(self.caption_projection_0(text_embeds), approximate=True))

        features = []
        x = tokens
        for idx, block in enumerate(self.blocks):
            if skip_layers is not None and idx in skip_layers:
                continue
            x = block(x, temb_proj, context, (cos, sin))
            if idx in feature_indices:
                features.append(x.reshape(b, f, hp, wp, self.dim))
            if return_features_early and len(features) == len(feature_indices):
                return features
        if return_features_early:
            return features

        shift, scale = [a.squeeze(1) for a in jnp.split(
            self.out_scale_shift_table[None, :, None].astype(jnp.float32)
            + temb[:, None].astype(jnp.float32), 2, axis=1)]
        xn = self.norm_out(x).astype(jnp.float32) * (1 + scale) + shift
        out_tokens = self.proj_out(xn.astype(x.dtype))
        out = unpack_latents(out_tokens, grid, self.out_channels,
                             self.patch_size, self.patch_size_t)

        t_conv = t_in if t_in.ndim == 1 else t_in[:, :, None, None, None]
        out = self.noise_scheduler.convert_model_output(
            x_in, out, t_conv, src_pred_type=self.net_pred_type,
            target_pred_type=fwd_pred_type or self.net_pred_type)

        result = out if not feature_indices else [out, features]
        # always trace the head so params materialize at init (Dense(1) on the
        # pooled temb is negligible next to the blocks)
        logvar = (self.logvar_linear(temb.mean(axis=1))
                  if self.logvar_linear is not None else None)
        if return_logvar:
            assert logvar is not None, "enable_logvar_linear required"
            return result, logvar
        return result

    def sample(self, noise, condition=None, neg_condition=None,
               guidance_scale: Optional[float] = 4.0, num_steps: int = 40,
               solver: str = "euler", **kwargs):
        """Euler flow sampler with CFG (the reference samples via its
        pipeline's flow-matching scheduler, ``pipeline_ltx2.py``);
        ``solver="dpm2m"`` for multistep."""
        if solver == "dpm2m":
            from fastgen_tpu.ops.solvers import net_dpm2m_sample

            return net_dpm2m_sample(self, noise, condition, neg_condition,
                                    guidance_scale, num_steps)
        ns = self.noise_scheduler
        t_list = np.linspace(ns.max_t, 0.0, num_steps + 1)
        x = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        use_cfg = (guidance_scale is not None and guidance_scale > 1.0
                   and neg_condition is not None)
        for t_cur, t_next in zip(t_list[:-1], t_list[1:]):
            t_b = jnp.full((x.shape[0],), t_cur, jnp.float32)
            x0 = self(x, t_b, condition=condition, fwd_pred_type="x0")
            if use_cfg:
                x0_neg = self(x, t_b, condition=neg_condition,
                              fwd_pred_type="x0")
                x0 = x0_neg + guidance_scale * (x0 - x0_neg)
            if float(t_next) > 0:
                eps = ns.x0_to_eps(x, x0, t_b)
                x = ns.forward_process(x0, eps,
                                       jnp.full((x.shape[0],), t_next,
                                                jnp.float32))
            else:
                x = x0
        return x
