"""Flux MMDiT in flax.linen (ref ``fastgen/networks/Flux/network.py``; the
reference wraps diffusers' FluxTransformer2DModel and patches
``classify_forward`` over its 19 joint + 38 single blocks).

Native build: double-stream (joint image/text) blocks followed by
single-stream blocks, AdaLN modulation from (timestep, guidance, pooled CLIP),
2-axis RoPE over latent positions. Text encoders (CLIP + T5) consume
precomputed embeddings (latent-loader path). Flow prediction on the RF
schedule, guidance-distilled conditioning baked in (Flux.1-dev style).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.dit.network import FourierTimeEmbedding
from fastgen_tpu.networks.network import FastGenNetwork
from fastgen_tpu.networks.wan.network import RMSNorm, apply_rope
from fastgen_tpu.ops.attention import dot_product_attention
from fastgen_tpu.ops.schedules import NET_PRED_TYPES


def _rope_2d(head_dim: int, h: int, w: int, txt_len: int, theta: float = 10000.0):
    """Flux RoPE, diffusers ``FluxPosEmbed``-exact: head_dim splits across
    the THREE id axes ``axes_dim=(d/8, 7d/16, 7d/16)`` (=(16, 56, 56) at
    head_dim 128) with per-axis frequencies ``1/theta^(arange(0,d_i,2)/d_i)``;
    token ids are (0, y, x) for image tokens and all-zero for text tokens, so
    the first-axis dims rotate by angle 0 everywhere. Pinned against a torch
    replica in ``tests/test_converter_replicas.py`` — the frequency layout is
    what real Flux checkpoints were trained with."""
    d_id = head_dim // 8
    d_rest = (head_dim - d_id) // 2
    assert d_id % 2 == 0 and d_rest % 2 == 0 and d_id + 2 * d_rest == head_dim, (
        f"head_dim {head_dim} must split into even RoPE axes (e.g. 128 -> "
        f"16/56/56); got id={d_id}, y/x={d_rest}")
    axes_dim = (d_id, d_rest, d_rest)

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    n_img = h * w
    positions = (np.zeros(n_img), ys.reshape(-1), xs.reshape(-1))

    ang_parts = []
    for d, pos in zip(axes_dim, positions):
        freqs = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        ang_parts.append(np.outer(pos, freqs))            # [HW, d/2]
    img_ang = np.concatenate(ang_parts, axis=-1)          # [HW, head_dim/2]
    txt_ang = np.zeros((txt_len, head_dim // 2))
    ang = np.concatenate([txt_ang, img_ang], axis=0)
    return jnp.asarray(np.cos(ang), jnp.float32), jnp.asarray(np.sin(ang), jnp.float32)


class AdaLNModulation(nn.Module):
    """Flux modulation: standard init (diffusers AdaLayerNormZero does not
    zero-init; the network loads pretrained weights anyway)."""

    dim: int
    n_params: int

    @nn.compact
    def __call__(self, temb):
        out = nn.Dense(self.dim * self.n_params, name="lin")(nn.silu(temb))
        return jnp.split(out[:, None, :], self.n_params, axis=-1)


class JointBlock(nn.Module):
    """Double-stream block: image and text streams with joint attention."""

    dim: int
    num_heads: int
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, img, txt, temb, rope):
        head_dim = self.dim // self.num_heads
        (i_shift, i_scale, i_gate, i_shift2, i_scale2, i_gate2) = AdaLNModulation(
            self.dim, 6, name="img_mod")(temb)
        (t_shift, t_scale, t_gate, t_shift2, t_scale2, t_gate2) = AdaLNModulation(
            self.dim, 6, name="txt_mod")(temb)

        def qkv(x, name):
            out = nn.Dense(self.dim * 3, name=name)(x)
            b, n, _ = x.shape
            out = out.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = out[:, :, 0], out[:, :, 1], out[:, :, 2]
            q = RMSNorm(head_dim, name=f"{name}_qnorm")(q)
            k = RMSNorm(head_dim, name=f"{name}_knorm")(k)
            return q, k, v

        img_n = nn.LayerNorm(use_bias=False, use_scale=False, name="img_norm1")(img)
        img_n = img_n * (1 + i_scale) + i_shift
        txt_n = nn.LayerNorm(use_bias=False, use_scale=False, name="txt_norm1")(txt)
        txt_n = txt_n * (1 + t_scale) + t_shift

        iq, ik, iv = qkv(img_n, "img_qkv")
        tq, tk, tv = qkv(txt_n, "txt_qkv")
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v, impl=self.attn_impl)
        b, n, hds, hd = attn.shape
        attn = attn.reshape(b, n, self.dim)
        txt_len = txt.shape[1]
        t_attn, i_attn = attn[:, :txt_len], attn[:, txt_len:]

        img = img + i_gate * nn.Dense(self.dim, name="img_proj")(i_attn)
        txt = txt + t_gate * nn.Dense(self.dim, name="txt_proj")(t_attn)

        img_n = nn.LayerNorm(use_bias=False, use_scale=False, name="img_norm2")(img)
        img_n = img_n * (1 + i_scale2) + i_shift2
        img = img + i_gate2 * nn.Dense(self.dim, name="img_mlp_out")(
            nn.gelu(nn.Dense(self.dim * 4, name="img_mlp_in")(img_n), approximate=True))
        txt_n = nn.LayerNorm(use_bias=False, use_scale=False, name="txt_norm2")(txt)
        txt_n = txt_n * (1 + t_scale2) + t_shift2
        txt = txt + t_gate2 * nn.Dense(self.dim, name="txt_mlp_out")(
            nn.gelu(nn.Dense(self.dim * 4, name="txt_mlp_in")(txt_n), approximate=True))
        return img, txt


class SingleBlock(nn.Module):
    """Single-stream block: fused attention+MLP over the concatenated sequence."""

    dim: int
    num_heads: int
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, temb, rope):
        head_dim = self.dim // self.num_heads
        shift, scale, gate = AdaLNModulation(self.dim, 3, name="mod")(temb)
        xn = nn.LayerNorm(use_bias=False, use_scale=False, name="norm")(x)
        xn = xn * (1 + scale) + shift
        qkv_mlp = nn.Dense(self.dim * 3 + self.dim * 4, name="qkv_mlp")(xn)
        qkv, mlp = qkv_mlp[..., : self.dim * 3], qkv_mlp[..., self.dim * 3:]
        b, n, _ = x.shape
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = RMSNorm(head_dim, name="qnorm")(q)
        k = RMSNorm(head_dim, name="knorm")(k)
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = dot_product_attention(q, k, v, impl=self.attn_impl).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, name="proj_out")(
            jnp.concatenate([attn, nn.gelu(mlp, approximate=True)], axis=-1))
        return x + gate * out


class Flux(FastGenNetwork):
    """(ref ``Flux/network.py:327``). Latents [B, H, W, C] (packed 2x2 -> C*4
    tokens like the reference pipeline); flow pred, RF schedule."""

    dim: int = 3072
    num_layers: int = 19
    num_single_layers: int = 38
    num_heads: int = 24
    in_channels: int = 16
    patch_size: int = 2
    text_dim: int = 4096
    pooled_dim: int = 768
    guidance_embeds: bool = True
    guidance_scale: float = 3.5
    attn_impl: Optional[str] = None
    net_pred_type: str = "flow"
    schedule_type: str = "rf"

    def setup(self):
        p = self.patch_size
        self.x_embedder = nn.Dense(self.dim, name="x_embedder")
        self.context_embedder = nn.Dense(self.dim, name="context_embedder")
        self.time_embed = FourierTimeEmbedding(self.dim, name="time_embed")
        self.guidance_embed = (FourierTimeEmbedding(self.dim, name="guidance_embed")
                               if self.guidance_embeds else None)
        self.pooled_embed_0 = nn.Dense(self.dim, name="pooled_embed_0")
        self.pooled_embed_2 = nn.Dense(self.dim, name="pooled_embed_2")
        self.joint_blocks = [JointBlock(self.dim, self.num_heads, self.attn_impl,
                                        name=f"joint_{i}")
                             for i in range(self.num_layers)]
        self.single_blocks = [SingleBlock(self.dim, self.num_heads, self.attn_impl,
                                          name=f"single_{i}")
                              for i in range(self.num_single_layers)]
        self.norm_out_mod = AdaLNModulation(self.dim, 2, name="norm_out_mod")
        self.norm_out = nn.LayerNorm(use_bias=False, use_scale=False, name="norm_out")
        self.proj_out = nn.Dense(p * p * self.in_channels, name="proj_out")

    def __call__(self, x_t, t, condition=None, r=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (),
                 return_logvar: bool = False,
                 fwd_pred_type: Optional[str] = None,
                 train: bool = False, guidance=None, **kwargs):
        if return_features_early and not feature_indices:
            return []
        if fwd_pred_type is not None:
            assert fwd_pred_type in NET_PRED_TYPES
        b, h, w, c = x_t.shape
        p = self.patch_size
        hp, wp = h // p, w // p

        if isinstance(condition, dict):
            text_embeds = condition.get("text_embeds")
            pooled = condition.get("pooled_embeds")
        else:
            text_embeds, pooled = condition, None
        if text_embeds is None:
            text_embeds = jnp.zeros((b, 1, self.text_dim), x_t.dtype)
        if pooled is None:
            pooled = jnp.zeros((b, self.pooled_dim), x_t.dtype)

        # pack 2x2 patches into tokens (Flux latent packing)
        img = x_t.reshape(b, hp, p, wp, p, c).transpose(0, 1, 3, 2, 4, 5)
        img = img.reshape(b, hp * wp, p * p * c)
        img = self.x_embedder(img)
        txt = self.context_embedder(text_embeds)

        t_scaled = self.noise_scheduler.rescale_t(t)
        temb = self.time_embed(t_scaled)
        if self.guidance_embed is not None:
            g = (jnp.full((b,), self.guidance_scale, jnp.float32)
                 if guidance is None else guidance)
            temb = temb + self.guidance_embed(g * 1000.0)
        temb = temb + self.pooled_embed_2(nn.silu(self.pooled_embed_0(pooled)))

        head_dim = self.dim // self.num_heads
        rope = _rope_2d(head_dim, hp, wp, txt.shape[1])

        features = []
        fidx = 0
        for block in self.joint_blocks:
            img, txt = block(img, txt, temb, rope)
            if fidx in feature_indices:
                features.append(img.reshape(b, hp, wp, self.dim))
            fidx += 1
            if return_features_early and len(features) == len(feature_indices):
                return features

        x = jnp.concatenate([txt, img], axis=1)
        for block in self.single_blocks:
            x = block(x, temb, rope)
            if fidx in feature_indices:
                features.append(x[:, txt.shape[1]:].reshape(b, hp, wp, self.dim))
            fidx += 1
            if return_features_early and len(features) == len(feature_indices):
                return features
        if return_features_early:
            return features

        img = x[:, txt.shape[1]:]
        shift, scale = self.norm_out_mod(temb)
        img = self.norm_out(img) * (1 + scale) + shift
        img = self.proj_out(img)
        out = img.reshape(b, hp, wp, p, p, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, h, w, c)

        out = self.noise_scheduler.convert_model_output(
            x_t, out, t, src_pred_type=self.net_pred_type,
            target_pred_type=fwd_pred_type or self.net_pred_type)
        result = out if not feature_indices else [out, features]
        if return_logvar:
            logvar = nn.Dense(1, name="logvar_linear")(temb)
            return result, logvar
        return result

    def sample(self, noise, condition=None, neg_condition=None,
               guidance_scale: Optional[float] = 3.5, num_steps: int = 28,
               solver: str = "euler", **kwargs):
        """Euler flow sampling with embedded guidance (Flux.1-dev style: the
        guidance scale conditions the net; no CFG doubling);
        ``solver="dpm2m"`` for multistep."""
        if solver == "dpm2m":
            from fastgen_tpu.ops.solvers import net_dpm2m_sample

            g_emb = jnp.full((noise.shape[0],),
                             guidance_scale or self.guidance_scale, jnp.float32)
            return net_dpm2m_sample(self, noise, condition, None, None,
                                    num_steps=num_steps, guidance=g_emb)
        ns = self.noise_scheduler
        t_list = np.linspace(ns.max_t, 0.0, num_steps + 1)
        x = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        b = x.shape[0]
        g = jnp.full((b,), guidance_scale or self.guidance_scale, jnp.float32)

        # lax.scan over the schedule: one compiled step, O(1) HLO in
        # num_steps (see EDMPrecond.sample)
        def step(x, pair):
            t_cur, t_next = pair[0], pair[1]
            tb = jnp.full((b,), t_cur, jnp.float32)
            v = self(x, tb, condition=condition, fwd_pred_type="flow", guidance=g)
            return x - (t_cur - t_next).astype(x.dtype) * v, None

        t_arr = jnp.asarray(t_list, jnp.float32)
        x, _ = jax.lax.scan(step, x, jnp.stack([t_arr[:-1], t_arr[1:]], axis=1))
        return x
