"""CogVideoX video DiT in flax.linen (ref ``fastgen/networks/CogVideoX/network.py``;
the reference wraps diffusers' CogVideoXTransformer3DModel).

Native build: per-frame 2D patchify, text tokens prepended to the joint
sequence, blocks with CogVideoX's dual LayerNormZero modulation (separate
scale/shift/gate for text and video partitions), optional 3D RoPE (5B), final
AdaLN projection. v-prediction on the cogvideox (zero-SNR) schedule; the T5
text encoder consumes precomputed embeddings."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.dit.network import FourierTimeEmbedding
from fastgen_tpu.networks.network import FastGenNetwork
from fastgen_tpu.networks.wan.network import _build_rope, _rope_freqs, apply_rope
from fastgen_tpu.ops.attention import dot_product_attention
from fastgen_tpu.ops.schedules import NET_PRED_TYPES


class LayerNormZero(nn.Module):
    """CogVideoX modulation: one SiLU+Dense producing (shift, scale, gate) for
    the video tokens and a separate triple for the text tokens."""

    dim: int

    @nn.compact
    def __call__(self, temb):
        out = nn.Dense(6 * self.dim, kernel_init=nn.initializers.zeros,
                       name="lin")(nn.silu(temb))
        return jnp.split(out[:, None, :], 6, axis=-1)


class CogVideoXBlock(nn.Module):
    dim: int
    num_heads: int
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, vid, txt, temb, rope=None):
        head_dim = self.dim // self.num_heads
        (shift, scale, gate, t_shift, t_scale, t_gate) = LayerNormZero(
            self.dim, name="norm1_mod")(temb)

        vid_n = nn.LayerNorm(epsilon=1e-5, name="norm1")(vid) * (1 + scale) + shift
        txt_n = nn.LayerNorm(epsilon=1e-5, name="norm1_txt")(txt) * (1 + t_scale) + t_shift

        x = jnp.concatenate([txt_n, vid_n], axis=1)
        b, n, _ = x.shape
        qkv = nn.Dense(self.dim * 3, name="qkv")(x).reshape(
            b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if rope is not None:
            cos, sin = rope
            txt_len = txt.shape[1]
            # rotate only the video part (text positions unrotated)
            qv = apply_rope(q[:, txt_len:], cos, sin)
            kv_ = apply_rope(k[:, txt_len:], cos, sin)
            q = jnp.concatenate([q[:, :txt_len], qv], axis=1)
            k = jnp.concatenate([k[:, :txt_len], kv_], axis=1)
        attn = dot_product_attention(q, k, v, impl=self.attn_impl)
        attn = nn.Dense(self.dim, name="proj")(attn.reshape(b, n, self.dim))
        txt_len = txt.shape[1]
        txt = txt + t_gate * attn[:, :txt_len]
        vid = vid + gate * attn[:, txt_len:]

        (shift2, scale2, gate2, t_shift2, t_scale2, t_gate2) = LayerNormZero(
            self.dim, name="norm2_mod")(temb)
        vid_n = nn.LayerNorm(epsilon=1e-5, name="norm2")(vid) * (1 + scale2) + shift2
        txt_n = nn.LayerNorm(epsilon=1e-5, name="norm2_txt")(txt) * (1 + t_scale2) + t_shift2
        x = jnp.concatenate([txt_n, vid_n], axis=1)
        h = nn.Dense(self.dim * 4, name="ff_in")(x)
        h = nn.Dense(self.dim, name="ff_out")(nn.gelu(h, approximate=True))
        txt = txt + t_gate2 * h[:, :txt_len]
        vid = vid + gate2 * h[:, txt_len:]
        return vid, txt


class CogVideoX(FastGenNetwork):
    """(ref ``CogVideoX/network.py:348``). Latents [B, T, H, W, C]."""

    dim: int = 1920
    num_layers: int = 30
    num_heads: int = 30
    in_channels: int = 16
    patch_size: int = 2
    text_dim: int = 4096
    use_rotary: bool = False          # 2B: learned pos emb; 5B: 3D RoPE
    max_text_len: int = 226
    sample_frames: int = 13
    sample_height: int = 60
    sample_width: int = 90
    attn_impl: Optional[str] = None
    net_pred_type: str = "v"
    schedule_type: str = "cogvideox"

    def setup(self):
        p = self.patch_size
        self.patch_embed = nn.Conv(self.dim, (p, p), strides=(p, p),
                                   padding="VALID", name="patch_embed")
        self.text_proj = nn.Dense(self.dim, name="text_proj")
        self.time_embed = FourierTimeEmbedding(self.dim, name="time_embed")
        self.blocks = [CogVideoXBlock(self.dim, self.num_heads, self.attn_impl,
                                      name=f"blocks_{i}")
                       for i in range(self.num_layers)]
        self.norm_final = nn.LayerNorm(epsilon=1e-5, name="norm_final")
        self.norm_out_mod = nn.Dense(2 * self.dim, kernel_init=nn.initializers.zeros,
                                     name="norm_out_mod")
        self.norm_out = nn.LayerNorm(epsilon=1e-5, name="norm_out")
        self.proj_out = nn.Dense(p * p * self.in_channels, name="proj_out")
        if not self.use_rotary:
            max_tokens = (self.sample_frames
                          * (self.sample_height // p) * (self.sample_width // p))
            self.pos_embed = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (1, max_tokens, self.dim))
        else:
            head_dim = self.dim // self.num_heads
            self._rope_tables, self._rope_splits = _rope_freqs(head_dim, 1024)

    def __call__(self, x_t, t, condition=None, r=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (),
                 return_logvar: bool = False,
                 fwd_pred_type: Optional[str] = None,
                 train: bool = False, **kwargs):
        if return_features_early and not feature_indices:
            return []
        if fwd_pred_type is not None:
            assert fwd_pred_type in NET_PRED_TYPES
        b, f, h, w, c = x_t.shape
        p = self.patch_size
        hp, wp = h // p, w // p

        text_embeds = (condition.get("text_embeds") if isinstance(condition, dict)
                       else condition)
        if text_embeds is None:
            text_embeds = jnp.zeros((b, 1, self.text_dim), x_t.dtype)

        vid = self.patch_embed(x_t.reshape(b * f, h, w, c))
        vid = vid.reshape(b, f * hp * wp, self.dim)
        if not self.use_rotary:
            vid = vid + self.pos_embed[:, : vid.shape[1]].astype(vid.dtype)
            rope = None
        else:
            rope = _build_rope(self._rope_tables, self._rope_splits, f, hp, wp)
        txt = self.text_proj(text_embeds)

        t_scaled = self.noise_scheduler.rescale_t(t)
        temb = self.time_embed(t_scaled)

        features = []
        for idx, block in enumerate(self.blocks):
            vid, txt = block(vid, txt, temb, rope=rope)
            if idx in feature_indices:
                features.append(vid.reshape(b, f, hp, wp, self.dim))
            if return_features_early and len(features) == len(feature_indices):
                return features
        if return_features_early:
            return features

        x = self.norm_final(jnp.concatenate([txt, vid], axis=1))
        vid = x[:, txt.shape[1]:]
        mod = self.norm_out_mod(nn.silu(temb))[:, None, :]
        shift, scale = jnp.split(mod, 2, axis=-1)
        vid = self.norm_out(vid) * (1 + scale) + shift
        vid = self.proj_out(vid)
        out = vid.reshape(b, f, hp, wp, p, p, c)
        out = out.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, f, h, w, c)

        out = self.noise_scheduler.convert_model_output(
            x_t, out, t, src_pred_type=self.net_pred_type,
            target_pred_type=fwd_pred_type or self.net_pred_type)
        result = out if not feature_indices else [out, features]
        if return_logvar:
            logvar = nn.Dense(1, name="logvar_linear")(temb)
            return result, logvar
        return result

    def sample(self, noise, condition=None, neg_condition=None,
               guidance_scale: Optional[float] = 6.0, num_steps: int = 50,
               solver: str = "euler", **kwargs):
        """DDIM-style x0-stepping with CFG; ``solver="dpm2m"`` switches to
        the second-order multistep (the reference uses DPM here,
        ``CogVideoX/network.py:584``)."""
        ns = self.noise_scheduler
        t_list = np.linspace(ns.max_t, 0.0, num_steps + 1)
        if solver == "dpm2m":
            from fastgen_tpu.ops.solvers import dpm_solver_2m

            use_cfg_ms = (guidance_scale is not None and guidance_scale > 1.0
                          and neg_condition is not None)

            def x0_fn(x, t_cur):
                tb = jnp.full((x.shape[0],), t_cur, jnp.float32)
                x0 = self(x, tb, condition=condition, fwd_pred_type="x0")
                if use_cfg_ms:
                    x0_neg = self(x, tb, condition=neg_condition,
                                  fwd_pred_type="x0")
                    x0 = x0_neg + guidance_scale * (x0 - x0_neg)
                return x0

            return dpm_solver_2m(x0_fn, ns, noise, t_list)
        x = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        use_cfg = (guidance_scale is not None and guidance_scale > 1.0
                   and neg_condition is not None)
        b = x.shape[0]
        for t_cur, t_next in zip(t_list[:-1], t_list[1:]):
            tb = jnp.full((b,), t_cur, jnp.float32)
            x0 = self(x, tb, condition=condition, fwd_pred_type="x0")
            if use_cfg:
                x0_neg = self(x, tb, condition=neg_condition, fwd_pred_type="x0")
                x0 = x0_neg + guidance_scale * (x0 - x0_neg)
            if t_next > 0:
                eps = ns.x0_to_eps(x, x0, tb)
                x = ns.forward_process(x0, eps, jnp.full((b,), t_next, jnp.float32))
            else:
                x = x0
        return x
