"""CogVideoX video DiT in flax.linen (ref ``fastgen/networks/CogVideoX/network.py``;
the reference wraps diffusers' ``CogVideoXTransformer3DModel`` and patches
``classify_forward``/``block_forward_kwargs`` for feature taps,
``CogVideoX/network.py:64-244``).

Native build with checkpoint-level structural parity to the diffusers model:

* per-frame 2D patchify (``patch_embed.proj`` conv) + text projection
  (``patch_embed.text_proj``); text tokens prepended to the joint sequence
* 2B: 3D sin-cos positional embedding (non-persistent buffer in diffusers —
  recomputed here, with the same 1.875 spatial interpolation scale);
  ``norm_final`` applied to the video tokens only (ref ``:160-162``)
* 5B: 3D RoPE with CogVideoX's head-dim split (d/4, 3d/8, 3d/8) in the
  interleaved-pair convention; concat-then-norm-final (ref ``:163-167``)
* blocks: CogVideoXLayerNormZero (one shared affine LayerNorm for both
  streams + SiLU-Dense 6-way modulation from the 512-dim temb), fused-QKV
  joint attention with per-head LayerNorm qk-norm, gelu-tanh FFN
* sinusoidal time features at inner_dim -> 2-layer MLP to time_embed_dim=512
  (diffusers ``time_proj``/``time_embedding``)
* final AdaLayerNorm (shift/scale from temb) + linear unpatchify head

v-prediction on the cogvideox (zero-SNR rescaled) schedule; the T5 text
encoder consumes precomputed embeddings (latent-loader path).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.dit.network import FourierTimeEmbedding
from fastgen_tpu.networks.network import FastGenNetwork
from fastgen_tpu.networks.wan.network import apply_rope
from fastgen_tpu.ops.attention import dot_product_attention
from fastgen_tpu.ops.schedules import NET_PRED_TYPES


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[M] positions -> [M, embed_dim] with sin-first layout (diffusers
    ``get_1d_sincos_pos_embed_from_grid``)."""
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000.0 ** omega
    out = np.outer(pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(embed_dim: int, spatial_size: Tuple[int, int],
                            temporal_size: int,
                            spatial_interpolation_scale: float = 1.875,
                            temporal_interpolation_scale: float = 1.0) -> np.ndarray:
    """CogVideoX-2B positional embedding (diffusers
    ``get_3d_sincos_pos_embed``): 3/4 of the channels carry a 2D spatial
    sin-cos grid, 1/4 a temporal one; returns [T, H*W, embed_dim].
    ``spatial_size`` is (width, height) to match the diffusers argument order.
    """
    dim_spatial = 3 * embed_dim // 4
    dim_temporal = embed_dim // 4
    w, h = spatial_size
    grid_h = np.arange(h, dtype=np.float32) / spatial_interpolation_scale
    grid_w = np.arange(w, dtype=np.float32) / spatial_interpolation_scale
    gw, gh = np.meshgrid(grid_w, grid_h)  # each [h, w]
    # diffusers concatenates emb(grid[0]=w) then emb(grid[1]=h)
    spatial = np.concatenate([_sincos_1d(dim_spatial // 2, gw),
                              _sincos_1d(dim_spatial // 2, gh)], axis=1)
    grid_t = np.arange(temporal_size, dtype=np.float32) / temporal_interpolation_scale
    temporal = _sincos_1d(dim_temporal, grid_t)
    spatial = np.repeat(spatial[np.newaxis], temporal_size, axis=0)     # [T, HW, ds]
    temporal = np.repeat(temporal[:, np.newaxis], h * w, axis=1)        # [T, HW, dt]
    return np.concatenate([temporal, spatial], axis=-1)


def _cogvideox_rope(head_dim: int, f: int, h: int, w: int,
                    theta: float = 10000.0):
    """CogVideoX-5B 3D RoPE tables [N, head_dim/2] in per-pair (interleaved)
    convention (diffusers ``get_3d_rotary_pos_embed`` + CogVideoX attention's
    ``use_real_unbind_dim=-1``, which ``apply_rope`` implements). Head-dim
    split: t d/4, h 3d/8, w 3d/8."""
    assert head_dim % 16 == 0, (
        f"CogVideoX 3D RoPE needs head_dim % 16 == 0 (d/4 + 3d/8 + 3d/8 even "
        f"splits); got {head_dim}")
    d_t = head_dim // 4
    d_h = head_dim // 8 * 3
    d_w = head_dim // 8 * 3
    cos_list, sin_list = [], []
    for size, d, axis in ((f, d_t, 0), (h, d_h, 1), (w, d_w, 2)):
        freqs = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        ang = np.outer(np.arange(size, dtype=np.float64), freqs)  # [size, d/2]
        shape = [1, 1, 1, ang.shape[-1]]
        shape[axis] = size
        reps = [f, h, w, 1]
        reps[axis] = 1
        cos_list.append(np.tile(np.cos(ang).reshape(shape), reps))
        sin_list.append(np.tile(np.sin(ang).reshape(shape), reps))
    cos = np.concatenate(cos_list, axis=-1).reshape(f * h * w, -1)
    sin = np.concatenate(sin_list, axis=-1).reshape(f * h * w, -1)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


class LayerNormZero(nn.Module):
    """CogVideoXLayerNormZero: one shared affine LayerNorm for video+text plus
    SiLU-Dense 6-way modulation; chunk order (shift, scale, gate, t_shift,
    t_scale, t_gate) as in diffusers."""

    dim: int

    @nn.compact
    def __call__(self, vid, txt, temb):
        mod = nn.Dense(6 * self.dim, name="lin")(nn.silu(temb))[:, None, :]
        shift, scale, gate, t_shift, t_scale, t_gate = jnp.split(mod, 6, axis=-1)
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        vid = norm(vid) * (1 + scale) + shift
        txt = norm(txt) * (1 + t_scale) + t_shift
        return vid, txt, gate, t_gate


class CogVideoXBlock(nn.Module):
    dim: int
    num_heads: int
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, vid, txt, temb, rope=None):
        head_dim = self.dim // self.num_heads
        txt_len = txt.shape[1]
        vid_n, txt_n, gate, t_gate = LayerNormZero(self.dim, name="norm1")(
            vid, txt, temb)

        x = jnp.concatenate([txt_n, vid_n], axis=1)
        b, n, _ = x.shape
        qkv = nn.Dense(self.dim * 3, name="qkv")(x).reshape(
            b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # per-head LayerNorm qk-norm (diffusers Attention qk_norm="layer_norm")
        q = nn.LayerNorm(epsilon=1e-5, name="norm_q")(q)
        k = nn.LayerNorm(epsilon=1e-5, name="norm_k")(k)
        if rope is not None:
            cos, sin = rope
            # rotate only the video part (text positions unrotated)
            qv = apply_rope(q[:, txt_len:], cos, sin)
            kv_ = apply_rope(k[:, txt_len:], cos, sin)
            q = jnp.concatenate([q[:, :txt_len], qv], axis=1)
            k = jnp.concatenate([k[:, :txt_len], kv_], axis=1)
        attn = dot_product_attention(q, k, v, impl=self.attn_impl)
        attn = nn.Dense(self.dim, name="proj")(attn.reshape(b, n, self.dim))
        txt = txt + t_gate * attn[:, :txt_len]
        vid = vid + gate * attn[:, txt_len:]

        vid_n, txt_n, gate2, t_gate2 = LayerNormZero(self.dim, name="norm2")(
            vid, txt, temb)
        x = jnp.concatenate([txt_n, vid_n], axis=1)
        h = nn.Dense(self.dim * 4, name="ff_in")(x)
        h = nn.Dense(self.dim, name="ff_out")(nn.gelu(h, approximate=True))
        txt = txt + t_gate2 * h[:, :txt_len]
        vid = vid + gate2 * h[:, txt_len:]
        return vid, txt


class CogVideoX(FastGenNetwork):
    """(ref ``CogVideoX/network.py:348``). Latents [B, T, H, W, C].

    Defaults match CogVideoX-2B (dim 1920, 30 layers/heads, learned-free
    sincos pos-emb); 5B = dim 3072, 48 heads, 42 layers, ``use_rotary=True``.
    """

    dim: int = 1920
    num_layers: int = 30
    num_heads: int = 30
    in_channels: int = 16
    patch_size: int = 2
    text_dim: int = 4096
    time_embed_dim: int = 512
    use_rotary: bool = False          # 2B: sincos pos emb; 5B: 3D RoPE
    max_text_len: int = 226
    sample_frames: int = 13
    sample_height: int = 60
    sample_width: int = 90
    spatial_interpolation_scale: float = 1.875
    temporal_interpolation_scale: float = 1.0
    attn_impl: Optional[str] = None
    net_pred_type: str = "v"
    schedule_type: str = "cogvideox"

    def setup(self):
        p = self.patch_size
        self.patch_embed = nn.Conv(self.dim, (p, p), strides=(p, p),
                                   padding="VALID", name="patch_embed")
        self.text_proj = nn.Dense(self.dim, name="text_proj")
        # diffusers: Timesteps(inner_dim) -> TimestepEmbedding(inner, 512)
        self.time_embed = FourierTimeEmbedding(self.time_embed_dim,
                                               frequency_dim=self.dim,
                                               name="time_embed")
        self.blocks = [CogVideoXBlock(self.dim, self.num_heads, self.attn_impl,
                                      name=f"blocks_{i}")
                       for i in range(self.num_layers)]
        self.norm_final = nn.LayerNorm(epsilon=1e-5, name="norm_final")
        self.norm_out_mod = nn.Dense(2 * self.dim, name="norm_out_mod")
        self.norm_out = nn.LayerNorm(epsilon=1e-5, name="norm_out")
        self.proj_out = nn.Dense(p * p * self.in_channels, name="proj_out")

    def _pos_embed(self, f: int, hp: int, wp: int) -> jnp.ndarray:
        pe = get_3d_sincos_pos_embed(
            self.dim, (wp, hp), f,
            spatial_interpolation_scale=self.spatial_interpolation_scale,
            temporal_interpolation_scale=self.temporal_interpolation_scale)
        return jnp.asarray(pe.reshape(1, f * hp * wp, self.dim), jnp.float32)

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
            vid = vid + self._pos_embed(f, hp, wp).astype(vid.dtype)
            rope = None
        else:
            rope = _cogvideox_rope(self.dim // self.num_heads, f, hp, wp)
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

        if not self.use_rotary:
            # 2B: norm_final over video tokens only (ref ``:160-162``)
            vid = self.norm_final(vid)
        else:
            # 5B: concat -> norm -> slice (ref ``:163-167``)
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
               solver: str = "euler", use_dynamic_cfg: bool = False, **kwargs):
        """DDIM-style x0-stepping with CFG; ``solver="dpm2m"`` switches to
        the second-order multistep (the reference uses DPM here,
        ``CogVideoX/network.py:584``). ``use_dynamic_cfg`` ramps the scale
        with the CogVideoX cosine schedule
        (``_compute_local_guidance_scale``, ``network.py:576-582``)."""
        import math

        ns = self.noise_scheduler

        def local_scale(step_idx: int) -> Optional[float]:
            if not use_dynamic_cfg:
                return guidance_scale
            g = guidance_scale or 1.0
            # t counts down num_steps -> 0 over the schedule in the reference;
            # step_idx counts up, so (num_steps - t) == step_idx
            return 1 + g * ((1 - math.cos(
                math.pi * (step_idx / num_steps) ** 5.0)) / 2)

        t_list = np.linspace(ns.max_t, 0.0, num_steps + 1)
        if solver == "dpm2m":
            from fastgen_tpu.ops.solvers import dpm_solver_2m

            use_cfg_ms = (guidance_scale is not None and guidance_scale > 1.0
                          and neg_condition is not None)
            # the dynamic CFG schedule is a pure function of the step index:
            # precompute it and gather with the traced index inside the scan
            scale_table = jnp.asarray([local_scale(i)
                                       for i in range(len(t_list))], jnp.float32)

            def x0_fn(x, t_cur, step_i):
                tb = jnp.full((x.shape[0],), t_cur, jnp.float32)
                x0 = self(x, tb, condition=condition, fwd_pred_type="x0")
                if use_cfg_ms:
                    x0_neg = self(x, tb, condition=neg_condition,
                                  fwd_pred_type="x0")
                    g = scale_table[jnp.asarray(step_i, jnp.int32)]
                    x0 = x0_neg + g * (x0 - x0_neg)
                return x0

            return dpm_solver_2m(x0_fn, ns, noise, t_list)
        x = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        use_cfg = (guidance_scale is not None and guidance_scale > 1.0
                   and neg_condition is not None)
        b = x.shape[0]
        scales = jnp.asarray([local_scale(i) for i in range(len(t_list) - 1)],
                             jnp.float32)

        # lax.scan over the schedule: one compiled step, O(1) HLO in
        # num_steps (see EDMPrecond.sample); the dynamic CFG schedule is a
        # gather from a precomputed per-step table
        def step(x, sc):
            i, pair = sc
            t_cur, t_next = pair[0], pair[1]
            tb = jnp.full((b,), t_cur, jnp.float32)
            x0 = self(x, tb, condition=condition, fwd_pred_type="x0")
            if use_cfg:
                x0_neg = self(x, tb, condition=neg_condition, fwd_pred_type="x0")
                x0 = x0_neg + scales[i] * (x0 - x0_neg)
            eps = ns.x0_to_eps(x, x0, tb)
            x_fwd = ns.forward_process(x0, eps, jnp.full((b,), t_next, jnp.float32))
            # final step (t_next == 0) lands on the clean prediction
            return jnp.where(t_next > 0, x_fwd, x0), None

        t_arr = jnp.asarray(t_list, jnp.float32)
        x, _ = jax.lax.scan(
            step, x, (jnp.arange(len(t_list) - 1, dtype=jnp.int32),
                      jnp.stack([t_arr[:-1], t_arr[1:]], axis=1)))
        return x
