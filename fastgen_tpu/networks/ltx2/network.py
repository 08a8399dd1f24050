"""LTX-2 audio-video DiT (flax).

TPU-native counterpart of the reference's in-tree LTX2 stack
(``fastgen/networks/LTX2/network.py:380`` wrapping the vendored
``transformer_ltx2.py:791``). The reference trains **video-only**
(``audio_enabled=False`` — ``network.py:440``), but its transformer carries
the full audio-visual architecture; this port implements both:

* latents are **packed** to tokens host-side (``network.py:46-83``
  ``_pack_latents``/``_unpack_latents``) and projected with a Linear
  ``proj_in`` — no conv patch embedding;
* **AdaLN-single** (``transformer_ltx2.py:101-137``): one shared modulation
  MLP; per-block learned ``scale_shift_table`` offsets; timestep may be
  **per-token** (diffusion forcing), reshaped ``[B, N', 6, D]``;
* blocks (``transformer_ltx2.py:290-608``): RMSNorm (no affine) -> RoPE
  self-attention with qk RMSNorm-across-heads and biases -> unmodulated text
  cross-attention -> [audio self/cross + a2v/v2a audio-video cross-attention
  with per-layer 5-param modulation tables] -> gated FFN;
* **LTX2 RoPE** (``transformer_ltx2.py:611-789``): token coords in *seconds /
  pixels* (fps-aware, causal offset), normalized by
  ``(base_num_frames, base_height, base_width)``, frequencies
  ``theta**linspace(0,1) * pi/2`` against ``2*grid-1``, freq-major /
  axis-minor interleaving, applied on the **flat inner dim before the head
  split** (``:38-43`` interleaved, ``:46-81`` split);
* cross-modal (a2v / v2a) attention uses **time-only** RoPE for both
  modalities so audio and video tokens align on the seconds axis
  (``transformer_ltx2.py:1057-1062``);
* output: 2-param scale-shift + affine-free LayerNorm + ``proj_out``
  (``transformer_ltx2.py:1184-1199``); optional ``logvar_linear`` head the
  reference adds for sCM/distillation (``network.py:460``);
* ``feature_indices`` taps mirror ``classify_forward`` (``network.py:144``);
* sampling implements the pipeline's dynamic flow shift
  (``pipeline_ltx2.py:85-97`` ``calculate_shift``) and guidance rescale
  (``pipeline_ltx2.py:136-142``).

Caption projection expects Gemma3-connector embeddings (3840-d at full size,
``caption_channels``); any ``condition["text_embeds"]`` of that width works —
precomputed embeddings or the offline stand-ins.

Weight layout maps 1:1 onto the diffusers ``LTX2VideoTransformer3DModel``
state dict via ``fastgen_tpu/utils/torch_convert.py::convert_ltx2``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.network import FastGenNetwork
from fastgen_tpu.networks.wan.network import RMSNorm, sinusoidal_embedding_1d
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


def pack_audio_latents(x):
    """[B, L, M, C] audio latents -> [B, L, M*C] tokens (ref
    ``pipeline_ltx2.py:503-518``, unpatched path: ``transpose(1,2).flatten``
    of [B,C,L,M]; channels-last here)."""
    b, l, m, c = x.shape
    return x.reshape(b, l, m * c)


def unpack_audio_latents(tokens, num_mel_bins: int):
    """Inverse of :func:`pack_audio_latents` (ref ``pipeline_ltx2.py:519-533``)."""
    b, l, mc = tokens.shape
    return tokens.reshape(b, l, num_mel_bins, mc // num_mel_bins)


# --------------------------------------------------------------------- RoPE


def prepare_video_coords(num_frames: int, height: int, width: int,
                         patch_size: int = 1, patch_size_t: int = 1,
                         scale_factors: Tuple[int, int, int] = (8, 32, 32),
                         causal_offset: int = 1, fps: float = 24.0):
    """Token coords [3, N, 2] (start/end) in (seconds, px, px) — ref
    ``transformer_ltx2.py:663-694`` without the batch dim (coords are
    data-independent)."""
    gf = np.arange(0, num_frames, patch_size_t, dtype=np.float32)
    gh = np.arange(0, height, patch_size, dtype=np.float32)
    gw = np.arange(0, width, patch_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(gf, gh, gw, indexing="ij"), axis=0)  # [3,F,H,W]
    delta = np.asarray([patch_size_t, patch_size, patch_size],
                       np.float32).reshape(3, 1, 1, 1)
    coords = np.stack([grid, grid + delta], axis=-1).reshape(3, -1, 2)
    scale = np.asarray(scale_factors, np.float32).reshape(3, 1, 1)
    coords = coords * scale
    # first-frame causal offset, then latent frames -> seconds (ref :691-692)
    coords[0] = np.clip(coords[0] + causal_offset - scale_factors[0], 0, None)
    coords[0] = coords[0] / fps
    return coords


def prepare_audio_coords(num_frames: int, patch_size_t: int = 1,
                         audio_scale_factor: int = 4, causal_offset: int = 1,
                         sampling_rate: int = 16000, hop_length: int = 160,
                         shift: int = 0):
    """Audio-token coords [1, N, 2] in seconds (ref
    ``transformer_ltx2.py:696-719``)."""
    gf = np.arange(shift, num_frames + shift, patch_size_t, dtype=np.float32)
    start = np.clip(gf * audio_scale_factor + causal_offset
                    - audio_scale_factor, 0, None)
    end = np.clip((gf + patch_size_t) * audio_scale_factor + causal_offset
                  - audio_scale_factor, 0, None)
    sec = np.float32(hop_length) / np.float32(sampling_rate)
    return np.stack([start * sec, end * sec], axis=-1).astype(np.float32)[None]  # [1, N, 2]


def ltx2_rope(coords, dim: int, max_positions, theta: float = 10000.0,
              rope_type: str = "interleaved", num_heads: Optional[int] = None):
    """LTX2 rotary tables from [A, N, 2] start/end coords (ref
    ``transformer_ltx2.py:727-788``).

    interleaved -> cos/sin [N, dim] for the flat inner dim;
    split       -> cos/sin [num_heads, N, (dim//2)//num_heads].
    """
    a, n, _ = coords.shape
    mid = coords.mean(axis=-1)                                   # [A, N]
    grid = np.stack([mid[i] / max_positions[i] for i in range(a)], -1)  # [N,A]
    num_rope_elems = a * 2
    n_freqs = dim // num_rope_elems
    pow_indices = np.power(theta, np.linspace(0.0, 1.0, n_freqs))
    freqs = (pow_indices * np.pi / 2.0).astype(np.float32)       # [F]
    ang = (grid.astype(np.float32)[..., None] * 2.0 - 1.0) * freqs  # [N,A,F]
    ang = ang.transpose(0, 2, 1).reshape(n, -1)                  # freq-major
    if rope_type == "interleaved":
        cos = np.repeat(np.cos(ang), 2, axis=-1)
        sin = np.repeat(np.sin(ang), 2, axis=-1)
        pad = dim % num_rope_elems
        if pad:
            cos = np.concatenate([np.ones((n, pad), np.float32), cos], -1)
            sin = np.concatenate([np.zeros((n, pad), np.float32), sin], -1)
    elif rope_type == "split":
        assert num_heads is not None
        cos, sin = np.cos(ang), np.sin(ang)
        pad = dim // 2 - ang.shape[-1]
        if pad:
            cos = np.concatenate([np.ones((n, pad), np.float32), cos], -1)
            sin = np.concatenate([np.zeros((n, pad), np.float32), sin], -1)
        cos = cos.reshape(n, num_heads, -1).swapaxes(0, 1)       # [H,N,hd/2]
        sin = sin.reshape(n, num_heads, -1).swapaxes(0, 1)
    else:
        raise ValueError(f"rope_type {rope_type!r} not in (interleaved, split)")
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def apply_interleaved_rope(x, cos, sin):
    """x [B,N,C] flat inner dim; cos/sin [N,C] (ref
    ``transformer_ltx2.py:38-43``)."""
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*x.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(xf.shape)
    out = xf * cos[None] + rot * sin[None]
    return out.astype(x.dtype)


def apply_split_rope(x, cos, sin):
    """x [B,N,H,hd]; cos/sin [H,N,hd/2] — first/second half-dim rotation
    (ref ``transformer_ltx2.py:46-81``)."""
    b, n, h, hd = x.shape
    xf = x.astype(jnp.float32).transpose(0, 2, 1, 3)             # [B,H,N,hd]
    x1, x2 = xf[..., :hd // 2], xf[..., hd // 2:]
    c = cos[None]
    s = sin[None]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.transpose(0, 2, 1, 3).astype(x.dtype)


def calculate_shift(seq_len: int, base_seq_len: int = 256,
                    max_seq_len: int = 4096, base_shift: float = 0.5,
                    max_shift: float = 1.15) -> float:
    """Dynamic flow-shift mu from the video token count (ref
    ``pipeline_ltx2.py:85-97``)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    return seq_len * m + (base_shift - m * base_seq_len)


def shift_sigmas(sigmas, mu: float):
    """FlowMatch dynamic shifting: sigma' = e^mu / (e^mu + (1/s - 1))."""
    e = math.exp(mu)
    return e / (e + (1.0 / np.clip(sigmas, 1e-9, None) - 1.0))


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale: float = 0.0):
    """CFG std rescale (ref ``pipeline_ltx2.py:136-142``)."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg


def normalize_latents(x, mean, std, scaling_factor: float = 1.0):
    """Per-channel latent normalization (ref ``pipeline_ltx2.py:465-472``;
    channels-last here)."""
    return (x - mean) * scaling_factor / std


def denormalize_latents(x, mean, std, scaling_factor: float = 1.0):
    return x * std / scaling_factor + mean


# ------------------------------------------------------------------ modules


class LTX2AdaLNSingle(nn.Module):
    """Shared timestep-modulation MLP (ref ``transformer_ltx2.py:101-137``):
    sinusoidal t -> SiLU MLP -> ``num_mod_params * dim`` values."""

    dim: int
    num_mod_params: int = 6
    t_scale: float = 1000.0

    @nn.compact
    def __call__(self, t_tokens):
        # t_tokens: [B, N'] (N'=1 for homogeneous t, N tokens for forcing)
        emb = sinusoidal_embedding_1d(256, t_tokens.reshape(-1) * self.t_scale)
        emb = nn.Dense(self.dim, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, name="linear_2")(emb)
        proj = nn.Dense(self.num_mod_params * self.dim, name="linear")(nn.silu(emb))
        b, n = t_tokens.shape
        return (emb.reshape(b, n, self.dim),
                proj.reshape(b, n, self.num_mod_params, self.dim))


class LTX2Attention(nn.Module):
    """RoPE self-/cross-attention with qk RMSNorm-across-heads and biases
    (ref ``transformer_ltx2.py:215-288``). ``inner_dim`` may differ from the
    query/output width (a2v / v2a cross-modal attention runs at the audio
    inner dim, ``transformer_ltx2.py:394-418``). RoPE applies on the flat
    inner dim before the head split (interleaved) or per head (split)."""

    num_heads: int
    head_dim: int
    out_dim: int
    rope_type: str = "interleaved"
    attn_impl: Optional[str] = None

    @property
    def inner_dim(self):
        return self.num_heads * self.head_dim

    def setup(self):
        self.to_q = nn.Dense(self.inner_dim, use_bias=True, name="to_q")
        self.to_k = nn.Dense(self.inner_dim, use_bias=True, name="to_k")
        self.to_v = nn.Dense(self.inner_dim, use_bias=True, name="to_v")
        self.to_out = nn.Dense(self.out_dim, use_bias=True, name="to_out")
        self.norm_q = RMSNorm(self.inner_dim, name="norm_q")
        self.norm_k = RMSNorm(self.inner_dim, name="norm_k")

    def __call__(self, x, context=None, q_rope=None, k_rope=None):
        kv_src = x if context is None else context
        q = self.norm_q(self.to_q(x))
        k = self.norm_k(self.to_k(kv_src))
        v = self.to_v(kv_src)
        b, nq, _ = q.shape
        nk = k.shape[1]
        # keys rotate with q's tables only for self-attention; cross-attention
        # keys rotate only when the caller supplies k-specific tables
        # (q-only RoPE on cross-attn = k_rope stays None)
        if k_rope is None and context is None:
            k_rope = q_rope
        if q_rope is not None and self.rope_type == "interleaved":
            q = apply_interleaved_rope(q, *q_rope)
            if k_rope is not None:
                k = apply_interleaved_rope(k, *k_rope)
        q = q.reshape(b, nq, self.num_heads, self.head_dim)
        k = k.reshape(b, nk, self.num_heads, self.head_dim)
        v = v.reshape(b, nk, self.num_heads, self.head_dim)
        if q_rope is not None and self.rope_type == "split":
            q = apply_split_rope(q, *q_rope)
            if k_rope is not None:
                k = apply_split_rope(k, *k_rope)
        out = dot_product_attention(q, k, v, impl=self.attn_impl)
        return self.to_out(out.reshape(b, nq, self.inner_dim))


def _randn_table(shape, scale=None):
    def init(key, s):
        w = jax.random.normal(key, s)
        return w / s[-1] ** 0.5 if scale == "rsqrt" else w
    return init


class LTX2Block(nn.Module):
    """Audio-video transformer block (ref ``transformer_ltx2.py:290-608``).
    ``audio_dim=None`` builds the video-only block the reference trains with
    (``network.py:440`` audio_enabled=False)."""

    dim: int
    num_heads: int
    head_dim: int
    ffn_mult: int = 4
    audio_dim: Optional[int] = None
    audio_num_heads: Optional[int] = None
    audio_head_dim: Optional[int] = None
    rope_type: str = "interleaved"
    attn_impl: Optional[str] = None

    def setup(self):
        d, h, hd = self.dim, self.num_heads, self.head_dim
        self.norm1 = RMSNorm(d, elementwise_affine=False, name="norm1")
        self.attn1 = LTX2Attention(h, hd, d, self.rope_type, self.attn_impl,
                                   name="attn1")
        self.norm2 = RMSNorm(d, elementwise_affine=False, name="norm2")
        self.attn2 = LTX2Attention(h, hd, d, self.rope_type, self.attn_impl,
                                   name="attn2")
        self.norm3 = RMSNorm(d, elementwise_affine=False, name="norm3")
        self.ff_in = nn.Dense(self.ffn_mult * d, name="ff_in")
        self.ff_out = nn.Dense(d, name="ff_out")
        self.scale_shift_table = self.param(
            "scale_shift_table", _randn_table(None, "rsqrt"), (6, d))

        if self.audio_dim is not None:
            ad, ah, ahd = self.audio_dim, self.audio_num_heads, self.audio_head_dim
            self.audio_norm1 = RMSNorm(ad, elementwise_affine=False,
                                       name="audio_norm1")
            self.audio_attn1 = LTX2Attention(ah, ahd, ad, self.rope_type,
                                             self.attn_impl, name="audio_attn1")
            self.audio_norm2 = RMSNorm(ad, elementwise_affine=False,
                                       name="audio_norm2")
            self.audio_attn2 = LTX2Attention(ah, ahd, ad, self.rope_type,
                                             self.attn_impl, name="audio_attn2")
            # a2v: Q=video, K/V=audio; v2a: Q=audio, K/V=video — both run at
            # the audio inner dim (ref transformer_ltx2.py:394-418)
            self.audio_to_video_norm = RMSNorm(d, elementwise_affine=False,
                                               name="audio_to_video_norm")
            self.audio_to_video_attn = LTX2Attention(
                ah, ahd, d, self.rope_type, self.attn_impl,
                name="audio_to_video_attn")
            self.video_to_audio_norm = RMSNorm(ad, elementwise_affine=False,
                                               name="video_to_audio_norm")
            self.video_to_audio_attn = LTX2Attention(
                ah, ahd, ad, self.rope_type, self.attn_impl,
                name="video_to_audio_attn")
            # per-layer cross-attn modulation (5 = 4 scale/shift + 1 gate,
            # plain randn init — ref transformer_ltx2.py:421-422)
            self.video_a2v_ca_table = self.param(
                "video_a2v_ca_table", _randn_table(None), (5, d))
            self.audio_a2v_ca_table = self.param(
                "audio_a2v_ca_table", _randn_table(None), (5, ad))
            self.audio_norm3 = RMSNorm(ad, elementwise_affine=False,
                                       name="audio_norm3")
            self.audio_ff_in = nn.Dense(self.ffn_mult * ad, name="audio_ff_in")
            self.audio_ff_out = nn.Dense(ad, name="audio_ff_out")
            self.audio_scale_shift_table = self.param(
                "audio_scale_shift_table", _randn_table(None, "rsqrt"), (6, ad))

    def _mod(self, table, temb_proj):
        ada = table[None, None].astype(jnp.float32) + temb_proj.astype(jnp.float32)
        return [a.squeeze(2) for a in jnp.split(ada, table.shape[0], axis=2)]

    def __call__(self, x, temb_proj, context, rope, audio=None,
                 audio_temb_proj=None, audio_context=None, audio_rope=None,
                 ca_video_rope=None, ca_audio_rope=None,
                 temb_ca_video=None, temb_ca_audio=None,
                 temb_ca_video_gate=None, temb_ca_audio_gate=None):
        # temb_proj: [B, N', 6, D] with N' in {1, N} (per-token forcing)
        run_audio = self.audio_dim is not None and audio is not None
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = self._mod(self.scale_shift_table,
                                                     temb_proj)
        # 1. video self-attention
        xn = self.norm1(x).astype(jnp.float32) * (1 + scale_msa) + shift_msa
        x = x + (self.attn1(xn.astype(x.dtype), q_rope=rope).astype(jnp.float32)
                 * gate_msa).astype(x.dtype)

        if run_audio:
            (a_shift_msa, a_scale_msa, a_gate_msa,
             a_shift_mlp, a_scale_mlp, a_gate_mlp) = self._mod(
                self.audio_scale_shift_table, audio_temb_proj)
            an = (self.audio_norm1(audio).astype(jnp.float32) * (1 + a_scale_msa)
                  + a_shift_msa)
            audio = audio + (self.audio_attn1(an.astype(audio.dtype),
                                              q_rope=audio_rope)
                             .astype(jnp.float32) * a_gate_msa).astype(audio.dtype)

        # 2. text cross-attention (unmodulated — ref :504-523)
        x = x + self.attn2(self.norm2(x), context=context)
        if run_audio and audio_context is not None:
            audio = audio + self.audio_attn2(self.audio_norm2(audio),
                                             context=audio_context)

        # 3. audio<->video cross-attention (ref :525-594)
        if run_audio:
            xn_av = self.audio_to_video_norm(x).astype(jnp.float32)
            an_av = self.video_to_audio_norm(audio).astype(jnp.float32)
            (v_a2v_scale, v_a2v_shift, v_v2a_scale, v_v2a_shift, v_gate
             ) = self._mod(self.video_a2v_ca_table,
                           jnp.concatenate([temb_ca_video, temb_ca_video_gate],
                                           axis=2))
            (a_a2v_scale, a_a2v_shift, a_v2a_scale, a_v2a_shift, a_gate
             ) = self._mod(self.audio_a2v_ca_table,
                           jnp.concatenate([temb_ca_audio, temb_ca_audio_gate],
                                           axis=2))
            # a2v: video tokens attend to audio tokens
            q_v = (xn_av * (1 + v_a2v_scale) + v_a2v_shift).astype(x.dtype)
            kv_a = (an_av * (1 + a_a2v_scale) + a_a2v_shift).astype(audio.dtype)
            x = x + (v_gate * self.audio_to_video_attn(
                q_v, context=kv_a, q_rope=ca_video_rope,
                k_rope=ca_audio_rope).astype(jnp.float32)).astype(x.dtype)
            # v2a: audio tokens attend to video tokens
            q_a = (an_av * (1 + a_v2a_scale) + a_v2a_shift).astype(audio.dtype)
            kv_v = (xn_av * (1 + v_v2a_scale) + v_v2a_shift).astype(x.dtype)
            audio = audio + (a_gate * self.video_to_audio_attn(
                q_a, context=kv_v, q_rope=ca_audio_rope,
                k_rope=ca_video_rope).astype(jnp.float32)).astype(audio.dtype)

        # 4. feedforward
        xn = self.norm3(x).astype(jnp.float32) * (1 + scale_mlp) + shift_mlp
        y = self.ff_out(nn.gelu(self.ff_in(xn.astype(x.dtype)), approximate=True))
        x = x + (y.astype(jnp.float32) * gate_mlp).astype(x.dtype)
        if run_audio:
            an = (self.audio_norm3(audio).astype(jnp.float32)
                  * (1 + a_scale_mlp) + a_shift_mlp)
            ay = self.audio_ff_out(nn.gelu(self.audio_ff_in(an.astype(audio.dtype)),
                                           approximate=True))
            audio = audio + (ay.astype(jnp.float32) * a_gate_mlp).astype(audio.dtype)
        return (x, audio) if run_audio else (x, None)


class LTX2VideoDiT(FastGenNetwork):
    """LTX-2 transformer (ref ``transformer_ltx2.py:791-1203``). Video-only by
    default (the reference's training configuration); set
    ``audio_enabled=True`` for the full audio-visual architecture."""

    in_channels: int = 128           # packed latent channels
    out_channels: int = 128
    patch_size: int = 1
    patch_size_t: int = 1
    num_heads: int = 32
    head_dim: int = 128
    num_layers: int = 48
    caption_channels: int = 3840     # Gemma3 connector width
    ffn_mult: int = 4
    rope_max_seq_len: int = 4096     # kept for config compat (unused)
    enable_logvar_linear: bool = True
    attn_impl: Optional[str] = None
    remat: bool = False

    # RoPE geometry (ref transformer_ltx2.py:826-863 defaults)
    rope_type: str = "interleaved"
    rope_theta: float = 10000.0
    causal_offset: int = 1
    base_num_frames: int = 20        # seconds
    base_height: int = 2048
    base_width: int = 2048
    vae_scale_factors: Tuple[int, int, int] = (8, 32, 32)
    fps: float = 24.0
    timestep_scale_multiplier: float = 1000.0
    cross_attn_timestep_scale_multiplier: float = 1000.0

    # audio branch (construction-time gate, ref transformer_ltx2.py:864)
    audio_enabled: bool = False
    audio_in_channels: int = 128
    audio_out_channels: int = 128
    audio_num_heads: int = 32
    audio_head_dim: int = 64
    audio_pos_embed_max_pos: int = 20
    audio_scale_factor: int = 4
    audio_sampling_rate: int = 16000
    audio_hop_length: int = 160

    net_pred_type: str = "flow"
    schedule_type: str = "rf"

    @property
    def dim(self):
        return self.num_heads * self.head_dim

    @property
    def audio_dim(self):
        return self.audio_num_heads * self.audio_head_dim

    @property
    def text_dim(self):
        return self.caption_channels

    def setup(self):
        self.proj_in = nn.Dense(self.dim, name="proj_in")
        self.caption_projection_0 = nn.Dense(self.dim, name="caption_projection_0")
        self.caption_projection_1 = nn.Dense(self.dim, name="caption_projection_1")
        self.time_embed = LTX2AdaLNSingle(
            self.dim, 6, self.timestep_scale_multiplier, name="time_embed")
        block = LTX2Block
        if self.remat:
            block = nn.remat(LTX2Block, static_argnums=())
        a_dim = self.audio_dim if self.audio_enabled else None
        self.blocks = [block(self.dim, self.num_heads, self.head_dim,
                             self.ffn_mult, a_dim,
                             self.audio_num_heads if self.audio_enabled else None,
                             self.audio_head_dim if self.audio_enabled else None,
                             self.rope_type, self.attn_impl, name=f"block_{i}")
                       for i in range(self.num_layers)]
        self.norm_out = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                                     name="norm_out")
        self.proj_out = nn.Dense(self.out_channels *
                                 self.patch_size_t * self.patch_size ** 2,
                                 name="proj_out")
        self.out_scale_shift_table = self.param(
            "out_scale_shift_table", _randn_table(None, "rsqrt"), (2, self.dim))
        self.logvar_linear = (nn.Dense(1, name="logvar_linear")
                              if self.enable_logvar_linear else None)
        if self.audio_enabled:
            ts, cts = (self.timestep_scale_multiplier,
                       self.cross_attn_timestep_scale_multiplier)
            self.audio_proj_in = nn.Dense(self.audio_dim, name="audio_proj_in")
            self.audio_caption_projection_0 = nn.Dense(
                self.audio_dim, name="audio_caption_projection_0")
            self.audio_caption_projection_1 = nn.Dense(
                self.audio_dim, name="audio_caption_projection_1")
            self.audio_time_embed = LTX2AdaLNSingle(
                self.audio_dim, 6, ts, name="audio_time_embed")
            # cross-attn modulation AdaLN heads (ref transformer_ltx2.py:891-902);
            # gates use the cross-attn t scale (ref :1074-1076, :1096-1098)
            self.av_ca_video_ss = LTX2AdaLNSingle(self.dim, 4, ts,
                                                  name="av_ca_video_ss")
            self.av_ca_audio_ss = LTX2AdaLNSingle(self.audio_dim, 4, ts,
                                                  name="av_ca_audio_ss")
            self.av_ca_video_gate = LTX2AdaLNSingle(self.dim, 1, cts,
                                                    name="av_ca_video_gate")
            self.av_ca_audio_gate = LTX2AdaLNSingle(self.audio_dim, 1, cts,
                                                    name="av_ca_audio_gate")
            self.audio_norm_out = nn.LayerNorm(epsilon=1e-6, use_bias=False,
                                               use_scale=False,
                                               name="audio_norm_out")
            self.audio_proj_out = nn.Dense(self.audio_out_channels,
                                           name="audio_proj_out")
            self.audio_out_scale_shift_table = self.param(
                "audio_out_scale_shift_table", _randn_table(None, "rsqrt"),
                (2, self.audio_dim))

    # -------------------------------------------------------------- helpers
    def _video_rope(self, f, hp, wp, fps):
        coords = prepare_video_coords(
            f * self.patch_size_t, hp * self.patch_size, wp * self.patch_size,
            self.patch_size, self.patch_size_t, self.vae_scale_factors,
            self.causal_offset, fps)
        return ltx2_rope(coords, self.dim,
                         (self.base_num_frames, self.base_height, self.base_width),
                         self.rope_theta, self.rope_type, self.num_heads)

    def _audio_rope(self, la):
        coords = prepare_audio_coords(
            la, 1, self.audio_scale_factor, self.causal_offset,
            self.audio_sampling_rate, self.audio_hop_length)
        return ltx2_rope(coords, self.audio_dim,
                         (self.audio_pos_embed_max_pos,),
                         self.rope_theta, self.rope_type, self.audio_num_heads)

    def _cross_ropes(self, f, hp, wp, fps, la):
        """Time-only RoPE at the cross-modal inner dim (audio inner dim), one
        per modality (ref transformer_ltx2.py:941-969, 1057-1062)."""
        base = max(self.base_num_frames, self.audio_pos_embed_max_pos)
        vc = prepare_video_coords(
            f * self.patch_size_t, hp * self.patch_size, wp * self.patch_size,
            self.patch_size, self.patch_size_t, self.vae_scale_factors,
            self.causal_offset, fps)[0:1]
        ac = prepare_audio_coords(
            la, 1, self.audio_scale_factor, self.causal_offset,
            self.audio_sampling_rate, self.audio_hop_length)[0:1]
        v_rope = ltx2_rope(vc, self.audio_dim, (base,), self.rope_theta,
                           self.rope_type, self.audio_num_heads)
        a_rope = ltx2_rope(ac, self.audio_dim, (base,), self.rope_theta,
                           self.rope_type, self.audio_num_heads)
        return v_rope, a_rope

    def _per_token_t(self, t, grid):
        """t [B] | [B, T_latent] -> [B, 1] or [B, N] model-scale timesteps."""
        f, hp, wp = grid
        t = self.noise_scheduler.rescale_t(t).astype(jnp.float32)
        if t.ndim == 1:
            return t[:, None]
        # per-frame t (diffusion forcing) -> per-token
        t = t[:, ::self.patch_size_t]
        return jnp.repeat(t, hp * wp, axis=1)

    # -------------------------------------------------------------- forward
    def __call__(self, x_t, t, condition=None, r=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (),
                 return_logvar: bool = False,
                 fwd_pred_type: Optional[str] = None,
                 skip_layers: Optional[Tuple[int, ...]] = None,
                 audio_latents=None, audio_t=None,
                 train: bool = False, **kwargs):
        """Video denoising forward; when ``audio_latents`` ([B, La, Ma, Ca] or
        pre-packed [B, La, D]) is given on an ``audio_enabled`` net, returns
        ``(video_pred, audio_tokens_pred)``."""
        if fwd_pred_type is not None:
            assert fwd_pred_type in NET_PRED_TYPES
        x_in, t_in = x_t, t

        cond = condition if isinstance(condition, dict) else {}
        text_embeds = (cond.get("text_embeds")
                       if isinstance(condition, dict) else condition)
        if text_embeds is None:
            text_embeds = jnp.zeros((x_t.shape[0], 1, self.caption_channels),
                                    x_t.dtype)
        if audio_latents is None:
            audio_latents = cond.get("audio_latents")
        fps = float(kwargs.get("fps", self.fps))

        b, tt, hh, ww, _ = x_t.shape
        grid = (tt // self.patch_size_t, hh // self.patch_size,
                ww // self.patch_size)
        f, hp, wp = grid
        tokens = self.proj_in(pack_latents(x_t, self.patch_size,
                                           self.patch_size_t))
        rope = self._video_rope(f, hp, wp, fps)

        t_tok = self._per_token_t(t, grid)
        temb, temb_proj = self.time_embed(t_tok)   # [B,N',D], [B,N',6,D]

        context = self.caption_projection_1(
            nn.gelu(self.caption_projection_0(text_embeds), approximate=True))

        run_audio = self.audio_enabled and audio_latents is not None
        audio = audio_rope = audio_context = None
        a_temb = a_temb_proj = None
        ca_v_rope = ca_a_rope = None
        t_ca_v = t_ca_a = t_ca_v_gate = t_ca_a_gate = None
        if run_audio:
            if audio_latents.ndim == 4:
                audio_latents = pack_audio_latents(audio_latents)
            audio = self.audio_proj_in(audio_latents)
            la = audio.shape[1]
            audio_rope = self._audio_rope(la)
            ca_v_rope, ca_a_rope = self._cross_ropes(f, hp, wp, fps, la)
            a_t_tok = (self.noise_scheduler.rescale_t(audio_t)
                       .astype(jnp.float32)[:, None] if audio_t is not None
                       else t_tok[:, :1])
            a_temb, a_temb_proj = self.audio_time_embed(a_t_tok)
            _, t_ca_v = self.av_ca_video_ss(t_tok)
            _, t_ca_a = self.av_ca_audio_ss(a_t_tok)
            _, t_ca_v_gate = self.av_ca_video_gate(t_tok)
            _, t_ca_a_gate = self.av_ca_audio_gate(a_t_tok)
            audio_text = cond.get("audio_text_embeds", text_embeds)
            audio_context = self.audio_caption_projection_1(
                nn.gelu(self.audio_caption_projection_0(audio_text),
                        approximate=True))

        features = []
        x = tokens
        for idx, block in enumerate(self.blocks):
            if skip_layers is not None and idx in skip_layers:
                continue
            x, audio = block(x, temb_proj, context, rope,
                             audio=audio, audio_temb_proj=a_temb_proj,
                             audio_context=audio_context, audio_rope=audio_rope,
                             ca_video_rope=ca_v_rope, ca_audio_rope=ca_a_rope,
                             temb_ca_video=t_ca_v, temb_ca_audio=t_ca_a,
                             temb_ca_video_gate=t_ca_v_gate,
                             temb_ca_audio_gate=t_ca_a_gate)
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

        if run_audio:
            a_shift, a_scale = [a.squeeze(1) for a in jnp.split(
                self.audio_out_scale_shift_table[None, :, None]
                .astype(jnp.float32) + a_temb[:, None].astype(jnp.float32),
                2, axis=1)]
            an = (self.audio_norm_out(audio).astype(jnp.float32)
                  * (1 + a_scale) + a_shift)
            audio_out = self.audio_proj_out(an.astype(audio.dtype))
            out = (out, audio_out)

        result = out if not feature_indices else [out, features]
        # always trace the head so params materialize at init (Dense(1) on the
        # pooled temb is negligible next to the blocks)
        logvar = (self.logvar_linear(temb.mean(axis=1))
                  if self.logvar_linear is not None else None)
        if return_logvar:
            assert logvar is not None, "enable_logvar_linear required"
            return result, logvar
        return result

    # --------------------------------------------------------------- sample
    def sample(self, noise, condition=None, neg_condition=None,
               guidance_scale: Optional[float] = 4.0, num_steps: int = 40,
               solver: str = "euler", guidance_rescale: float = 0.0,
               dynamic_shift: bool = True, **kwargs):
        """Flow sampler with CFG, the pipeline's dynamic sigma shift
        (``pipeline_ltx2.py:85-97`` + FlowMatch ``set_timesteps(mu=...)``) and
        guidance rescale; ``solver="dpm2m"`` for multistep."""
        if solver == "dpm2m":
            from fastgen_tpu.ops.solvers import net_dpm2m_sample

            return net_dpm2m_sample(self, noise, condition, neg_condition,
                                    guidance_scale, num_steps)
        ns = self.noise_scheduler
        t_list = np.linspace(ns.max_t, 0.0, num_steps + 1)
        if dynamic_shift:
            _, tt, hh, ww, _ = noise.shape
            seq_len = (tt // self.patch_size_t) * (hh // self.patch_size) * (
                ww // self.patch_size)
            mu = calculate_shift(seq_len)
            t_list = np.concatenate([shift_sigmas(t_list[:-1] / ns.max_t, mu)
                                     * ns.max_t, [0.0]])
        x = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        use_cfg = (guidance_scale is not None and guidance_scale > 1.0
                   and neg_condition is not None)
        # lax.scan over the schedule: one compiled step, O(1) HLO in
        # num_steps (see EDMPrecond.sample)
        def step(x, pair):
            t_cur, t_next = pair[0], pair[1]
            t_b = jnp.full((x.shape[0],), t_cur, jnp.float32)
            x0 = self(x, t_b, condition=condition, fwd_pred_type="x0")
            if use_cfg:
                x0_neg = self(x, t_b, condition=neg_condition,
                              fwd_pred_type="x0")
                guided = x0_neg + guidance_scale * (x0 - x0_neg)
                if guidance_rescale > 0:
                    guided = rescale_noise_cfg(guided, x0, guidance_rescale)
                x0 = guided
            eps = ns.x0_to_eps(x, x0, t_b)
            x_fwd = ns.forward_process(x0, eps,
                                       jnp.full((x.shape[0],), t_next,
                                                jnp.float32))
            # final step (t_next == 0) lands on the clean prediction
            return jnp.where(t_next > 0, x_fwd, x0), None

        t_arr = jnp.asarray(t_list, jnp.float32)
        x, _ = jax.lax.scan(step, x, jnp.stack([t_arr[:-1], t_arr[1:]], axis=1))
        return x
