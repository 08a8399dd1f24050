"""Cosmos Predict2 video DiT in flax.linen — from-scratch reimplementation of
the reference architecture (``fastgen/networks/cosmos_predict2/network.py:57``
``CosmosPredict2DiT`` + ``modules.py``), checkpoint-compatible layer for layer:

* Linear patch embed over (c r m n)-ordered patches, bias-free
  (``modules.py:636-685`` PatchEmbed)
* per-frame sinusoidal timesteps at model_channels -> 2-layer MLP
  (``modules.py:569-632`` Timesteps/TimestepEmbedding, optional AdaLN-LoRA)
  + RMSNorm on the embedding (``network.py:178`` t_embedding_norm)
* blocks: pre-LN (no affine) self-attn / cross-attn / GPT2 MLP, each with its
  own zero-init SiLU+Linear 3-way AdaLN modulation broadcast per frame
  (``modules.py:759-926`` Block); attention is bias-free q/k/v/out with
  RMSNorm(head_dim) qk-norm (``modules.py:285-401``)
* 3D video RoPE in the **split** (Transformer-Engine bshd) convention with
  head-dim split (t: d-2*(d//6*2), h/w: d//6*2), NTK extrapolation factors and
  optional fps modulation (``modules.py:404-511`` VideoRopePosition3DEmb,
  ``modules.py:240-283`` apply_rotary_pos_emb_simple)
* final layer: no-affine LN + zero-init 2-way modulation + bias-free linear,
  unpatchify in (p1 p2 t C) order (``modules.py:688-756``, ``network.py:383``)
* video2world: ``conditioning_latents`` replace masked input frames and the
  ``condition_mask`` rides as an extra input channel; a zero padding-mask
  channel is always appended (``network.py:318-383, 1370-1396``)
* optional ``crossattn_proj`` for raw Cosmos-Reason1-7B embeddings
  (``network.py:180-186``), ``skip_layers`` SLG, feature taps, logvar head
* selective activation checkpointing -> ``jax.checkpoint`` over blocks
  (``remat_mode``: none | block_wise | aggressive; ref ``modules.py:54-90``)
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.network import FastGenNetwork
from fastgen_tpu.networks.wan.network import RMSNorm
from fastgen_tpu.ops.attention import dot_product_attention
from fastgen_tpu.ops.schedules import NET_PRED_TYPES


def cosmos_rope_angles(head_dim: int, f: int, h: int, w: int,
                       theta: float = 10000.0,
                       h_ntk: float = 1.0, w_ntk: float = 1.0, t_ntk: float = 1.0,
                       fps_ratio: float = 1.0) -> np.ndarray:
    """[L, head_dim/2] rotation angles for the (t, h, w) grid
    (ref ``VideoRopePosition3DEmb.generate_embeddings``): dim split
    h = w = head_dim//6*2, t = head_dim - 2h; per-axis theta scaled by the
    NTK extrapolation factor; temporal positions scaled by base_fps/fps."""
    d_h = head_dim // 6 * 2
    d_w = d_h
    d_t = head_dim - 2 * d_h
    parts = []
    for size, d, ntk, axis, pos_scale in ((f, d_t, t_ntk, 0, fps_ratio),
                                          (h, d_h, h_ntk, 1, 1.0),
                                          (w, d_w, w_ntk, 2, 1.0)):
        rng = np.arange(0, d, 2, dtype=np.float64)[: d // 2] / d
        freqs = 1.0 / (theta * ntk) ** rng
        ang = np.outer(np.arange(size, dtype=np.float64) * pos_scale, freqs)
        shape = [1, 1, 1, ang.shape[-1]]
        shape[axis] = size
        reps = [f, h, w, 1]
        reps[axis] = 1
        parts.append(np.tile(ang.reshape(shape), reps))
    # reference concatenates [t, h, w] twice (split convention duplicates the
    # angles across both halves); the half-table is all we need
    return np.concatenate(parts, axis=-1).reshape(f * h * w, -1)


def apply_rope_split(x, angles):
    """Split-convention rotary embedding (ref ``apply_rotary_pos_emb_simple``):
    x [B, L, H, D]; angles [L, D/2]. First/second half rotated as a pair,
    computed in f32 (the reference's use_wan_fp32_strategy)."""
    b, l, h, d = x.shape
    half = d // 2
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


class CosmosAttention(nn.Module):
    """Bias-free multi-head attention with RMSNorm qk-norm
    (ref ``modules.py:285-401``)."""

    dim: int
    num_heads: int
    attn_impl: Optional[str] = None

    @nn.compact
    def __call__(self, x, context=None, rope_angles=None):
        head_dim = self.dim // self.num_heads
        ctx = x if context is None else context
        q = nn.Dense(self.dim, use_bias=False, name="q_proj")(x)
        k = nn.Dense(self.dim, use_bias=False, name="k_proj")(ctx)
        v = nn.Dense(self.dim, use_bias=False, name="v_proj")(ctx)
        b, n, _ = q.shape
        l = k.shape[1]
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, l, self.num_heads, head_dim)
        v = v.reshape(b, l, self.num_heads, head_dim)
        q = RMSNorm(head_dim, eps=1e-6, name="q_norm")(q)
        k = RMSNorm(head_dim, eps=1e-6, name="k_norm")(k)
        if rope_angles is not None and context is None:
            q = apply_rope_split(q, rope_angles)
            k = apply_rope_split(k, rope_angles)
        out = dot_product_attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, n, self.dim)
        return nn.Dense(self.dim, use_bias=False, name="output_proj")(out)


class CosmosBlock(nn.Module):
    """Self-attn + cross-attn + MLP, each with zero-init per-frame AdaLN
    modulation (ref ``modules.py:759-926``). x rides as [B, T, S, D] so the
    [B, T, D] modulation broadcasts per frame."""

    dim: int
    ffn_dim: int
    num_heads: int
    use_adaln_lora: bool = False
    adaln_lora_dim: int = 256
    attn_impl: Optional[str] = None

    def _modulation(self, name, temb, adaln_lora):
        if self.use_adaln_lora:
            h = nn.Dense(self.adaln_lora_dim, use_bias=False,
                         name=f"{name}_lora_in")(nn.silu(temb))
            mod = nn.Dense(3 * self.dim, use_bias=False,
                           kernel_init=nn.initializers.zeros, name=name)(h)
            if adaln_lora is not None:
                mod = mod + adaln_lora
        else:
            mod = nn.Dense(3 * self.dim, use_bias=False,
                           kernel_init=nn.initializers.zeros,
                           name=name)(nn.silu(temb))
        shift, scale, gate = jnp.split(mod[:, :, None, :].astype(jnp.float32),
                                       3, axis=-1)
        return shift, scale, gate

    @nn.compact
    def __call__(self, x, temb, context, rope_angles=None, adaln_lora=None,
                 crossattn_gate_scale: float = 1.0):
        b, t, s, d = x.shape
        ln = dict(use_bias=False, use_scale=False, epsilon=1e-6)
        dtype = x.dtype

        def run(norm_name, mod_name, fn):
            shift, scale, gate = self._modulation(mod_name, temb, adaln_lora)
            xn = nn.LayerNorm(**ln, name=norm_name)(x.astype(jnp.float32))
            xn = (xn * (1 + scale) + shift).astype(dtype)
            return fn(xn.reshape(b, t * s, d)).reshape(b, t, s, d), gate

        out, gate = run("layer_norm_self_attn", "adaln_modulation_self_attn",
                        lambda xn: CosmosAttention(
                            self.dim, self.num_heads, self.attn_impl,
                            name="self_attn")(xn, rope_angles=rope_angles))
        x = x + (gate * out.astype(jnp.float32)).astype(dtype)

        out, gate = run("layer_norm_cross_attn", "adaln_modulation_cross_attn",
                        lambda xn: CosmosAttention(
                            self.dim, self.num_heads, self.attn_impl,
                            name="cross_attn")(xn, context=context))
        x = x + (gate * crossattn_gate_scale * out.astype(jnp.float32)).astype(dtype)

        def mlp(xn):
            h = nn.Dense(self.ffn_dim, use_bias=False, name="mlp_layer1")(xn)
            return nn.Dense(self.dim, use_bias=False, name="mlp_layer2")(
                nn.gelu(h, approximate=False))

        out, gate = run("layer_norm_mlp", "adaln_modulation_mlp", mlp)
        x = x + (gate * out.astype(jnp.float32)).astype(dtype)
        return x


class CosmosPredict2(FastGenNetwork):
    """(ref ``cosmos_predict2/network.py:692``). Latents [B, T, H, W, C].

    ``text_dim`` is the cross-attention width (1024 for the real checkpoints);
    when ``crossattn_proj_in_channels`` is set, raw Cosmos-Reason1-7B
    embeddings (28 layers x 3584 = 100352 concat) are projected down by the
    in-network ``crossattn_proj`` Linear+GELU (ref ``network.py:180-186``).
    """

    dim: int = 2048
    num_layers: int = 28
    num_heads: int = 16
    ffn_dim: int = 8192
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 1024
    patch_spatial: int = 2
    patch_temporal: int = 1
    rope_max_seq_len: int = 1024          # accepted for config parity; unused
    rope_h_extrapolation_ratio: float = 1.0
    rope_w_extrapolation_ratio: float = 1.0
    rope_t_extrapolation_ratio: float = 1.0
    rope_enable_fps_modulation: bool = True
    base_fps: int = 24
    use_adaln_lora: bool = False
    adaln_lora_dim: int = 256
    adaln_lora_scale: float = 1.0
    crossattn_gate_scale: float = 1.0
    crossattn_proj_in_channels: Optional[int] = None
    concat_padding_mask: bool = True
    is_video2world: bool = True           # adds the condition-mask channel
    num_conditioning_frames: int = 1
    enable_logvar: bool = True
    remat_mode: str = "none"              # none | block_wise | aggressive
    attn_impl: Optional[str] = None
    net_pred_type: str = "flow"
    schedule_type: str = "rf"

    @property
    def text_input_dim(self) -> int:
        """Width of incoming text embeddings (raw Reason1 concat when the
        in-network projection is enabled)."""
        return self.crossattn_proj_in_channels or self.text_dim

    def setup(self):
        self.x_embedder = nn.Dense(self.dim, use_bias=False, name="x_embedder")
        self.t_embedder_1 = nn.Dense(self.dim, use_bias=not self.use_adaln_lora,
                                     name="t_embedder_1")
        self.t_embedder_2 = nn.Dense(
            3 * self.dim if self.use_adaln_lora else self.dim,
            use_bias=False, name="t_embedder_2")
        self.t_embedding_norm = RMSNorm(self.dim, eps=1e-6,
                                        name="t_embedding_norm")
        self.blocks = [CosmosBlock(self.dim, self.ffn_dim, self.num_heads,
                                   self.use_adaln_lora, self.adaln_lora_dim,
                                   self.attn_impl, name=f"blocks_{i}")
                       for i in range(self.num_layers)]
        self.final_norm = nn.LayerNorm(use_bias=False, use_scale=False,
                                       epsilon=1e-6, name="final_norm")
        self.final_adaln = nn.Dense(2 * self.dim, use_bias=False,
                                    kernel_init=nn.initializers.zeros,
                                    name="final_adaln")
        if self.use_adaln_lora:
            self.final_adaln_lora_in = nn.Dense(self.adaln_lora_dim,
                                                use_bias=False,
                                                name="final_adaln_lora_in")
        p, pt = self.patch_spatial, self.patch_temporal
        self.final_linear = nn.Dense(p * p * pt * self.out_channels,
                                     use_bias=False, name="final_linear")
        if self.crossattn_proj_in_channels:
            self.crossattn_proj = nn.Dense(self.text_dim, name="crossattn_proj")
        self.logvar_linear = (nn.Dense(1, name="logvar_linear")
                              if self.enable_logvar else None)

    # ---------------------------------------------------------------- pieces
    def _patchify(self, x):
        """[B, T, H, W, C] -> tokens [B, t, hp*wp, D] in (c r m n) feature
        order (ref ``PatchEmbed``)."""
        b, T, H, W, c = x.shape
        p, pt = self.patch_spatial, self.patch_temporal
        t, hp, wp = T // pt, H // p, W // p
        x = x.reshape(b, t, pt, hp, p, wp, p, c)
        x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)      # [b,t,hp,wp,c,r,m,n]
        x = x.reshape(b, t, hp * wp, c * pt * p * p)
        return self.x_embedder(x), (t, hp, wp)

    def _unpatchify(self, x, grid, batch):
        """[B, t, hp*wp, M] -> [B, T, H, W, C] in (p1 p2 t C) feature order
        (ref ``unpatchify``)."""
        t, hp, wp = grid
        p, pt = self.patch_spatial, self.patch_temporal
        c = self.out_channels
        x = x.reshape(batch, t, hp, wp, p, p, pt, c)
        x = x.transpose(0, 1, 6, 2, 4, 3, 5, 7)      # [b,t,pt,hp,p1,wp,p2,c]
        return x.reshape(batch, t * pt, hp * p, wp * p, c)

    def _time_embed(self, t, num_frames):
        """Per-frame t [B] or [B, T] -> (temb [B, F, D], adaln_lora or None)
        (ref ``Timesteps``/``TimestepEmbedding``, cos-first sinusoid)."""
        t = self.noise_scheduler.rescale_t(t)
        if t.ndim == 1:
            t = t[:, None]
        if t.shape[1] == 1:
            t = jnp.repeat(t, num_frames, axis=1)
        elif t.shape[1] != num_frames:
            t = t[:, ::self.patch_temporal]
        half = self.dim // 2
        freqs = jnp.exp(-np.log(10000.0)
                        * jnp.arange(half, dtype=jnp.float32) / half)
        ang = t.astype(jnp.float32)[..., None] * freqs
        feats = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        emb = self.t_embedder_2(nn.silu(self.t_embedder_1(feats)))
        if self.use_adaln_lora:
            adaln_lora = emb
            temb = feats
        else:
            adaln_lora = None
            temb = emb
        return self.t_embedding_norm(temb), adaln_lora

    def preserve_conditioning(self, x, condition):
        """Hook used by the generic student sample loop (ref ``model.py:343``)."""
        if isinstance(condition, dict) and condition.get("condition_mask") is not None \
                and condition.get("conditioning_latents") is not None:
            return jnp.where(condition["condition_mask"].astype(bool),
                             condition["conditioning_latents"], x)
        return x

    # --------------------------------------------------------------- forward
    def __call__(self, x_t, t, condition=None, r=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (),
                 return_logvar: bool = False,
                 fwd_pred_type: Optional[str] = None,
                 skip_layers: Optional[Tuple[int, ...]] = None,
                 fps: Optional[float] = None,
                 train: bool = False, **kwargs):
        if return_features_early and not feature_indices:
            return []
        if fwd_pred_type is not None:
            assert fwd_pred_type in NET_PRED_TYPES
        conditioning_latents = condition_mask = None
        if isinstance(condition, dict):
            conditioning_latents = condition.get("conditioning_latents")
            condition_mask = condition.get("condition_mask")
            text_embeds = condition.get("text_embeds")
        else:
            text_embeds = condition
        if text_embeds is None:
            in_dim = self.crossattn_proj_in_channels or self.text_dim
            text_embeds = jnp.zeros((x_t.shape[0], 1, in_dim), x_t.dtype)
        if self.crossattn_proj_in_channels:
            text_embeds = nn.gelu(self.crossattn_proj(text_embeds),
                                  approximate=False)

        # video2world: conditioning latents replace masked input frames
        # (ref ``network.py:1370-1396``)
        model_input = x_t
        if conditioning_latents is not None and condition_mask is not None:
            model_input = jnp.where(condition_mask.astype(bool),
                                    conditioning_latents, x_t)

        # extra input channels: condition mask (video2world) + padding mask
        chans = [model_input]
        if self.is_video2world:
            mask = (jnp.broadcast_to(condition_mask,
                                     x_t.shape[:-1] + (1,)).astype(x_t.dtype)
                    if condition_mask is not None
                    else jnp.zeros(x_t.shape[:-1] + (1,), x_t.dtype))
            chans.append(mask)
        if self.concat_padding_mask:
            chans.append(jnp.zeros(x_t.shape[:-1] + (1,), x_t.dtype))
        tokens, grid = self._patchify(jnp.concatenate(chans, axis=-1))
        f, hp, wp = grid

        head_dim = self.dim // self.num_heads
        fps_ratio = (self.base_fps / fps
                     if (fps and self.rope_enable_fps_modulation) else 1.0)
        rope = jnp.asarray(cosmos_rope_angles(
            head_dim, f, hp, wp,
            h_ntk=self.rope_h_extrapolation_ratio
            ** (head_dim // 6 * 2 / max(head_dim // 6 * 2 - 2, 1)),
            w_ntk=self.rope_w_extrapolation_ratio
            ** (head_dim // 6 * 2 / max(head_dim // 6 * 2 - 2, 1)),
            t_ntk=self.rope_t_extrapolation_ratio
            ** ((head_dim - 2 * (head_dim // 6 * 2))
                / max(head_dim - 2 * (head_dim // 6 * 2) - 2, 1)),
            fps_ratio=fps_ratio), jnp.float32)

        temb, adaln_lora = self._time_embed(t, f)
        if adaln_lora is not None and self.adaln_lora_scale != 1.0:
            adaln_lora = adaln_lora * self.adaln_lora_scale

        def run_block(block, x):
            def fn(x_):
                return block(x_, temb, text_embeds, rope_angles=rope,
                             adaln_lora=adaln_lora,
                             crossattn_gate_scale=self.crossattn_gate_scale)
            if self.remat_mode in ("block_wise", "aggressive"):
                policy = (None if self.remat_mode == "aggressive" else
                          jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
                return jax.checkpoint(fn, policy=policy)(x)
            return fn(x)

        b = x_t.shape[0]
        x = tokens                                  # [B, f, hp*wp, D]
        features = []
        for idx, block in enumerate(self.blocks):
            if skip_layers is not None and idx in skip_layers:
                continue
            x = run_block(block, x)
            if idx in feature_indices:
                features.append(x.reshape(b, f, hp, wp, self.dim))
            if return_features_early and len(features) == len(feature_indices):
                return features
        if return_features_early:
            return features

        # final layer (ref ``FinalLayer``): chunk order (shift, scale)
        mod = self.final_adaln(
            nn.silu(temb) if not self.use_adaln_lora
            else self.final_adaln_lora_in(nn.silu(temb)))
        if adaln_lora is not None:
            mod = mod + adaln_lora[..., : 2 * self.dim]
        shift, scale = jnp.split(mod[:, :, None, :].astype(jnp.float32), 2, -1)
        xn = self.final_norm(x.astype(jnp.float32))
        x = ((xn * (1 + scale) + shift)).astype(x_t.dtype)
        x = self.final_linear(x)
        out = self._unpatchify(x, grid, b)

        t_conv = t if t.ndim == 1 else t[:, :, None, None, None]
        out = self.noise_scheduler.convert_model_output(
            model_input, out, t_conv, src_pred_type=self.net_pred_type,
            target_pred_type=fwd_pred_type or self.net_pred_type)

        # conditioned frames pass through unchanged (preserve context,
        # ref ``network.py:1430-1436``)
        if condition_mask is not None and conditioning_latents is not None \
                and (fwd_pred_type or self.net_pred_type) == "x0":
            out = jnp.where(condition_mask.astype(bool), conditioning_latents, out)

        result = out if not feature_indices else [out, features]
        if return_logvar:
            assert self.logvar_linear is not None
            return result, self.logvar_linear(temb.mean(axis=1))
        return result

    # ---------------------------------------------------------------- sample
    def sample(self, noise, condition=None, neg_condition=None,
               guidance_scale: Optional[float] = 5.0, num_steps: int = 50,
               shift: float = 5.0, solver: str = "euler",
               skip_layers: Optional[Tuple[int, ...]] = None,
               skip_layers_start_percent: float = 0.0,
               conditional_frame_timestep: float = 0.0, **kwargs):
        """Teacher sampler with CFG + SLG, text2world and video2world
        (ref ``cosmos_predict2/network.py:1093-1270``; FlowUniPC there —
        Euler / DPM-2M flow stepping here on the flow-shift grid; the
        reference's analytic-velocity replacement for conditioning frames is
        equivalent to pinning them via ``preserve_conditioning`` each step).

        video2world: conditioned frames are embedded at
        ``conditional_frame_timestep`` (default 0.0 = "clean", matching ref
        ``network.py:1229-1234``) rather than the current noisy t — their
        AdaLN modulation must say "clean context", not "noisy at t_cur".
        Pass a negative value to disable (uniform t). Euler branch only; the
        dpm2m branch uses uniform t."""
        if solver == "dpm2m":
            # conditioning preservation rides via the net's
            # preserve_conditioning hook; SLG is an euler-branch feature
            from fastgen_tpu.ops.solvers import net_dpm2m_sample

            return net_dpm2m_sample(self, noise, condition, neg_condition,
                                    guidance_scale, num_steps, shift=shift)
        ns = self.noise_scheduler
        t_list = np.linspace(ns.max_t, 0.0, num_steps + 1)
        if shift and shift != 1.0:   # UniPC flow_shift grid (Cosmos default 5.0)
            t_list = shift * t_list / (1.0 + (shift - 1.0) * t_list)
        x = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        x = self.preserve_conditioning(x, condition)
        use_cfg = guidance_scale is not None and guidance_scale > 1.0 and \
            neg_condition is not None
        b = x.shape[0]
        # per-frame mask [B, T] of conditioned frames (constant within frame)
        mask_bt = None
        if (conditional_frame_timestep >= 0 and isinstance(condition, dict)
                and condition.get("condition_mask") is not None):
            cm = condition["condition_mask"]
            mask_bt = jnp.broadcast_to(
                cm.reshape(cm.shape[0], cm.shape[1], -1)[:, :, :1],
                (b, x.shape[1], 1))[..., 0].astype(jnp.float32)
        # lax.scan over the schedule: one compiled step, O(1) HLO in
        # num_steps (see EDMPrecond.sample). SLG changes the graph, so it
        # splits the schedule into two chained scans at its static start.
        def euler_seg(x, t_seg, slg):
            def step(x, pair):
                t_cur, t_next = pair[0], pair[1]
                tb = jnp.full((b,), t_cur, jnp.float32)
                if mask_bt is not None:
                    tb = (conditional_frame_timestep * mask_bt
                          + tb[:, None] * (1.0 - mask_bt))
                v = self(x, tb, condition=condition, fwd_pred_type="flow")
                if use_cfg:
                    v_neg = self(x, tb, condition=neg_condition,
                                 fwd_pred_type="flow", skip_layers=slg)
                    v = v_neg + guidance_scale * (v - v_neg)
                x_n = x - (t_cur - t_next).astype(x.dtype) * v
                return self.preserve_conditioning(x_n, condition), None

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
