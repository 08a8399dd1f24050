"""VACEWan / CausalVACEWan: video-to-video with VACE context blocks
(ref ``fastgen/networks/VaceWan/network.py:375`` + ``network_causal.py``).

VACE conditioning: a context video (e.g. depth from the Depth-Anything-V2
annotator — here consumed as precomputed ``vid_context`` latents, the
annotator port being a preprocessors-API extension) is patchified by its own
embedding and processed by dedicated VACE blocks (same architecture as the
main blocks); each VACE block's hidden state is injected as a scaled residual
into the main stream at its mapped layer."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.wan.network import (
    CausalWanVideoDiT,
    WanBlock,
    WanVideoDiT,
    _build_rope,
)


class _VACEMixin:
    """Shared VACE plumbing over a Wan-style backbone."""

    def _setup_vace(self):
        self.vace_patch_embedding = nn.Conv(
            self.dim, self.patch_size, strides=self.patch_size, padding="VALID",
            name="vace_patch_embedding")
        self.vace_blocks = [
            WanBlock(self.dim, self.num_heads, self.ffn_dim, self.qk_norm,
                     self.cross_attn_norm, self.attn_impl, name=f"vace_blocks_{i}")
            for i in range(self.num_vace_layers)]

    def _vace_layer_map(self):
        """Main-layer index -> vace block index (evenly spread)."""
        stride = max(self.num_layers // max(self.num_vace_layers, 1), 1)
        return {i * stride: i for i in range(self.num_vace_layers)}

    def _vace_hidden(self, condition, timestep_proj, context, rope, frame_seqlen):
        vid_context = (condition.get("vid_context")
                       if isinstance(condition, dict) else None)
        if vid_context is None:
            return None
        tokens = self.vace_patch_embedding(vid_context)
        b, f, hp, wp, d = tokens.shape
        c = tokens.reshape(b, f * hp * wp, d)
        hiddens = []
        for block in self.vace_blocks:
            c, _ = block(c, timestep_proj, context, rope, frame_seqlen)
            hiddens.append(c)
        return hiddens


class VACEWan(WanVideoDiT, _VACEMixin):
    """(ref ``VaceWan/network.py:375``)."""

    num_vace_layers: int = 8
    vace_scale: float = 1.0
    is_vid2vid: bool = True

    def setup(self):
        super().setup()
        self._setup_vace()

    def __call__(self, x_t, t, condition=None, r=None,
                 return_features_early: bool = False,
                 feature_indices: Tuple[int, ...] = (),
                 return_logvar: bool = False,
                 fwd_pred_type: Optional[str] = None,
                 skip_layers: Optional[Tuple[int, ...]] = None,
                 causal_chunk_frames: Optional[int] = None,
                 train: bool = False, **kwargs):
        from fastgen_tpu.ops.schedules import NET_PRED_TYPES

        if fwd_pred_type is not None:
            assert fwd_pred_type in NET_PRED_TYPES
        text_embeds = (condition.get("text_embeds") if isinstance(condition, dict)
                       else condition)
        if text_embeds is None:
            text_embeds = jnp.zeros((x_t.shape[0], 1, self.text_dim), x_t.dtype)

        tokens, grid = self._patchify(x_t)
        f, hp, wp = grid
        frame_seqlen = hp * wp
        rope = _build_rope(self._rope_tables, self._rope_splits, f, hp, wp)
        t_frames = self._per_frame_t(t, f)
        temb, timestep_proj = self._time_embeds(self.condition_embedder, t_frames)
        context = self._embed_text(text_embeds)

        vace_hiddens = self._vace_hidden(condition, timestep_proj, context, rope,
                                         frame_seqlen)
        layer_map = self._vace_layer_map()
        causal_block = (causal_chunk_frames * frame_seqlen
                        if causal_chunk_frames else None)

        features = []
        x = tokens
        for idx, block in enumerate(self.blocks):
            if skip_layers is not None and idx in skip_layers:
                continue
            x, _ = block(x, timestep_proj, context, rope, frame_seqlen,
                         causal_block=causal_block)
            if vace_hiddens is not None and idx in layer_map:
                x = x + self.vace_scale * vace_hiddens[layer_map[idx]].astype(x.dtype)
            if idx in feature_indices:
                features.append(x.reshape(x.shape[0], f, hp, wp, self.dim))
            if return_features_early and len(features) == len(feature_indices):
                return features
        if return_features_early:
            return features

        shift, scale = [p_.squeeze(2) for p_ in jnp.split(
            self.out_scale_shift_table[:, None].astype(jnp.float32)
            + temb[:, :, None].astype(jnp.float32), 2, axis=2)]
        xn = self.norm_out(x.astype(jnp.float32)).reshape(
            x.shape[0], f, frame_seqlen, self.dim)
        xn = xn * (1 + scale[:, :, None]) + shift[:, :, None]
        x = xn.reshape(x.shape[0], f * frame_seqlen, self.dim).astype(x_t.dtype)
        x = self.proj_out(x)
        out = self._unpatchify(x, grid, x_t.shape[0])

        t_conv = t if t.ndim == 1 else t[:, :, None, None, None]
        out = self.noise_scheduler.convert_model_output(
            x_t, out, t_conv, src_pred_type=self.net_pred_type,
            target_pred_type=fwd_pred_type or self.net_pred_type)
        result = out if not feature_indices else [out, features]
        if return_logvar:
            assert self.logvar_linear is not None
            return result, self.logvar_linear(temb.mean(axis=1))
        return result


class CausalVACEWan(CausalWanVideoDiT, _VACEMixin):
    """(ref ``VaceWan/network_causal.py``): causal training path with VACE
    injection; AR generation reuses the causal cache machinery with the
    context residuals recomputed per chunk."""

    num_vace_layers: int = 8
    vace_scale: float = 1.0
    is_vid2vid: bool = True

    def setup(self):
        super().setup()
        self._setup_vace()

    def __call__(self, x_t, t, condition=None, causal: bool = True, **kwargs):
        kwargs.setdefault("causal_chunk_frames", self.chunk_size if causal else None)
        return VACEWan.__call__(self, x_t, t, condition=condition, **kwargs)
