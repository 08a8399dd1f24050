"""Depth-Anything V2 depth annotator (flax) for VACE depth conditioning.

TPU-native counterpart of the reference's torch annotator stack
(``fastgen/networks/VaceWan/modules/vace_depth_annotator.py:15-139`` wrapping
``fastgen/third_party/annotators/depth_anything_v2/{dinov2.py,dpt.py}``):
a DINOv2 ViT encoder + DPT refinement head producing relative depth, consumed
by the V2V (VACE) pipeline as a 3-channel control video.

Design notes (TPU-first, not a translation):

* All resampling (patch pos-embed bicubic, DPT fusion upsampling, input/output
  resizes) is expressed as **matrix interpolation**: for static shapes the
  1-D resampling weights are precomputed on the host (`numpy`) and applied as
  two small einsums — exact torch ``F.interpolate`` semantics (bilinear /
  bicubic, align_corners true/false, scale-factor source grid) while mapping
  onto the MXU instead of gather pipelines.
* The DPT ``ConvTranspose2d(k=s)`` upsamplers are non-overlapping, so they are
  implemented as a single einsum + reshape (`BlockConvTranspose`) — the exact
  same math without the XLA transposed-conv path.
* Layout is NHWC throughout; attention runs in plain einsum form (the token
  count is ~1.4k — far below the flash-attention crossover).

Weights convert mechanically from the published ``depth_anything_v2_vit*.pth``
torch checkpoints via :func:`convert_depth_anything`; numerics are verified
against a torch replica in ``tests/test_annotators.py``.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

__all__ = ["DepthAnythingV2", "DepthAnnotator", "convert_depth_anything"]


# --------------------------------------------------------------------------
# Matrix interpolation (exact torch F.interpolate semantics)
# --------------------------------------------------------------------------

def _cubic_weight(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic kernel, torch's bicubic (a = -0.75)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0, ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
        np.where(ax < 2.0, (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a, 0.0))
    return w


def interp_matrix(n_in: int, n_out: int, method: str = "bilinear",
                  align_corners: bool = True,
                  scale: Optional[float] = None) -> np.ndarray:
    """[n_out, n_in] resampling matrix matching ``torch.nn.functional.interpolate``.

    ``scale`` reproduces the scale-factor source grid (used by DINOv2's
    pos-embed interpolation, ``dinov2.py:181-213``): src = (j+0.5)/scale - 0.5.
    """
    if n_in == n_out and scale is None:
        return np.eye(n_out, dtype=np.float64)
    j = np.arange(n_out, dtype=np.float64)
    if align_corners:
        src = j * (n_in - 1) / max(n_out - 1, 1)
    elif scale is not None:
        src = (j + 0.5) / scale - 0.5
    else:
        src = (j + 0.5) * n_in / n_out - 0.5
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    f = np.floor(src).astype(np.int64)
    frac = src - f
    if method == "bilinear":
        taps, offs = np.stack([1.0 - frac, frac], -1), (0, 1)
    elif method == "bicubic":
        offs = (-1, 0, 1, 2)
        taps = np.stack([_cubic_weight(frac - o) for o in offs], -1)
    else:
        raise ValueError(f"unknown method {method}")
    for ti, o in enumerate(offs):
        idx = np.clip(f + o, 0, n_in - 1)   # border replicate, as torch
        np.add.at(mat, (j.astype(np.int64), idx), taps[:, ti])
    return mat


def resize_2d(x: jnp.ndarray, out_hw: Tuple[int, int], method: str = "bilinear",
              align_corners: bool = True,
              scale: Optional[Tuple[float, float]] = None) -> jnp.ndarray:
    """Separable resize of [..., H, W, C] via two constant-matrix einsums."""
    h, w = x.shape[-3], x.shape[-2]
    sh, sw = (scale if scale is not None else (None, None))
    mh = jnp.asarray(interp_matrix(h, out_hw[0], method, align_corners, sh),
                     jnp.float32)
    mw = jnp.asarray(interp_matrix(w, out_hw[1], method, align_corners, sw),
                     jnp.float32)
    y = jnp.einsum("Hh,...hwc->...Hwc", mh, x.astype(jnp.float32))
    y = jnp.einsum("Ww,...hwc->...hWc", mw, y)
    return y.astype(x.dtype)


# --------------------------------------------------------------------------
# DINOv2 ViT encoder (ref dinov2.py:46-332, layers/{block,attention,mlp}.py)
# --------------------------------------------------------------------------

class _ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale: bool = True

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        h, hd = self.num_heads, self.dim // self.num_heads
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(y).reshape(b, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, d)
        attn = nn.Dense(d, name="proj")(attn)
        if self.layer_scale:
            attn = attn * self.param("ls1_gamma", nn.initializers.ones, (d,))
        x = x + attn
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(d * self.mlp_ratio), name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(d, name="fc2")(y)
        if self.layer_scale:
            y = y * self.param("ls2_gamma", nn.initializers.ones, (d,))
        return x + y


class DinoViT(nn.Module):
    """DINOv2 vision transformer (ref ``dinov2.py:46``; vitl preset:
    dim 1024 / depth 24 / 16 heads / patch 14 / 518px grid / layerscale 1.0).
    """

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 14
    pos_grid: int = 37            # 518 // 14
    interpolate_offset: float = 0.1

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 take_indices: Sequence[int] = ()):
        """images [B, H, W, 3] (ImageNet-normalized, H/W multiples of 14)
        -> list of (patch_tokens [B,N,D], cls [B,D]) at ``take_indices``,
        each with the final LayerNorm applied (ref ``get_intermediate_layers``
        with norm=True, ``dinov2.py:299-324``)."""
        b, h, w, _ = images.shape
        ph, pw = h // self.patch_size, w // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed")(images)
        x = x.reshape(b, ph * pw, self.embed_dim)

        cls_tok = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.pos_grid * self.pos_grid + 1, self.embed_dim))
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (ph, pw) != (self.pos_grid, self.pos_grid):
            # scale-factor bicubic with the +0.1 offset workaround
            # (ref dinov2.py:181-213)
            grid = patch_pos.reshape(self.pos_grid, self.pos_grid,
                                     self.embed_dim)
            sx = (ph + self.interpolate_offset) / self.pos_grid
            sy = (pw + self.interpolate_offset) / self.pos_grid
            grid = resize_2d(grid, (ph, pw), "bicubic", align_corners=False,
                             scale=(sx, sy))
            patch_pos = grid.reshape(1, ph * pw, self.embed_dim)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (b, 1, self.embed_dim)), x], axis=1)
        x = x + jnp.concatenate([cls_pos, patch_pos], axis=1).astype(x.dtype)

        take = set(int(i) for i in take_indices)
        norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        outs = {}
        for i in range(self.depth):
            x = _ViTBlock(self.embed_dim, self.num_heads,
                          name=f"blocks_{i}")(x)
            if i in take:
                y = norm(x)
                outs[i] = (y[:, 1:], y[:, 0])
        # preserve request order (duplicates allowed — tiny test presets
        # tap the same layer more than once)
        return [outs[int(i)] for i in take_indices]


# --------------------------------------------------------------------------
# DPT head (ref dpt.py:94-195, util/blocks.py)
# --------------------------------------------------------------------------

class BlockConvTranspose(nn.Module):
    """ConvTranspose2d with kernel == stride (non-overlapping): each input
    pixel emits a k×k block — one einsum + reshape (ref ``dpt.py:115-124``)."""

    features: int
    k: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (self.k, self.k, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum("bhwc,ijco->bhiwjo", x, kern.astype(x.dtype))
        y = y.reshape(b, h * self.k, w * self.k, self.features)
        return y + bias.astype(x.dtype)


class _ResidualConvUnit(nn.Module):
    """relu → conv3x3 → relu → conv3x3 → +x (ref ``util/blocks.py:40-91``)."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        return x + y


class _FeatureFusionBlock(nn.Module):
    """(ref ``util/blocks.py:94-147``): optional residual merge, RCU, bilinear
    align-corners upsample to ``size`` (or 2×), 1x1 out conv."""

    features: int

    @nn.compact
    def __call__(self, x, res=None, size: Optional[Tuple[int, int]] = None):
        if res is not None:
            x = x + _ResidualConvUnit(self.features, name="rcu1")(res)
        x = _ResidualConvUnit(self.features, name="rcu2")(x)
        out_hw = size if size is not None else (2 * x.shape[1], 2 * x.shape[2])
        x = resize_2d(x, out_hw, "bilinear", align_corners=True)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHead(nn.Module):
    """(ref ``dpt.py:94-195``)."""

    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    patch_size: int = 14

    @nn.compact
    def __call__(self, vit_features, patch_h: int, patch_w: int):
        outs = []
        for i, (tokens, _cls) in enumerate(vit_features):
            b, n, d = tokens.shape
            x = tokens.reshape(b, patch_h, patch_w, d)
            x = nn.Conv(self.out_channels[i], (1, 1), name=f"projects_{i}")(x)
            if i == 0:
                x = BlockConvTranspose(self.out_channels[0], 4, name="resize_0")(x)
            elif i == 1:
                x = BlockConvTranspose(self.out_channels[1], 2, name="resize_1")(x)
            elif i == 3:
                x = nn.Conv(self.out_channels[3], (3, 3), strides=2, padding=1,
                            name="resize_3")(x)
            outs.append(x)

        rn = [nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                      name=f"layer{i + 1}_rn")(outs[i]) for i in range(4)]

        path = _FeatureFusionBlock(self.features, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3])
        path = _FeatureFusionBlock(self.features, name="refinenet3")(
            path, rn[2], size=rn[1].shape[1:3])
        path = _FeatureFusionBlock(self.features, name="refinenet2")(
            path, rn[1], size=rn[0].shape[1:3])
        path = _FeatureFusionBlock(self.features, name="refinenet1")(path, rn[0])

        x = nn.Conv(self.features // 2, (3, 3), padding=1,
                    name="output_conv1")(path)
        x = resize_2d(x, (patch_h * self.patch_size, patch_w * self.patch_size),
                      "bilinear", align_corners=True)
        x = nn.Conv(32, (3, 3), padding=1, name="output_conv2_0")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="output_conv2_2")(x)
        return nn.relu(x)


_VIT_PRESETS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6,
                 intermediate_layer_idx=(2, 5, 8, 11),
                 out_channels=(48, 96, 192, 384), features=64),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12,
                 intermediate_layer_idx=(2, 5, 8, 11),
                 out_channels=(96, 192, 384, 768), features=128),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16,
                 intermediate_layer_idx=(4, 11, 17, 23),
                 out_channels=(256, 512, 1024, 1024), features=256),
}


class DepthAnythingV2(nn.Module):
    """(ref ``dpt.py:15-45``): DINOv2 encoder + DPT head → relative depth.

    ``__call__`` takes ImageNet-normalized [B, H, W, 3] (H, W multiples of
    ``patch_size``) and returns depth [B, H, W] (non-negative, unnormalized).
    """

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)
    patch_size: int = 14
    pos_grid: int = 37

    @nn.compact
    def __call__(self, x):
        ph, pw = x.shape[1] // self.patch_size, x.shape[2] // self.patch_size
        feats = DinoViT(self.embed_dim, self.depth, self.num_heads,
                        self.patch_size, self.pos_grid,
                        name="pretrained")(x, self.intermediate_layer_idx)
        depth = DPTHead(self.features, tuple(self.out_channels),
                        self.patch_size, name="depth_head")(feats, ph, pw)
        return depth[..., 0]


# --------------------------------------------------------------------------
# Host-side wrapper (ref vace_depth_annotator.py:15-139)
# --------------------------------------------------------------------------

def _constrain_to_multiple_of(x: float, multiple: int = 14,
                              min_val: Optional[int] = None) -> int:
    y = int(round(x / multiple) * multiple)
    if min_val is not None and y < min_val:
        y = int(math.ceil(x / multiple) * multiple)
    return y


class DepthAnnotator:
    """Frozen depth extractor: video/image pixels in [0, 1] → 3-channel depth
    in [0, 1] (ref ``VACEDepthExtractor``, ``vace_depth_annotator.py:15-139``).

    Accepts [B, T, H, W, C] videos or [B, H, W, C] images (NHWC — the
    reference is NCHW/NCTHW). The whole clip runs as one batched device call
    instead of the reference's per-frame Python loop.
    """

    IMAGENET_MEAN = (0.485, 0.456, 0.406)
    IMAGENET_STD = (0.229, 0.224, 0.225)

    def __init__(self, params=None, variant: str = "vitl",
                 params_path: Optional[str] = None, input_size: int = 518,
                 dtype=jnp.float32, rng_seed: int = 0):
        preset = dict(_VIT_PRESETS[variant])
        preset.pop("intermediate_layer_idx")
        self.module = DepthAnythingV2(
            intermediate_layer_idx=_VIT_PRESETS[variant]["intermediate_layer_idx"],
            embed_dim=preset["embed_dim"], depth=preset["depth"],
            num_heads=preset["num_heads"], features=preset["features"],
            out_channels=preset["out_channels"])
        self.input_size = input_size
        self.dtype = dtype
        if params is None and params_path and os.path.exists(params_path):
            from fastgen_tpu.utils.torch_convert import load_torch_state_dict
            params = convert_depth_anything(load_torch_state_dict(params_path))
        if params is None:
            # ref warns and keeps random weights when the checkpoint is absent
            # (vace_depth_annotator.py:50-51)
            params = self.module.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, self.module.patch_size * 2,
                           self.module.patch_size * 2, 3)))["params"]
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype) if jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x), params)
        self._apply = jax.jit(
            lambda p, x: self.module.apply({"params": p}, x))

    def _infer_batch(self, frames: jnp.ndarray) -> jnp.ndarray:
        """frames [N, H, W, 3] in [0,1] → depth [N, H, W] in [0,1]."""
        n, h, w, _ = frames.shape
        scale = max(self.input_size / h, self.input_size / w)
        nh = _constrain_to_multiple_of(scale * h, 14, self.input_size)
        nw = _constrain_to_multiple_of(scale * w, 14, self.input_size)
        x = resize_2d(frames.astype(self.dtype), (nh, nw), "bicubic",
                      align_corners=True)
        mean = jnp.asarray(self.IMAGENET_MEAN, self.dtype)
        std = jnp.asarray(self.IMAGENET_STD, self.dtype)
        x = (x - mean) / std
        depth = self._apply(self.params, x)
        # per-frame min-max normalization (ref :66-76)
        dmin = depth.min(axis=(1, 2), keepdims=True)
        dmax = depth.max(axis=(1, 2), keepdims=True)
        norm = jnp.where(dmax - dmin < 1e-8, jnp.full_like(depth, 0.5),
                         (depth - dmin) / jnp.maximum(dmax - dmin, 1e-12))
        out = resize_2d(norm[..., None], (h, w), "bilinear",
                        align_corners=True)
        return jnp.clip(out[..., 0], 0.0, 1.0)

    def __call__(self, frames) -> jnp.ndarray:
        frames = jnp.asarray(frames)
        if frames.ndim == 5:
            b, t, h, w, c = frames.shape
            depth = self._infer_batch(frames.reshape(b * t, h, w, c))
            depth = depth.reshape(b, t, h, w)[..., None]
            return jnp.repeat(depth, 3, axis=-1)
        if frames.ndim == 4:
            depth = self._infer_batch(frames)[..., None]
            return jnp.repeat(depth, 3, axis=-1)
        raise ValueError(f"expected 4D or 5D input, got {frames.ndim}D")


# --------------------------------------------------------------------------
# torch checkpoint -> flax params
# --------------------------------------------------------------------------

def convert_depth_anything(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a ``depth_anything_v2_vit*.pth`` state dict (DepthAnythingV2 torch
    module: ``pretrained.*`` DINOv2 + ``depth_head.*`` DPT) to flax params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: Dict[str, Any] = {}

    def put(path: str, v):
        node = p
        parts = path.split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = np.asarray(v)

    def dense(w):
        return np.ascontiguousarray(w.T)

    def conv(w):  # [O, I, kh, kw] -> [kh, kw, I, O]
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))

    # ---- DINOv2 encoder
    put("pretrained/cls_token", sd["pretrained.cls_token"])
    put("pretrained/pos_embed", sd["pretrained.pos_embed"])
    put("pretrained/patch_embed/kernel",
        conv(sd["pretrained.patch_embed.proj.weight"]))
    put("pretrained/patch_embed/bias", sd["pretrained.patch_embed.proj.bias"])
    n_blocks = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("pretrained.blocks."))
    for i in range(n_blocks):
        src, dst = f"pretrained.blocks.{i}.", f"pretrained/blocks_{i}/"
        put(dst + "norm1/scale", sd[src + "norm1.weight"])
        put(dst + "norm1/bias", sd[src + "norm1.bias"])
        put(dst + "qkv/kernel", dense(sd[src + "attn.qkv.weight"]))
        put(dst + "qkv/bias", sd[src + "attn.qkv.bias"])
        put(dst + "proj/kernel", dense(sd[src + "attn.proj.weight"]))
        put(dst + "proj/bias", sd[src + "attn.proj.bias"])
        put(dst + "ls1_gamma", sd[src + "ls1.gamma"])
        put(dst + "norm2/scale", sd[src + "norm2.weight"])
        put(dst + "norm2/bias", sd[src + "norm2.bias"])
        put(dst + "fc1/kernel", dense(sd[src + "mlp.fc1.weight"]))
        put(dst + "fc1/bias", sd[src + "mlp.fc1.bias"])
        put(dst + "fc2/kernel", dense(sd[src + "mlp.fc2.weight"]))
        put(dst + "fc2/bias", sd[src + "mlp.fc2.bias"])
        put(dst + "ls2_gamma", sd[src + "ls2.gamma"])
    put("pretrained/norm/scale", sd["pretrained.norm.weight"])
    put("pretrained/norm/bias", sd["pretrained.norm.bias"])

    # ---- DPT head
    for i in range(4):
        put(f"depth_head/projects_{i}/kernel",
            conv(sd[f"depth_head.projects.{i}.weight"]))
        put(f"depth_head/projects_{i}/bias",
            sd[f"depth_head.projects.{i}.bias"])
    for i in (0, 1):
        # ConvTranspose2d weight [I, O, k, k] -> block kernel [k, k, I, O]
        w = sd[f"depth_head.resize_layers.{i}.weight"]
        put(f"depth_head/resize_{i}/kernel",
            np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))))
        put(f"depth_head/resize_{i}/bias",
            sd[f"depth_head.resize_layers.{i}.bias"])
    put("depth_head/resize_3/kernel", conv(sd["depth_head.resize_layers.3.weight"]))
    put("depth_head/resize_3/bias", sd["depth_head.resize_layers.3.bias"])
    for i in range(4):
        put(f"depth_head/layer{i + 1}_rn/kernel",
            conv(sd[f"depth_head.scratch.layer{i + 1}_rn.weight"]))
    for i in range(1, 5):
        src, dst = f"depth_head.scratch.refinenet{i}.", f"depth_head/refinenet{i}/"
        for rcu_t, rcu_f in (("resConfUnit1", "rcu1"), ("resConfUnit2", "rcu2")):
            for c in ("conv1", "conv2"):
                put(dst + f"{rcu_f}/{c}/kernel", conv(sd[src + f"{rcu_t}.{c}.weight"]))
                put(dst + f"{rcu_f}/{c}/bias", sd[src + f"{rcu_t}.{c}.bias"])
        put(dst + "out_conv/kernel", conv(sd[src + "out_conv.weight"]))
        put(dst + "out_conv/bias", sd[src + "out_conv.bias"])
    put("depth_head/output_conv1/kernel", conv(sd["depth_head.scratch.output_conv1.weight"]))
    put("depth_head/output_conv1/bias", sd["depth_head.scratch.output_conv1.bias"])
    put("depth_head/output_conv2_0/kernel", conv(sd["depth_head.scratch.output_conv2.0.weight"]))
    put("depth_head/output_conv2_0/bias", sd["depth_head.scratch.output_conv2.0.bias"])
    put("depth_head/output_conv2_2/kernel", conv(sd["depth_head.scratch.output_conv2.2.weight"]))
    put("depth_head/output_conv2_2/bias", sd["depth_head.scratch.output_conv2.2.bias"])
    return p
