"""CLIP text & vision transformers (flax) + torch-weight converters.

Behavioral counterpart of the reference's frozen HF CLIP encoders:
``StableDiffusionTextEncoder`` (``SD15/network.py:344-436``),
``SDXLTextEncoder`` dual CLIP (``SDXL/network.py:46-157``), the CLIP half of
``FluxTextEncoder`` (``Flux/network.py:25-170``) and ``WanImageEncoder``
(``WanI2V/network.py:41-79``). The module mirrors the
``transformers.CLIPTextModel`` / ``CLIPVisionModel`` computation exactly so
checkpoints convert mechanically (see ``convert_clip_text``); parity is tested
against transformers in ``tests/test_encoders.py``.

Everything here is a pure function of ``input_ids`` — tokenization stays on
the host (see ``wrappers.py``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


def _act(name: str):
    if name == "quick_gelu":   # CLIP-L (SD1.5/SDXL enc-1): x * sigmoid(1.702x)
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":         # OpenCLIP bigG (SDXL enc-2): exact erf GELU in HF
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_new":
        return lambda x: jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown activation {name}")


class CLIPMLP(nn.Module):
    intermediate_size: int
    hidden_size: int
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.intermediate_size, name="fc1")(x)
        x = _act(self.act)(x)
        return nn.Dense(self.hidden_size, name="fc2")(x)


class CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        b, n, d = x.shape
        h, hd = self.num_heads, self.hidden_size // self.num_heads
        q = nn.Dense(d, name="q_proj")(x).reshape(b, n, h, hd)
        k = nn.Dense(d, name="k_proj")(x).reshape(b, n, h, hd)
        v = nn.Dense(d, name="v_proj")(x).reshape(b, n, h, hd)
        # [b, h, n, n] logits in f32 for numerical parity with torch
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, d)
        return nn.Dense(d, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, x, mask=None):
        y = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + CLIPAttention(self.hidden_size, self.num_heads, name="self_attn")(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        return x + CLIPMLP(self.intermediate_size, self.hidden_size, self.act, name="mlp")(y)


class CLIPTextTransformer(nn.Module):
    """CLIP text encoder; returns (hidden_states tuple, pooled).

    ``output_hidden_layer`` selects which layer's output is the primary
    embedding: ``-1`` = final post-LN output (SD1.5), ``-2`` = penultimate
    layer pre-final-LN (SDXL's ``hidden_states[-2]``).
    """

    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 77
    act: str = "quick_gelu"
    eos_token_id: int = 49407
    # text_projection for pooled embeds (OpenCLIP bigG / SDXL second encoder)
    projection_dim: Optional[int] = None

    @nn.compact
    def __call__(self, input_ids, return_hidden_layer: int = -1):
        b, n = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.hidden_size, name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (self.max_positions, self.hidden_size))
        x = tok + pos[None, :n]
        causal = jnp.triu(jnp.full((n, n), -jnp.inf, dtype=jnp.float32), k=1)[None, None]
        hidden = None
        for i in range(self.num_layers):
            if i == self.num_layers + return_hidden_layer + 1:
                hidden = x          # output of layer (num_layers + ret), pre-final-LN
            x = CLIPEncoderLayer(self.hidden_size, self.num_heads,
                                 self.intermediate_size, self.act,
                                 name=f"layers_{i}")(x, causal)
        final = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        if hidden is None or return_hidden_layer == -1:
            hidden = final
        # pooled = hidden state at the (first) EOS token position
        eos_pos = jnp.argmax((input_ids == self.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = final[jnp.arange(b), eos_pos]
        if self.projection_dim is not None:
            pooled = nn.Dense(self.projection_dim, use_bias=False,
                              name="text_projection")(pooled)
        return hidden, pooled


class CLIPVisionTransformer(nn.Module):
    """CLIP vision encoder (``WanImageEncoder``'s backbone).

    Input: images [B, H, W, 3] (NHWC), already resized/normalized.
    Returns (last_hidden pre-post-LN at ``return_hidden_layer``, pooled CLS).
    """

    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    intermediate_size: int = 5120
    image_size: int = 224
    patch_size: int = 14
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, images, return_hidden_layer: int = -1):
        b = images.shape[0]
        x = nn.Conv(self.hidden_size, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), use_bias=False,
                    name="patch_embedding")(images)
        x = x.reshape(b, -1, self.hidden_size)
        cls = self.param("class_embedding", nn.initializers.zeros, (self.hidden_size,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.hidden_size)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (x.shape[1], self.hidden_size))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="pre_layrnorm")(x)  # (sic) HF name
        hidden = None
        for i in range(self.num_layers):
            if i == self.num_layers + return_hidden_layer + 1:
                hidden = x
            x = CLIPEncoderLayer(self.hidden_size, self.num_heads,
                                 self.intermediate_size, self.act,
                                 name=f"layers_{i}")(x)
        if hidden is None or return_hidden_layer == -1:
            hidden = x
        pooled = nn.LayerNorm(epsilon=1e-5, name="post_layernorm")(x[:, 0])
        return hidden, pooled


# --------------------------------------------------------------------------
# torch (transformers) -> flax converters
# --------------------------------------------------------------------------

def _dense(w):
    return np.ascontiguousarray(np.asarray(w).T)


def convert_clip_text(sd: dict) -> dict:
    """Map a ``transformers.CLIPTextModel(WithProjection)`` state dict."""
    p: dict = {}
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""

    def put(path, v):
        node = p
        parts = path.split(".")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = np.asarray(v)

    put("token_embedding.embedding", sd[f"{pre}embeddings.token_embedding.weight"])
    put("position_embedding", sd[f"{pre}embeddings.position_embedding.weight"])
    n_layers = 1 + max(int(k.split(".")[3 if pre else 2]) for k in sd
                       if ".layers." in k)
    for i in range(n_layers):
        src = f"{pre}encoder.layers.{i}."
        dst = f"layers_{i}."
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put(dst + f"self_attn.{nm}.kernel", _dense(sd[src + f"self_attn.{nm}.weight"]))
            put(dst + f"self_attn.{nm}.bias", sd[src + f"self_attn.{nm}.bias"])
        for nm in ("fc1", "fc2"):
            put(dst + f"mlp.{nm}.kernel", _dense(sd[src + f"mlp.{nm}.weight"]))
            put(dst + f"mlp.{nm}.bias", sd[src + f"mlp.{nm}.bias"])
        for nm in ("layer_norm1", "layer_norm2"):
            put(dst + f"{nm}.scale", sd[src + f"{nm}.weight"])
            put(dst + f"{nm}.bias", sd[src + f"{nm}.bias"])
    put("final_layer_norm.scale", sd[f"{pre}final_layer_norm.weight"])
    put("final_layer_norm.bias", sd[f"{pre}final_layer_norm.bias"])
    if "text_projection.weight" in sd:
        put("text_projection.kernel", _dense(sd["text_projection.weight"]))
    return p


def convert_clip_vision(sd: dict) -> dict:
    """Map a ``transformers.CLIPVisionModel`` state dict."""
    p: dict = {}
    pre = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""

    def put(path, v):
        node = p
        parts = path.split(".")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = np.asarray(v)

    w = np.asarray(sd[f"{pre}embeddings.patch_embedding.weight"])  # [O,I,kh,kw]
    put("patch_embedding.kernel", np.transpose(w, (2, 3, 1, 0)))
    put("class_embedding", sd[f"{pre}embeddings.class_embedding"])
    put("position_embedding", sd[f"{pre}embeddings.position_embedding.weight"])
    n_layers = 1 + max(int(k.split(".")[3 if pre else 2]) for k in sd if ".layers." in k)
    for i in range(n_layers):
        src = f"{pre}encoder.layers.{i}."
        dst = f"layers_{i}."
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put(dst + f"self_attn.{nm}.kernel", _dense(sd[src + f"self_attn.{nm}.weight"]))
            put(dst + f"self_attn.{nm}.bias", sd[src + f"self_attn.{nm}.bias"])
        for nm in ("fc1", "fc2"):
            put(dst + f"mlp.{nm}.kernel", _dense(sd[src + f"mlp.{nm}.weight"]))
            put(dst + f"mlp.{nm}.bias", sd[src + f"mlp.{nm}.bias"])
        for nm in ("layer_norm1", "layer_norm2"):
            put(dst + f"{nm}.scale", sd[src + f"{nm}.weight"])
            put(dst + f"{nm}.bias", sd[src + f"{nm}.bias"])
    put("pre_layrnorm.scale", sd[f"{pre}pre_layrnorm.weight"])
    put("pre_layrnorm.bias", sd[f"{pre}pre_layrnorm.bias"])
    put("post_layernorm.scale", sd[f"{pre}post_layernorm.weight"])
    put("post_layernorm.bias", sd[f"{pre}post_layernorm.bias"])
    return p
