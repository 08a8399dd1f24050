"""T5 / UMT5 text encoder (flax) + torch-weight converter.

Counterpart of the reference's T5-family text encoders: ``WanTextEncoder``
(UMT5-XXL, ``Wan/network.py:431-483``), ``CogVideoXTextEncoder`` (T5,
``CogVideoX/network.py:246-301``) and the T5-XXL half of ``FluxTextEncoder``
(``Flux/network.py:25-170``). Mirrors ``transformers.(U)MT5EncoderModel``:

* pre-RMSNorm blocks, no biases, no q-scaling (scores are raw dot products);
* relative position bias: one shared table computed at block 0 for T5,
  a per-layer table for UMT5 (``per_layer_rel_bias=True``);
* gated-GELU feed-forward (v1.1/UMT5) or ReLU (v1.0).

Parity vs transformers is tested in ``tests/test_encoders.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


class T5RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        return (scale * y.astype(x.dtype))


def _relative_position_bucket(rel_pos, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucketing (transformers ``_relative_position_bucket``)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-20)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5Attention(nn.Module):
    d_model: int
    d_kv: int
    num_heads: int
    rel_buckets: int = 32
    rel_max_distance: int = 128
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 shared_bias: Optional[jnp.ndarray] = None):
        b, n, _ = x.shape
        h, hd = self.num_heads, self.d_kv
        inner = h * hd
        q = nn.Dense(inner, use_bias=False, name="q")(x).reshape(b, n, h, hd)
        k = nn.Dense(inner, use_bias=False, name="k")(x).reshape(b, n, h, hd)
        v = nn.Dense(inner, use_bias=False, name="v")(x).reshape(b, n, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        bias = shared_bias
        if self.has_rel_bias:
            table = self.param("relative_attention_bias", nn.initializers.zeros,
                               (self.rel_buckets, h))
            pos = jnp.arange(n)
            buckets = _relative_position_bucket(pos[None, :] - pos[:, None],
                                                self.rel_buckets,
                                                self.rel_max_distance)
            bias = table[buckets].transpose(2, 0, 1)[None]  # [1,h,q,k]
        if bias is not None:
            logits = logits + bias.astype(logits.dtype)
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, inner)
        return nn.Dense(self.d_model, use_bias=False, name="o")(out), bias


class T5FF(nn.Module):
    d_model: int
    d_ff: int
    gated: bool = True

    @nn.compact
    def __call__(self, x):
        if self.gated:
            g = nn.Dense(self.d_ff, use_bias=False, name="wi_0")(x)
            u = nn.Dense(self.d_ff, use_bias=False, name="wi_1")(x)
            y = jax.nn.gelu(g, approximate=True) * u
        else:
            y = jax.nn.relu(nn.Dense(self.d_ff, use_bias=False, name="wi")(x))
        return nn.Dense(self.d_model, use_bias=False, name="wo")(y)


class T5Encoder(nn.Module):
    """T5/UMT5 encoder stack. Returns last hidden states [B, N, d_model]."""

    vocab_size: int = 256384
    d_model: int = 4096
    d_kv: int = 64
    num_heads: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    rel_buckets: int = 32
    rel_max_distance: int = 128
    per_layer_rel_bias: bool = True   # UMT5; False = classic T5 (shared at block 0)
    gated_ff: bool = True
    eps: float = 1e-6

    @nn.compact
    def __call__(self, input_ids, attention_mask: Optional[jnp.ndarray] = None):
        x = nn.Embed(self.vocab_size, self.d_model, name="shared")(input_ids)
        mask = None
        if attention_mask is not None:
            mask = jnp.where(attention_mask[:, None, None, :].astype(bool),
                             0.0, -jnp.inf).astype(jnp.float32)
        shared_bias = None
        for i in range(self.num_layers):
            has_bias = self.per_layer_rel_bias or i == 0
            attn = T5Attention(self.d_model, self.d_kv, self.num_heads,
                               self.rel_buckets, self.rel_max_distance,
                               has_rel_bias=has_bias, name=f"block_{i}_attn")
            y = T5RMSNorm(self.d_model, self.eps, name=f"block_{i}_ln0")(x)
            out, bias = attn(y, mask, shared_bias=shared_bias)
            x = x + out
            if not self.per_layer_rel_bias and i == 0:
                shared_bias = bias
            y = T5RMSNorm(self.d_model, self.eps, name=f"block_{i}_ln1")(x)
            x = x + T5FF(self.d_model, self.d_ff, self.gated_ff,
                         name=f"block_{i}_ff")(y)
        return T5RMSNorm(self.d_model, self.eps, name="final_layer_norm")(x)


def convert_t5(sd: dict) -> dict:
    """Map a ``transformers.(U)MT5EncoderModel`` state dict to ``T5Encoder``."""
    p: dict = {}
    pre = "encoder." if any(k.startswith("encoder.") for k in sd) else ""

    def put(path, v):
        node = p
        parts = path.split(".")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = np.asarray(v)

    def dense(w):
        return np.ascontiguousarray(np.asarray(w).T)

    emb = sd.get("shared.weight", sd.get(f"{pre}embed_tokens.weight"))
    put("shared.embedding", emb)
    n_layers = 1 + max(int(k.split(".")[2 if pre else 1])
                       for k in sd if ".block." in k or k.startswith("block."))
    for i in range(n_layers):
        src = f"{pre}block.{i}.layer."
        for nm in ("q", "k", "v", "o"):
            put(f"block_{i}_attn.{nm}.kernel", dense(sd[src + f"0.SelfAttention.{nm}.weight"]))
        rb = src + "0.SelfAttention.relative_attention_bias.weight"
        if rb in sd:
            put(f"block_{i}_attn.relative_attention_bias", sd[rb])
        put(f"block_{i}_ln0.scale", sd[src + "0.layer_norm.weight"])
        ff = src + "1.DenseReluDense."
        if ff + "wi_0.weight" in sd:
            put(f"block_{i}_ff.wi_0.kernel", dense(sd[ff + "wi_0.weight"]))
            put(f"block_{i}_ff.wi_1.kernel", dense(sd[ff + "wi_1.weight"]))
        else:
            put(f"block_{i}_ff.wi.kernel", dense(sd[ff + "wi.weight"]))
        put(f"block_{i}_ff.wo.kernel", dense(sd[ff + "wo.weight"]))
        put(f"block_{i}_ln1.scale", sd[src + "1.layer_norm.weight"])
    put("final_layer_norm.scale", sd[f"{pre}final_layer_norm.weight"])
    return p
