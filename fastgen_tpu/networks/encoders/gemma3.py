"""Gemma3 text encoder (flax) + torch-weight converter — LTX-2 conditioning.

Counterpart of the reference's ``LTX2TextEncoder``
(``fastgen/networks/LTX2/network.py:314-377`` wrapping
``transformers.Gemma3ForConditionalGeneration``): a decoder-only Gemma3 LM run
as a frozen feature extractor with ``output_hidden_states=True``; LTX-2 then
stacks ALL hidden states, masked-normalizes them per sample and flattens
[B, T, H, L] -> [B, T, H*L] caption features (``_pack_text_embeds``,
``network.py:85-114``).

Gemma3 architecture notes (mirrors ``transformers`` Gemma3TextModel):

* scaled word embeddings (``* sqrt(hidden)``);
* zero-centered RMSNorm (``out * (1 + weight)``, computed in f32);
* GQA attention with per-head q/k RMSNorm, no biases, scaling
  ``query_pre_attn_scalar ** -0.5`` (NOT 1/sqrt(head_dim));
* dual RoPE: sliding-window layers use ``rope_local_base_freq`` (10k),
  full-attention layers use ``rope_theta`` (1M) with optional linear position
  scaling; rotate-half convention;
* 4 norms per block (input / post-attention / pre-FFN / post-FFN);
* gelu-tanh gated MLP.

Parity vs ``transformers`` is tested in ``tests/test_encoders_gemma3.py``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class GemmaRMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf ** 2, axis=-1, keepdims=True)
                               + self.eps)
        w = self.param("weight", nn.initializers.zeros, (self.dim,))
        return (y * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def _rope_cos_sin(positions, head_dim, base, linear_factor=1.0):
    """rotate-half RoPE tables: [N, head_dim] cos/sin (f32)."""
    inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float32)
                               / head_dim))
    inv_freq = inv_freq / linear_factor
    freqs = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope(x, cos, sin):
    # x: [B, N, H, D]; cos/sin: [N, D]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c
            + _rotate_half(x.astype(jnp.float32)) * s).astype(x.dtype)


class Gemma3Attention(nn.Module):
    hidden: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    query_pre_attn_scalar: float = 256.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, rope, mask_bias):
        b, n, _ = x.shape
        h, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim
        q = nn.Dense(h * hd, use_bias=False, name="q_proj")(x).reshape(b, n, h, hd)
        k = nn.Dense(kvh * hd, use_bias=False, name="k_proj")(x).reshape(b, n, kvh, hd)
        v = nn.Dense(kvh * hd, use_bias=False, name="v_proj")(x).reshape(b, n, kvh, hd)
        q = GemmaRMSNorm(hd, self.eps, name="q_norm")(q)
        k = GemmaRMSNorm(hd, self.eps, name="k_norm")(k)
        cos, sin = rope
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        if kvh != h:  # GQA: repeat kv heads
            rep = h // kvh
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        scale = self.query_pre_attn_scalar ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + mask_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, h * hd)
        return nn.Dense(self.hidden, use_bias=False, name="o_proj")(out)


class Gemma3MLP(nn.Module):
    hidden: int
    intermediate: int

    @nn.compact
    def __call__(self, x):
        g = nn.Dense(self.intermediate, use_bias=False, name="gate_proj")(x)
        u = nn.Dense(self.intermediate, use_bias=False, name="up_proj")(x)
        y = jax.nn.gelu(g, approximate=True) * u
        return nn.Dense(self.hidden, use_bias=False, name="down_proj")(y)


class Gemma3TextModel(nn.Module):
    """Decoder-only Gemma3 LM trunk. ``__call__`` returns
    ``(last_hidden, all_hidden_states)`` where ``all_hidden_states`` matches
    transformers' tuple: (scaled embeddings, block 1..N-1 outputs, final-normed
    block N output) — length ``num_layers + 1``."""

    vocab_size: int = 262208
    hidden: int = 1152
    intermediate: int = 6912
    num_layers: int = 26
    num_heads: int = 4
    num_kv_heads: int = 1
    head_dim: int = 256
    query_pre_attn_scalar: float = 256.0
    rope_theta: float = 1_000_000.0
    rope_local_base_freq: float = 10_000.0
    rope_linear_factor: float = 1.0     # global-rope linear scaling (4B+: 8.0)
    sliding_window: int = 512
    sliding_window_pattern: int = 6     # every Nth layer is full attention
    eps: float = 1e-6

    def layer_type(self, i: int) -> str:
        return ("full_attention" if (i + 1) % self.sliding_window_pattern == 0
                else "sliding_attention")

    @nn.compact
    def __call__(self, input_ids, attention_mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        b, n = input_ids.shape
        emb = nn.Embed(self.vocab_size, self.hidden, name="embed_tokens")(input_ids)
        x = emb * jnp.asarray(self.hidden ** 0.5, emb.dtype)

        pos = jnp.arange(n)
        rope_global = _rope_cos_sin(pos, self.head_dim, self.rope_theta,
                                    self.rope_linear_factor)
        rope_local = _rope_cos_sin(pos, self.head_dim, self.rope_local_base_freq)

        causal = pos[None, :] <= pos[:, None]                   # [q, k]
        in_window = (pos[:, None] - pos[None, :]) < self.sliding_window
        pad_ok = (jnp.ones((b, n), bool) if attention_mask is None
                  else attention_mask.astype(bool))

        def bias(allowed_qk):
            ok = allowed_qk[None, None] & pad_ok[:, None, None, :]
            # finite min (not -inf), matching torch: fully-masked pad query
            # rows softmax to uniform instead of NaN; pack_text_embeds zeros
            # those rows afterwards.
            return jnp.where(ok, 0.0,
                             jnp.finfo(jnp.float32).min).astype(jnp.float32)

        bias_full = bias(causal)
        bias_sliding = bias(causal & in_window)

        hidden_states = [x]
        for i in range(self.num_layers):
            full = self.layer_type(i) == "full_attention"
            res = x
            y = GemmaRMSNorm(self.hidden, self.eps, name=f"layers_{i}_input_ln")(x)
            y = Gemma3Attention(self.hidden, self.num_heads, self.num_kv_heads,
                                self.head_dim, self.query_pre_attn_scalar,
                                self.eps, name=f"layers_{i}_attn")(
                y, rope_global if full else rope_local,
                bias_full if full else bias_sliding)
            y = GemmaRMSNorm(self.hidden, self.eps,
                             name=f"layers_{i}_post_attn_ln")(y)
            x = res + y
            res = x
            y = GemmaRMSNorm(self.hidden, self.eps,
                             name=f"layers_{i}_pre_ffn_ln")(x)
            y = Gemma3MLP(self.hidden, self.intermediate,
                          name=f"layers_{i}_mlp")(y)
            y = GemmaRMSNorm(self.hidden, self.eps,
                             name=f"layers_{i}_post_ffn_ln")(y)
            x = res + y
            if i < self.num_layers - 1:
                hidden_states.append(x)
        x = GemmaRMSNorm(self.hidden, self.eps, name="norm")(x)
        hidden_states.append(x)
        return x, tuple(hidden_states)


def pack_text_embeds(hidden_states, attention_mask, scale_factor: float = 8.0,
                     padding_side: str = "left", eps: float = 1e-6):
    """LTX-2 caption packing (ref ``network.py:85-114``): stack hidden states
    [B, T, H, L], per-sample masked mean/min-max normalize, scale, zero the
    pad positions, flatten -> [B, T, H*L]."""
    x = jnp.stack(hidden_states, axis=-1).astype(jnp.float32)  # [B,T,H,L]
    b, t, h, l = x.shape
    seq_len = attention_mask.sum(axis=-1)                       # [B]
    tok = jnp.arange(t)[None, :]
    if padding_side == "right":
        valid = tok < seq_len[:, None]
    else:
        valid = tok >= (t - seq_len[:, None])
    m = valid[:, :, None, None]
    masked = jnp.where(m, x, 0.0)
    num_valid = (seq_len * h).reshape(b, 1, 1, 1).astype(jnp.float32)
    mean = masked.sum(axis=(1, 2), keepdims=True) / (num_valid + eps)
    x_min = jnp.where(m, x, jnp.inf).min(axis=(1, 2), keepdims=True)
    x_max = jnp.where(m, x, -jnp.inf).max(axis=(1, 2), keepdims=True)
    normed = (x - mean) / (x_max - x_min + eps) * scale_factor
    normed = jnp.where(m, normed, 0.0)
    return normed.reshape(b, t, h * l)


def convert_gemma3(sd: dict) -> dict:
    """Map a transformers Gemma3 text-model state dict to
    :class:`Gemma3TextModel` params. Accepts raw ``Gemma3TextModel`` keys or
    ``Gemma3ForConditionalGeneration`` keys (``language_model.model.`` /
    ``model.`` prefixes are stripped; vision tower + lm_head ignored)."""
    import re

    clean = {}
    for k, v in sd.items():
        if "vision_tower" in k or "multi_modal_projector" in k or \
                k.startswith("lm_head"):
            continue
        k = re.sub(r"^(language_model\.)?(model\.)?", "", k)
        clean[k] = np.asarray(v)
    p: dict = {}

    def put(path, v):
        node = p
        parts = path.split(".")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = np.asarray(v)

    def dense(w):
        return np.ascontiguousarray(np.asarray(w).T)

    put("embed_tokens.embedding", clean["embed_tokens.weight"])
    n_layers = 1 + max(int(k.split(".")[1]) for k in clean
                       if k.startswith("layers."))
    for i in range(n_layers):
        src = f"layers.{i}."
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
            put(f"layers_{i}_attn.{nm}.kernel",
                dense(clean[src + f"self_attn.{nm}.weight"]))
        put(f"layers_{i}_attn.q_norm.weight",
            clean[src + "self_attn.q_norm.weight"])
        put(f"layers_{i}_attn.k_norm.weight",
            clean[src + "self_attn.k_norm.weight"])
        put(f"layers_{i}_input_ln.weight", clean[src + "input_layernorm.weight"])
        put(f"layers_{i}_post_attn_ln.weight",
            clean[src + "post_attention_layernorm.weight"])
        put(f"layers_{i}_pre_ffn_ln.weight",
            clean[src + "pre_feedforward_layernorm.weight"])
        put(f"layers_{i}_post_ffn_ln.weight",
            clean[src + "post_feedforward_layernorm.weight"])
        for nm in ("gate_proj", "up_proj", "down_proj"):
            put(f"layers_{i}_mlp.{nm}.kernel",
                dense(clean[src + f"mlp.{nm}.weight"]))
    put("norm.weight", clean["norm.weight"])
    return {"params": p}
