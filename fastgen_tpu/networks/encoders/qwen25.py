"""Qwen2.5(-VL) text decoder (flax) + torch-weight converter — the
Cosmos-Reason1-7B text encoder for Cosmos Predict2.

Counterpart of the reference's ``CosmosPredict2TextEncoder``
(``fastgen/networks/cosmos_predict2/network.py:507-690``), which wraps
``Qwen2_5_VLForConditionalGeneration`` and encodes prompts as the
concatenation of ALL per-layer hidden states (mean-normalized per token):
``full_concat`` of 28 layers x 3584 = 100,352-dim embeddings that the DiT
projects down via its in-network ``crossattn_proj``
(``fastgen_tpu/networks/cosmos/network.py``).

Architecture notes (mirrors ``transformers`` Qwen2.5-VL *text* path; the
vision tower is irrelevant for prompt encoding and is not ported):

* standard RMSNorm (``out * weight``, f32 accumulation);
* GQA attention with q/k/v *biases* (Qwen2 signature), o_proj bias-free,
  no q/k-norm, scaling ``1/sqrt(head_dim)``;
* RoPE rotate-half with ``rope_theta`` (1e6). Qwen2.5-VL uses 3-section
  mRoPE, but for text-only input the temporal/height/width position ids all
  equal the token index, so the sections collapse to standard 1-D RoPE —
  this module implements exactly that (and is therefore only valid for text
  conditioning, which is all Cosmos Predict2 uses it for);
* SwiGLU MLP (silu(gate) * up -> down), bias-free;
* two norms per block (input / post-attention), final model norm;
* hidden-states tuple matches transformers: (embeddings, layer 1..N-1 raw
  outputs, final-normed layer N output) — length ``num_layers + 1``.

Parity vs a reference-exact torch replica is tested in
``tests/test_encoders_qwen25.py``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from fastgen_tpu.networks.encoders.gemma3 import (_apply_rope, _rope_cos_sin)


class QwenRMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf ** 2, axis=-1, keepdims=True)
                               + self.eps)
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        return (y * w.astype(jnp.float32)).astype(x.dtype)


class Qwen25Attention(nn.Module):
    hidden: int
    num_heads: int
    num_kv_heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, rope, mask_bias, cache=None, start_pos=0):
        """``cache=None``: full-sequence attention (encoding). With a cache
        dict ``{"k","v"}`` of fixed [B, max_len, kvh, hd] buffers, the chunk's
        post-RoPE k/v are written at ``start_pos`` (traced ok) and q attends
        over the whole buffer — the fixed-shape KV-cache decode used by
        :func:`generate`. Returns ``out`` or ``(out, new_cache)``."""
        b, n, _ = x.shape
        h, kvh, hd = self.num_heads, self.num_kv_heads, self.head_dim
        q = nn.Dense(h * hd, use_bias=True, name="q_proj")(x).reshape(b, n, h, hd)
        k = nn.Dense(kvh * hd, use_bias=True, name="k_proj")(x).reshape(b, n, kvh, hd)
        v = nn.Dense(kvh * hd, use_bias=True, name="v_proj")(x).reshape(b, n, kvh, hd)
        cos, sin = rope
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        new_cache = None
        if cache is not None:
            start = jnp.asarray(start_pos, jnp.int32)
            new_cache = {
                "k": jax.lax.dynamic_update_slice(
                    cache["k"], k.astype(cache["k"].dtype), (0, start, 0, 0)),
                "v": jax.lax.dynamic_update_slice(
                    cache["v"], v.astype(cache["v"].dtype), (0, start, 0, 0)),
            }
            k, v = new_cache["k"], new_cache["v"]
        if kvh != h:  # GQA
            rep = h // kvh
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        logits = logits + mask_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, h * hd)
        out = nn.Dense(self.hidden, use_bias=False, name="o_proj")(out)
        return out if cache is None else (out, new_cache)


class Qwen25MLP(nn.Module):
    hidden: int
    intermediate: int

    @nn.compact
    def __call__(self, x):
        g = nn.Dense(self.intermediate, use_bias=False, name="gate_proj")(x)
        u = nn.Dense(self.intermediate, use_bias=False, name="up_proj")(x)
        return nn.Dense(self.hidden, use_bias=False, name="down_proj")(
            jax.nn.silu(g) * u)


class Qwen25TextModel(nn.Module):
    """Decoder-only Qwen2.5(-VL text path) LM trunk. ``__call__`` returns
    ``(last_hidden, all_hidden_states)``; defaults are the Qwen2.5-VL-7B
    (Cosmos-Reason1-7B) text config."""

    vocab_size: int = 152064
    hidden: int = 3584
    intermediate: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    rope_theta: float = 1_000_000.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, input_ids, attention_mask: Optional[jnp.ndarray] = None,
                 cache=None, start_pos=0
                 ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        """Encoding mode (``cache=None``): returns ``(last_hidden,
        all_hidden_states)``. Decode mode (``cache`` = :func:`init_cache`
        pytree): the [B, n] chunk is processed at absolute position
        ``start_pos`` against the fixed-shape KV cache and the return is
        ``(last_hidden, new_cache)`` — the contract :func:`generate`'s
        lax.scan body uses."""
        b, n = input_ids.shape
        x = nn.Embed(self.vocab_size, self.hidden, name="embed_tokens")(input_ids)

        if cache is None:
            pos = jnp.arange(n)
            causal = pos[None, :] <= pos[:, None]               # [q, k]
            pad_ok = (jnp.ones((b, n), bool) if attention_mask is None
                      else attention_mask.astype(bool))
            ok = causal[None, None] & pad_ok[:, None, None, :]
        else:
            start = jnp.asarray(start_pos, jnp.int32)
            pos = start + jnp.arange(n)
            k_pos = jnp.arange(cache[0]["k"].shape[1])
            # causal over absolute positions; unwritten cache tail is at
            # k_pos > start + n - 1, already excluded by the same predicate
            ok = (k_pos[None, :] <= pos[:, None])[None, None]
        rope = _rope_cos_sin(pos, self.head_dim, self.rope_theta)
        # finite min, matching torch: fully-masked pad query rows softmax to
        # uniform instead of NaN
        bias = jnp.where(ok, 0.0, jnp.finfo(jnp.float32).min).astype(jnp.float32)

        hidden_states = [x]
        new_cache = []
        for i in range(self.num_layers):
            res = x
            y = QwenRMSNorm(self.hidden, self.eps, name=f"layers_{i}_input_ln")(x)
            attn = Qwen25Attention(self.hidden, self.num_heads,
                                   self.num_kv_heads, self.head_dim,
                                   name=f"layers_{i}_attn")
            if cache is None:
                y = attn(y, rope, bias)
            else:
                y, lc = attn(y, rope, bias, cache=cache[i], start_pos=start_pos)
                new_cache.append(lc)
            x = res + y
            res = x
            y = QwenRMSNorm(self.hidden, self.eps,
                            name=f"layers_{i}_post_attn_ln")(x)
            y = Qwen25MLP(self.hidden, self.intermediate,
                          name=f"layers_{i}_mlp")(y)
            x = res + y
            if i < self.num_layers - 1:
                hidden_states.append(x)
        x = QwenRMSNorm(self.hidden, self.eps, name="norm")(x)
        if cache is not None:
            return x, new_cache
        hidden_states.append(x)
        return x, tuple(hidden_states)


def init_cache(model: "Qwen25TextModel", batch: int, max_len: int,
               dtype=jnp.float32):
    """Fixed-shape per-layer KV cache pytree for :func:`generate` (the same
    static-shape + ``dynamic_update_slice`` layout as the CausalWan caches,
    ``networks/wan/network.py``)."""
    shape = (batch, max_len, model.num_kv_heads, model.head_dim)
    return [{"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for _ in range(model.num_layers)]


def lm_logits(model: "Qwen25TextModel", params, hidden):
    """Token logits from the final hidden state. Qwen2.5-7B ships an untied
    ``lm_head``; when the converter kept it (``convert_qwen25(...,
    keep_lm_head=True)``) it is used, otherwise the embedding is transposed
    (the tied-weights convention of the smaller Qwen2.5 checkpoints)."""
    p = params["params"]
    if "lm_head" in p:
        w = p["lm_head"]["kernel"]                  # [hidden, vocab]
        return hidden.astype(jnp.float32) @ w.astype(jnp.float32)
    emb = p["embed_tokens"]["embedding"]            # [vocab, hidden]
    return hidden.astype(jnp.float32) @ emb.astype(jnp.float32).T


def generate(model: "Qwen25TextModel", params, prompt_ids,
             max_new_tokens: int, temperature: float = 0.0,
             key: Optional[jax.Array] = None, eos_id: Optional[int] = None,
             cache_dtype=jnp.float32):
    """KV-cached autoregressive decoding, TPU-native: one jitted prefill over
    the prompt, then a single ``lax.scan`` whose body is the one-token decode
    step (fixed shapes throughout; the cache is scan-carried so XLA keeps it
    on device and updates in place).

    The in-framework equivalent of the reference's Qwen prompt-expansion
    generation (``third_party/wan_prompt_expand``), also used by
    ``utils/prompt_expand.FlaxQwenPromptExpander``.

    Returns ``tokens [B, max_new_tokens]`` (int32); positions after an
    ``eos_id`` hit repeat ``eos_id``.
    """
    b, plen = prompt_ids.shape
    max_len = plen + max_new_tokens
    cache = init_cache(model, b, max_len, cache_dtype)
    key = jax.random.PRNGKey(0) if key is None else key
    eos = -1 if eos_id is None else int(eos_id)

    @jax.jit
    def prefill(params, ids, cache):
        h, cache = model.apply(params, ids, cache=cache, start_pos=0)
        logits = lm_logits(model, params, h[:, -1])
        return logits, cache

    def sample_tok(logits, k):
        if temperature and temperature > 0:
            return jax.random.categorical(k, logits / temperature, axis=-1)
        return jnp.argmax(logits, axis=-1)

    @jax.jit
    def decode_all(params, logits0, cache, key):
        def step(carry, k):
            cache, logits, pos, done = carry
            tok = sample_tok(logits, k).astype(jnp.int32)
            done = done | (tok == eos)
            tok = jnp.where(done & (eos >= 0), eos, tok)
            h, cache = model.apply(params, tok[:, None], cache=cache,
                                   start_pos=pos)
            logits = lm_logits(model, params, h[:, -1])
            return (cache, logits, pos + 1, done), tok

        keys = jax.random.split(key, max_new_tokens)
        init = (cache, logits0, jnp.asarray(plen, jnp.int32),
                jnp.zeros((b,), bool))
        _, toks = jax.lax.scan(step, init, keys)
        return toks.T                                # [B, T]

    logits0, cache = prefill(params, prompt_ids.astype(jnp.int32), cache)
    return decode_all(params, logits0, cache, key)


def mean_normalize(x, eps: float = 1e-8):
    """Per-token mean/std normalization over the feature dim (ref
    ``CosmosPredict2TextEncoder.mean_normalize``, ``network.py:594-596``;
    note torch ``std`` is the unbiased N-1 estimator)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True) * (x.shape[-1] / (x.shape[-1] - 1))
    return (xf - mean) / (jnp.sqrt(var) + eps)


def combine_hidden_states(hidden_states, strategy: str = "full_concat",
                          n_layers_per_group: int = 5):
    """Cosmos-Reason1 embedding assembly (ref ``network.py:645-662``): skip
    the embedding layer, mean-normalize each hidden state, then combine."""
    normed = [mean_normalize(h) for h in hidden_states[1:]]
    if strategy == "full_concat":
        return jnp.concatenate(normed, axis=-1)
    if strategy == "mean_pooling":
        return jnp.stack(normed).mean(axis=0)
    if strategy == "pool_every_n_layers_and_concat":
        pooled = []
        for i in range(0, len(normed), n_layers_per_group):
            pooled.append(jnp.stack(normed[i:i + n_layers_per_group]).mean(axis=0))
        return jnp.concatenate(pooled, axis=-1)
    raise ValueError(f"Invalid embedding_concat_strategy: {strategy}")


def convert_qwen25(sd: dict, keep_lm_head: bool = False) -> dict:
    """Map a transformers Qwen2.5(-VL) state dict to :class:`Qwen25TextModel`
    params. Accepts ``Qwen2_5_VLForConditionalGeneration`` keys (vision tower
    ignored; ``model.``/``language_model.`` prefixes stripped) or a bare
    text-model dict. ``keep_lm_head`` retains the untied output head for
    :func:`generate` (encoding-only use drops it)."""
    import re

    lm_head = None
    clean = {}
    for k, v in sd.items():
        if k.startswith(("visual.", "model.visual.")):
            continue
        if "lm_head" in k:
            if keep_lm_head:
                lm_head = np.asarray(v)
            continue
        k = re.sub(r"^(model\.)?(language_model\.)?(model\.)?", "", k)
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
        for nm in ("q_proj", "k_proj", "v_proj"):
            put(f"layers_{i}_attn.{nm}.kernel",
                dense(clean[src + f"self_attn.{nm}.weight"]))
            put(f"layers_{i}_attn.{nm}.bias",
                clean[src + f"self_attn.{nm}.bias"])
        put(f"layers_{i}_attn.o_proj.kernel",
            dense(clean[src + "self_attn.o_proj.weight"]))
        put(f"layers_{i}_input_ln.weight", clean[src + "input_layernorm.weight"])
        put(f"layers_{i}_post_attn_ln.weight",
            clean[src + "post_attention_layernorm.weight"])
        for nm in ("gate_proj", "up_proj", "down_proj"):
            put(f"layers_{i}_mlp.{nm}.kernel",
                dense(clean[src + f"mlp.{nm}.weight"]))
    put("norm.weight", clean["norm.weight"])
    if lm_head is not None:
        put("lm_head.kernel", dense(lm_head))
    return {"params": p}
