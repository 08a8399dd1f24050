"""Host-side encoder wrappers with the reference's ``.encode()`` contract.

Each wrapper mirrors one reference class:

* ``StableDiffusionTextEncoder``  (``SD15/network.py:344-436``)  -> CLIP-L
* ``SDXLTextEncoder``             (``SDXL/network.py:46-157``)   -> CLIP-L + bigG,
  concat penultimate hidden states + pooled/add-embeds from encoder 2
* ``FluxTextEncoder``             (``Flux/network.py:25-170``)   -> CLIP pooled + T5 seq
* ``WanTextEncoder``              (``Wan/network.py:431-483``)   -> UMT5-XXL
* ``CogVideoXTextEncoder``        (``CogVideoX/network.py:246-301``) -> T5-XXL
* ``WanImageEncoder``             (``WanI2V/network.py:41-79``)  -> CLIP vision

They tokenize on the host, run a jitted flax encode program, cache the
unconditional ("") embeddings like the reference (``SD15/network.py:366-371``),
and return arrays in the ``condition`` dict layout the networks consume.

Tokenizers: a local HF tokenizer (``transformers``) is used when one can be
loaded from ``HF_HOME`` with ``local_files_only``; otherwise a deterministic
hash tokenizer stands in so the full pipeline runs end-to-end offline
(embeddings are then only self-consistent, not pretrained-compatible).
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from fastgen_tpu.networks.encoders.clip import CLIPTextTransformer, CLIPVisionTransformer
from fastgen_tpu.networks.encoders.t5 import T5Encoder
from fastgen_tpu.utils import logging_utils as logger


class HashTokenizer:
    """Deterministic offline stand-in tokenizer (stable across processes)."""

    def __init__(self, vocab_size: int, max_length: int,
                 bos: Optional[int] = None, eos: Optional[int] = 1, pad: int = 0):
        self.vocab_size, self.max_length = vocab_size, max_length
        self.bos, self.eos, self.pad = bos, eos, pad

    def __call__(self, texts: Sequence[str], max_length: Optional[int] = None):
        import hashlib
        L = max_length or self.max_length
        ids = np.full((len(texts), L), self.pad, dtype=np.int32)
        mask = np.zeros((len(texts), L), dtype=np.int32)
        for b, text in enumerate(texts):
            toks: List[int] = [] if self.bos is None else [self.bos]
            for w in text.split():
                h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                toks.append(2 + h % (self.vocab_size - 2))
            if self.eos is not None:
                toks.append(self.eos)
            toks = toks[:L]
            ids[b, :len(toks)] = toks
            mask[b, :len(toks)] = 1
        return ids, mask


def load_hf_tokenizer(name_or_path: str, cls: str = "AutoTokenizer"):
    """Try to load a local HF tokenizer; None if unavailable (zero egress)."""
    try:
        import transformers
        tok_cls = getattr(transformers, cls)
        return tok_cls.from_pretrained(name_or_path, local_files_only=True)
    except Exception as e:  # noqa: BLE001 - any failure means "offline"
        logger.warning(f"tokenizer {name_or_path} unavailable locally ({e})")
        return None


def hash_fallback_allowed(flag: Optional[bool] = None) -> bool:
    """HashTokenizer stand-in is opt-in: embeddings from it are only
    self-consistent, never pretrained-compatible, so real-weights runs must
    fail loudly instead of silently generating garbage. Enable per encoder
    (``allow_hash_tokenizer=True``) or globally
    (``FASTGEN_ALLOW_HASH_TOKENIZER=1``)."""
    import os
    if flag is not None:
        return flag
    return os.environ.get("FASTGEN_ALLOW_HASH_TOKENIZER", "0") not in ("0", "", "false")


def _tokenize(tokenizer, texts, vocab_size, max_length, allow_hash=None, **hash_kw):
    if tokenizer is None:
        if not hash_fallback_allowed(allow_hash):
            raise RuntimeError(
                "No real tokenizer is available and the HashTokenizer fallback "
                "is not enabled. Its embeddings are not compatible with "
                "pretrained weights; pass allow_hash_tokenizer=True (or set "
                "FASTGEN_ALLOW_HASH_TOKENIZER=1) to opt in for from-scratch / "
                "smoke runs, or provide tokenizer_path pointing at a local "
                "tokenizer.")
        logger.warning("using HashTokenizer fallback (opt-in)")
        tokenizer = HashTokenizer(vocab_size, max_length, **hash_kw)
        return tokenizer(texts)
    out = tokenizer(list(texts), max_length=max_length, padding="max_length",
                    truncation=True, return_tensors="np")
    return out["input_ids"].astype(np.int32), out["attention_mask"].astype(np.int32)


def _resolve_dtype(dtype):
    """Accept 'float32'/'bfloat16' strings from LazyCall configs."""
    if isinstance(dtype, str):
        from fastgen_tpu.utils import PRECISION_MAP
        return PRECISION_MAP[dtype]
    return dtype


class FrozenEncoder:
    """Shared plumbing: params + a jitted apply, bf16 by default."""

    def __init__(self, module, params=None, rng_seed: int = 0,
                 example_ids_shape: Tuple[int, int] = (1, 8), dtype=jnp.bfloat16):
        self.module = module
        dtype = _resolve_dtype(dtype)
        self.dtype = dtype
        if params is None:
            params = module.init(jax.random.PRNGKey(rng_seed),
                                 jnp.zeros(example_ids_shape, jnp.int32))["params"]
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype) if jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x), params)


class StableDiffusionTextEncoder(FrozenEncoder):
    """CLIP-L text encoder (SD1.5). ``encode(prompts) -> [B, 77, 768]``."""

    def __init__(self, params=None, tokenizer_path: Optional[str] = None,
                 max_length: int = 77, dtype=jnp.bfloat16,
                 allow_hash_tokenizer: Optional[bool] = None, **module_kw):
        module = CLIPTextTransformer(**module_kw)
        super().__init__(module, params, dtype=dtype)
        self.max_length = max_length
        self.allow_hash = allow_hash_tokenizer
        self.tokenizer = load_hf_tokenizer(tokenizer_path, "CLIPTokenizer") \
            if tokenizer_path else None
        self._apply = jax.jit(lambda p, ids: self.module.apply({"params": p}, ids)[0])
        self._uncond: Optional[jnp.ndarray] = None

    def _ids(self, prompts):
        ids, _ = _tokenize(self.tokenizer, prompts, self.module.vocab_size,
                           self.max_length, allow_hash=self.allow_hash,
                           bos=49406, eos=49407, pad=49407)
        return ids

    def encode(self, prompts: Sequence[str], precision=None):
        if all(p == "" for p in prompts):
            if self._uncond is None:
                self._uncond = self._apply(self.params, jnp.asarray(self._ids([""])))
            emb = jnp.repeat(self._uncond, len(prompts), axis=0)
        else:
            emb = self._apply(self.params, jnp.asarray(self._ids(list(prompts))))
        return emb.astype(precision or self.dtype)


class SDXLTextEncoder:
    """Dual CLIP (L + bigG): concat penultimate hiddens; pooled from bigG.

    ``encode(prompts) -> {"text_embeds": [B,77,2048], "pooled": [B,1280]}``.
    """

    def __init__(self, params_1=None, params_2=None, tokenizer_path=None,
                 dtype=jnp.bfloat16, allow_hash_tokenizer: Optional[bool] = None,
                 enc1_kw: Optional[dict] = None, enc2_kw: Optional[dict] = None):
        self.allow_hash = allow_hash_tokenizer
        enc1_kw = dict(enc1_kw or {})
        enc2_kw = dict(enc2_kw or {})
        enc2_kw.setdefault("hidden_size", 1280)
        enc2_kw.setdefault("num_layers", 32)
        enc2_kw.setdefault("num_heads", 20)
        enc2_kw.setdefault("intermediate_size", 5120)
        enc2_kw.setdefault("act", "gelu")
        enc2_kw.setdefault("projection_dim", 1280)
        self.enc1 = FrozenEncoder(CLIPTextTransformer(**enc1_kw), params_1, dtype=dtype)
        self.enc2 = FrozenEncoder(CLIPTextTransformer(**enc2_kw), params_2, dtype=dtype)
        dtype = _resolve_dtype(dtype)
        self.dtype = dtype
        self.tokenizer = load_hf_tokenizer(tokenizer_path, "CLIPTokenizer") \
            if tokenizer_path else None

        def apply(p1, p2, ids):
            h1, _ = self.enc1.module.apply({"params": p1}, ids, return_hidden_layer=-2)
            h2, pooled = self.enc2.module.apply({"params": p2}, ids,
                                                return_hidden_layer=-2)
            return jnp.concatenate([h1, h2], axis=-1), pooled

        self._apply = jax.jit(apply)

    def encode(self, prompts: Sequence[str], precision=None):
        ids, _ = _tokenize(self.tokenizer, prompts, self.enc1.module.vocab_size,
                           77, allow_hash=self.allow_hash,
                           bos=49406, eos=49407, pad=49407)
        emb, pooled = self._apply(self.enc1.params, self.enc2.params, jnp.asarray(ids))
        dt = precision or self.dtype
        return {"text_embeds": emb.astype(dt), "pooled": pooled.astype(dt)}


class T5TextEncoder(FrozenEncoder):
    """T5/UMT5 sequence encoder (Wan: UMT5; CogVideoX/Flux: T5)."""

    def __init__(self, params=None, tokenizer_path: Optional[str] = None,
                 max_length: int = 512, dtype=jnp.bfloat16,
                 allow_hash_tokenizer: Optional[bool] = None, **module_kw):
        module = T5Encoder(**module_kw)
        super().__init__(module, params, dtype=dtype)
        self.max_length = max_length
        self.allow_hash = allow_hash_tokenizer
        self.tokenizer = load_hf_tokenizer(tokenizer_path) if tokenizer_path else None
        self._apply = jax.jit(
            lambda p, ids, mask: self.module.apply({"params": p}, ids, mask))

    def encode(self, prompts: Sequence[str], precision=None):
        ids, mask = _tokenize(self.tokenizer, prompts, self.module.vocab_size,
                              self.max_length, allow_hash=self.allow_hash,
                              bos=None, eos=1, pad=0)
        emb = self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))
        # zero out padded positions like the reference (Wan masks pad tokens)
        emb = emb * jnp.asarray(mask)[..., None].astype(emb.dtype)
        return emb.astype(precision or self.dtype)


WanTextEncoder = partial(T5TextEncoder, per_layer_rel_bias=True)
CogVideoXTextEncoder = partial(T5TextEncoder, per_layer_rel_bias=False, max_length=226)


class Gemma3TextEncoder(FrozenEncoder):
    """Gemma3 LM as a frozen LTX-2 caption encoder (ref ``LTX2TextEncoder``,
    ``fastgen/networks/LTX2/network.py:314-377``): run with all hidden states,
    stack [B, T, H, L+1], masked-normalize and flatten to
    [B, T, hidden*(num_layers+1)] via :func:`pack_text_embeds`."""

    def __init__(self, params=None, tokenizer_path: Optional[str] = None,
                 pretrained_path: Optional[str] = None, max_length: int = 1024,
                 scale_factor: float = 8.0, dtype=jnp.bfloat16,
                 allow_hash_tokenizer: Optional[bool] = None, **module_kw):
        self.allow_hash = allow_hash_tokenizer
        from fastgen_tpu.networks.encoders.gemma3 import (
            Gemma3TextModel, convert_gemma3, pack_text_embeds)

        module = Gemma3TextModel(**module_kw)
        if params is None and pretrained_path:
            from fastgen_tpu.utils.torch_convert import load_torch_state_dict
            params = convert_gemma3(load_torch_state_dict(pretrained_path))["params"]
        super().__init__(module, params, dtype=dtype)
        self.max_length = max_length
        self.scale_factor = scale_factor
        self.tokenizer = load_hf_tokenizer(tokenizer_path) if tokenizer_path else None
        if self.tokenizer is not None:
            self.tokenizer.padding_side = "left"
            if self.tokenizer.pad_token is None:
                self.tokenizer.pad_token = self.tokenizer.eos_token
        # the HashTokenizer fallback pads on the right
        self.padding_side = "left" if self.tokenizer is not None else "right"

        def apply(p, ids, mask):
            _, hidden_states = self.module.apply({"params": p}, ids, mask)
            return pack_text_embeds(hidden_states, mask, self.scale_factor,
                                    self.padding_side)

        self._apply = jax.jit(apply)

    def encode(self, prompts: Sequence[str], precision=None):
        ids, mask = _tokenize(self.tokenizer, prompts, self.module.vocab_size,
                              self.max_length, allow_hash=self.allow_hash,
                              bos=2, eos=1, pad=0)
        emb = self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return emb.astype(precision or self.dtype)


LTX2TextEncoder = Gemma3TextEncoder


class FluxTextEncoder:
    """CLIP pooled + T5 sequence (``Flux/network.py:25-170``)."""

    def __init__(self, clip_params=None, t5_params=None, dtype=jnp.bfloat16,
                 clip_kw: Optional[dict] = None, t5_kw: Optional[dict] = None,
                 t5_max_length: int = 512, tokenizer_paths: Tuple = (None, None),
                 allow_hash_tokenizer: Optional[bool] = None):
        self.clip = StableDiffusionTextEncoder(
            clip_params, tokenizer_paths[0], dtype=dtype,
            allow_hash_tokenizer=allow_hash_tokenizer, **(clip_kw or {}))
        t5_kw = dict(t5_kw or {})
        t5_kw.setdefault("per_layer_rel_bias", False)
        self.t5 = T5TextEncoder(t5_params, tokenizer_paths[1],
                                max_length=t5_max_length, dtype=dtype,
                                allow_hash_tokenizer=allow_hash_tokenizer, **t5_kw)
        self.dtype = dtype

        def pooled_fn(p, ids):
            _, pooled = self.clip.module.apply({"params": p}, ids)
            return pooled

        self._pooled = jax.jit(pooled_fn)

    def encode(self, prompts: Sequence[str], precision=None):
        dt = precision or self.dtype
        seq = self.t5.encode(prompts, precision=dt)
        ids = jnp.asarray(self.clip._ids(list(prompts)))
        pooled = self._pooled(self.clip.params, ids).astype(dt)
        return {"text_embeds": seq, "pooled": pooled}


class VAEWrapper:
    """Frozen image VAE with the reference's ``vae.encode/decode`` contract
    (``DiT/network.py:794-837``). Images [B,H,W,C] <-> latents [B,h,w,zc]."""

    def __init__(self, params=None, dtype=jnp.bfloat16, seed: int = 0,
                 example_hw: int = 32, **module_kw):
        from fastgen_tpu.networks.encoders.vae import AutoencoderKL
        self.module = AutoencoderKL(**module_kw)
        dtype = _resolve_dtype(dtype)
        self.dtype = dtype
        if params is None:
            params = self.module.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, example_hw, example_hw, 3), dtype))["params"]
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self._enc_argmax = jax.jit(lambda p, x: self.module.apply(
            {"params": p}, x, mode="argmax", method=self.module.encode))
        self._enc_sample = jax.jit(lambda p, x, k: self.module.apply(
            {"params": p}, x, rng=k, mode="sample", method=self.module.encode))
        self._dec = jax.jit(lambda p, z: self.module.apply(
            {"params": p}, z, method=self.module.decode))

    def encode(self, x, rng=None, mode: str = "sample", precision=None):
        x = jnp.asarray(x, self.dtype)
        if mode == "argmax" or rng is None:
            z = self._enc_argmax(self.params, x)
        else:
            z = self._enc_sample(self.params, x, rng)
        return z.astype(precision or self.dtype)

    def decode(self, z, precision=None):
        return self._dec(self.params, jnp.asarray(z, self.dtype)).astype(
            precision or self.dtype)


class VideoVAEWrapper:
    """Frozen causal video VAE (``Wan/network.py:484-541``).
    Videos [B,T,H,W,C] <-> latents [B,t,h,w,zc].

    ``layout="behavioral"`` (default) is the lightweight from-scratch causal
    VAE (``video_vae.CausalVideoVAE``) used by the raw-pixel smoke configs;
    ``layout="wan"`` is the diffusers-``AutoencoderKLWan``-exact network
    (``wan_vae.AutoencoderKLWan``) that loads real Wan 2.1 VAE weights via
    ``checkpoint_path=<diffusers vae .pth/.safetensors>`` (converter
    ``torch_convert.convert_wan_vae``, replica-parity-tested in
    ``tests/test_wan_vae.py``); ``layout="cogvideox"`` is the
    diffusers-``AutoencoderKLCogVideoX``-exact network
    (``cogvideox_vae.AutoencoderKLCogVideoX``, ref
    ``CogVideoX/network.py:302-347``; converter
    ``torch_convert.convert_cogvideox_vae``, parity-tested in
    ``tests/test_cogvideox_vae.py``)."""

    def __init__(self, params=None, dtype=jnp.bfloat16, seed: int = 0,
                 example_shape: Tuple[int, int, int] = (5, 32, 32),
                 layout: str = "behavioral", checkpoint_path=None, **module_kw):
        if layout in ("wan", "cogvideox"):
            if layout == "wan":
                from fastgen_tpu.networks.encoders.wan_vae import WanVAE
                inner = WanVAE(params=params, dtype=_resolve_dtype(dtype),
                               seed=seed, checkpoint_path=checkpoint_path,
                               **module_kw)
            else:
                from fastgen_tpu.networks.encoders.cogvideox_vae import \
                    CogVideoXVAE
                inner = CogVideoXVAE(params=params,
                                     dtype=_resolve_dtype(dtype), seed=seed,
                                     checkpoint_path=checkpoint_path,
                                     **module_kw)
            self.module = inner.module
            self.dtype = inner.dtype
            self.params = inner.params
            self.encode = inner.encode
            self.decode = inner.decode
            return
        from fastgen_tpu.networks.encoders.video_vae import CausalVideoVAE
        self.module = CausalVideoVAE(**module_kw)
        dtype = _resolve_dtype(dtype)
        self.dtype = dtype
        if params is None:
            t, h, w = example_shape
            params = self.module.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, t, h, w, 3), dtype))["params"]
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self._enc_argmax = jax.jit(lambda p, x: self.module.apply(
            {"params": p}, x, mode="argmax", method=self.module.encode))
        self._enc_sample = jax.jit(lambda p, x, k: self.module.apply(
            {"params": p}, x, rng=k, mode="sample", method=self.module.encode))
        self._dec = jax.jit(lambda p, z: self.module.apply(
            {"params": p}, z, method=self.module.decode))

    def encode(self, x, rng=None, mode: str = "sample", precision=None):
        x = jnp.asarray(x, self.dtype)
        if mode == "argmax" or rng is None:
            z = self._enc_argmax(self.params, x)
        else:
            z = self._enc_sample(self.params, x, rng)
        return z.astype(precision or self.dtype)

    def decode(self, z, precision=None):
        return self._dec(self.params, jnp.asarray(z, self.dtype)).astype(
            precision or self.dtype)


class WanImageEncoder(FrozenEncoder):
    """CLIP-vision first-frame encoder for I2V (``WanI2V/network.py:41-79``).

    ``encode(images [B,H,W,3] in [-1,1]) -> [B, tokens, hidden]`` from the
    penultimate layer (the reference takes hidden_states[-2]).
    """

    def __init__(self, params=None, dtype=jnp.bfloat16, **module_kw):
        module = CLIPVisionTransformer(**module_kw)
        self.module = module
        dtype = _resolve_dtype(dtype)
        self.dtype = dtype
        if params is None:
            s = module.image_size
            params = module.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, s, s, 3), dtype))["params"]
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype) if jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x), params)
        self._apply = jax.jit(lambda p, im: self.module.apply(
            {"params": p}, im, return_hidden_layer=-2)[0])

    def encode(self, images, precision=None):
        s = self.module.image_size
        images = jnp.asarray(images, self.dtype)
        if images.shape[1] != s or images.shape[2] != s:
            images = jax.image.resize(
                images, (images.shape[0], s, s, images.shape[3]), "bilinear")
        # [-1,1] -> CLIP normalization
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073], images.dtype)
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711], images.dtype)
        images = ((images + 1.0) / 2.0 - mean) / std
        return self._apply(self.params, images).astype(precision or self.dtype)


class CosmosTextEncoder(FrozenEncoder):
    """Cosmos-Reason1-7B (Qwen2.5-VL text path) as a frozen prompt encoder
    (ref ``CosmosPredict2TextEncoder``,
    ``fastgen/networks/cosmos_predict2/network.py:507-690``): run the LM with
    all hidden states, mean-normalize each layer's output and combine
    (default ``full_concat`` -> [B, T, num_layers*hidden] = 100,352-dim for
    the 7B config); the Cosmos DiT's ``crossattn_proj`` projects these to its
    text dim in-network.

    The reference wraps each prompt in a fixed chat conversation before
    tokenizing; with a real tokenizer directory (``tokenizer_path``) the same
    chat template is applied when available, else prompts are encoded plain.
    """

    SYSTEM_PROMPT = ("You are a helpful assistant who will provide prompts "
                     "to an image generator.")

    def __init__(self, params=None, tokenizer_path: Optional[str] = None,
                 pretrained_path: Optional[str] = None, max_length: int = 512,
                 embedding_concat_strategy: str = "full_concat",
                 n_layers_per_group: int = 5, dtype=jnp.bfloat16,
                 allow_hash_tokenizer: Optional[bool] = None, **module_kw):
        self.allow_hash = allow_hash_tokenizer
        from fastgen_tpu.networks.encoders.qwen25 import (
            Qwen25TextModel, combine_hidden_states, convert_qwen25)

        module = Qwen25TextModel(**module_kw)
        if params is None and pretrained_path:
            from fastgen_tpu.utils.torch_convert import load_torch_state_dict
            params = convert_qwen25(load_torch_state_dict(pretrained_path))["params"]
        super().__init__(module, params, dtype=dtype)
        self.max_length = max_length
        self.strategy = embedding_concat_strategy
        self.tokenizer = load_hf_tokenizer(tokenizer_path) if tokenizer_path else None
        if self.tokenizer is not None and self.tokenizer.pad_token is None:
            self.tokenizer.pad_token = self.tokenizer.eos_token

        def apply(p, ids, mask):
            _, hidden_states = self.module.apply({"params": p}, ids, mask)
            return combine_hidden_states(hidden_states, self.strategy,
                                         n_layers_per_group)

        self._apply = jax.jit(apply)

    @property
    def embedding_dim(self) -> int:
        m = self.module
        if self.strategy == "full_concat":
            return m.num_layers * m.hidden
        if self.strategy == "mean_pooling":
            return m.hidden
        n_groups = -(-m.num_layers // 5)
        return n_groups * m.hidden

    def _ids(self, prompts):
        tok = self.tokenizer
        if tok is not None and getattr(tok, "chat_template", None):
            ids_batch = []
            pad_id = tok.pad_token_id or 0
            for prompt in prompts:
                conv = [{"role": "system", "content": self.SYSTEM_PROMPT},
                        {"role": "user", "content": prompt}]
                ids = tok.apply_chat_template(conv, tokenize=True,
                                              add_generation_prompt=False)
                ids = list(ids)[:self.max_length]
                ids += [pad_id] * (self.max_length - len(ids))
                ids_batch.append(ids)
            ids = np.asarray(ids_batch, np.int32)
            # ref encodes with no attention mask (pads attend causally too);
            # mirror that so embeddings match the torch path bit-for-bit
            mask = np.ones_like(ids)
            return ids, mask
        return _tokenize(self.tokenizer, prompts, self.module.vocab_size,
                         self.max_length, allow_hash=self.allow_hash)

    def encode(self, prompts: Sequence[str], precision=None):
        ids, mask = self._ids(list(prompts))
        emb = self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return emb.astype(precision or self.dtype)


CosmosPredict2TextEncoder = CosmosTextEncoder
