"""Attention dispatch: XLA fallback + Pallas flash kernels, one switch point.

Every transformer backbone calls ``dot_product_attention`` so the whole zoo
switches kernels in one place (the reference toggles SDPA backends per-net,
``networks/Wan/network.py:596-600``). Layout [B, N, H, D].

``impl``: "auto" | "xla" | "flash". "auto" uses the Pallas flash kernel on TPU
for long sequences; block-causal masks (diffusion-forcing video, ref
FlexAttention ``network_causal.py:131-196``) are expressed analytically via
``causal_block`` so the kernel can skip fully-masked key blocks. The flash
path carries a custom VJP, so training and jvp-carrying calls (sCM/MeanFlow)
work through either implementation.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 1024


def _xla_attention(q, k, v, bias=None, mask=None, scale=None,
                   causal_block: Optional[int] = None):
    """Reference implementation: fp32 softmax, any backend."""
    b, n, h, d = q.shape
    scale = scale if scale is not None else 1.0 / np.sqrt(d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal_block is not None:
        idx = jnp.arange(n) // causal_block
        allowed = (idx[None, :] <= idx[:, None])[None, None]
        mask = allowed if mask is None else (mask & allowed)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def dot_product_attention(q, k, v, bias=None, mask=None, scale=None,
                          impl: Optional[str] = None,
                          causal_block: Optional[int] = None,
                          remat_name: Optional[str] = None):
    """Multi-head attention over [B, N, H, D] tensors.

    ``remat_name`` tags the attention output (and the flash kernel's
    logsumexp residual) with ``jax.ad_checkpoint.checkpoint_name`` so a
    block-level ``jax.checkpoint`` with ``save_attn_policy(remat_name)``
    saves them across the remat boundary — the backward recompute then skips
    the attention forward (kernels/flash_attention.py ``_flash_attach``).
    Inert without a matching policy."""
    impl = impl or os.environ.get("FASTGEN_ATTN_IMPL", "auto")
    n = q.shape[1]

    # cross-attention (n_q != n_kv) is supported by the kernel (q/kv are
    # padded independently) as long as no block-causal mask is requested.
    # Tensor/sequence-parallel runs (mesh tp>1 or sp>1) force the XLA path:
    # a pallas_call is a single-device program GSPMD cannot partition, while
    # the XLA einsum attention partitions cleanly over the tp-sharded head
    # axis / sp-sharded query axis.
    from fastgen_tpu.parallel.sp import sp_size
    from fastgen_tpu.utils.global_vars import get_global_var

    flash_ok = (bias is None and mask is None and k.shape == v.shape
                and q.shape[0] == k.shape[0] and q.shape[2:] == k.shape[2:]
                and (causal_block is None or q.shape[1] == k.shape[1])
                and int(get_global_var("mesh_tp", 1) or 1) <= 1
                and sp_size() <= 1)
    use_flash = (impl == "flash" or
                 (impl == "auto" and jax.default_backend() == "tpu"
                  and n >= _FLASH_MIN_SEQ)) and flash_ok

    if use_flash:
        from fastgen_tpu.ops.kernels.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, causal_block=causal_block,
                               remat_name=remat_name)
    out = _xla_attention(q, k, v, bias=bias, mask=mask, scale=scale,
                         causal_block=causal_block)
    if remat_name:
        # XLA path: saving the output still spares the downstream recompute
        # (the softmax backward re-derives its own internals either way)
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(out, remat_name + "_out")
    return out
