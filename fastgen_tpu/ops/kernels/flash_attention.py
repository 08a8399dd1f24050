"""Pallas TPU flash attention (forward) with optional block-causal masking.

The hot op of every DiT/video backbone (SURVEY §7: FlexAttention block-causal
masks + SDPA -> one Pallas kernel). Canonical TPU pattern: grid
(batch*heads, q_blocks, k_blocks) with the k axis innermost; VMEM scratch
carries the running max / denominator / accumulator across k blocks
(online softmax), so HBM traffic is O(N*D) per query block instead of O(N^2).

Backward runs through a custom VJP that recomputes attention with the XLA
fallback — correct everywhere, and training-path kernel time is dominated by
the matmuls XLA already fuses well; a Pallas backward kernel is a later
optimization.

Block-causal masking (`causal_block=c`): query token i may attend to key j iff
j // c <= i // c (diffusion forcing, ref ``network_causal.py:131-196``).
Fully-masked k-blocks are skipped analytically via the block index comparison.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch,
                      *, scale: float, block_q: int, block_k: int,
                      causal_block: Optional[int], seq_len: int,
                      valid_len: int):
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    qi = pl.program_id(1)

    def _compute():
        # dots run in the input dtype (bf16 on the fast MXU path) with f32
        # accumulation via preferred_element_type
        q = q_ref[0]                                # [block_q, d]
        k = k_ref[0]                                # [block_k, d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale

        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal_block is not None:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            allowed = (k_pos // causal_block) <= (q_pos // causal_block)
            s = jnp.where(allowed, s, NEG_INF)
        if valid_len != seq_len:
            # sequence padded up to the block size: mask padded keys
            s = jnp.where(k_pos < valid_len, s, NEG_INF)

        m_prev = m_scratch[:]                        # [block_q, 1]
        l_prev = l_scratch[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                       # [block_q, block_k]
        alpha = jnp.exp(m_prev - m_new)              # [block_q, 1]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scratch[:] = m_new
        l_scratch[:] = l_new

    if causal_block is not None:
        # skip k blocks that lie entirely in masked-out (future) blocks:
        # the first key of this k block must be allowed for the LAST query row
        last_q = qi * block_q + block_q - 1
        first_k = ki * block_k
        needed = (first_k // causal_block) <= (last_q // causal_block)
        pl.when(needed)(_compute)
    else:
        _compute()

    @pl.when(ki == num_k - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[:] / jnp.maximum(l_scratch[:], 1e-30)).astype(o_ref.dtype)


def _flash_forward(q, k, v, scale, causal_block, block_q, block_k,
                   interpret: bool = False):
    """q,k,v: [BH, N, D] -> out [BH, N, D]. Ragged N is zero-padded up to the
    block size; padded keys are masked analytically, padded query rows are
    sliced off."""
    bh, n, d = q.shape
    # prefer blocks that divide n exactly: padded rows/keys are wasted MXU
    # work and large blocks amortize the online-softmax VPU overhead
    # (32760 tokens: blocks (1560, 936) run ~2x faster than (256, 512));
    # f32 inputs double VMEM pressure -> halve the caps to stay under ~16MB
    if jnp.dtype(q.dtype).itemsize >= 4:
        block_q, block_k = block_q // 2, block_k // 2
    n8 = -(-n // 8) * 8
    bq = _divisor_block(n8, block_q, floor=min(block_q, 128))
    bk = _divisor_block(n8, block_k, floor=min(block_k, 128))
    if bq is not None and bk is not None:
        block_q, block_k, n_pad = bq, bk, n8
    else:
        block_q = block_k = min(block_q, block_k, max(8, n8))
        n_pad = -(-n // block_q) * block_q
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    grid = (bh, n_pad // block_q, n_pad // block_k)

    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, block_q=block_q, block_k=block_k,
        causal_block=causal_block, seq_len=n_pad, valid_len=n)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)[:, :n]


def _decode_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch,
                   acc_scratch, *, scale: float, block_k: int):
    """Cross-length attention against a fixed-capacity KV cache: query chunk
    [block_q, d] vs key blocks of the cache, keys >= valid_len masked out.
    ``valid_len`` is a traced scalar (scalar-prefetch), so one compiled kernel
    serves every autoregressive step; key blocks entirely past valid_len are
    skipped (and their HBM fetch redirected to block 0 by the index map)."""
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    valid = valid_ref[0]
    first_k = ki * block_k

    @pl.when(first_k < valid)
    def _compute():
        # native-dtype dots (bf16 MXU path), f32 accumulation
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        k_pos = first_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_pos < valid, s, NEG_INF)

        m_prev = m_scratch[:]
        l_prev = l_scratch[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scratch[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scratch[:] = m_new

    @pl.when(ki == num_k - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[:] / jnp.maximum(l_scratch[:], 1e-30)).astype(o_ref.dtype)


def _divisor_block(n: int, cap: int, floor: int = 128) -> Optional[int]:
    """Largest multiple-of-8 divisor of n in [floor, cap] (avoids padding —
    and thus copying — a multi-GB KV cache)."""
    for b in range(cap - cap % 8, floor - 1, -8):
        if n % b == 0:
            return b
    return None


def _decode_forward(q, k, v, valid_len, scale, block_q, block_k, interpret=False):
    """q: [BH, Nq, D]; k,v: [BH, Nkv, D]; valid_len: traced int32 scalar."""
    bh, n_q, d = q.shape
    n_kv = k.shape[1]

    if jnp.dtype(q.dtype).itemsize >= 4:  # f32: halve blocks for VMEM
        block_q, block_k = block_q // 2, block_k // 2
    # prefer a q block that divides n_q exactly — padded query rows are pure
    # wasted MXU work (e.g. 4680 -> block 1560 runs ~10% faster than 512)
    bq = _divisor_block(-(-n_q // 8) * 8, block_q, floor=min(block_q, 256))
    if bq is None:
        bq = min(block_q, -(-n_q // 8) * 8)
    q_pad = -(-n_q // bq) * bq
    if q_pad != n_q:
        q = jnp.pad(q, ((0, 0), (0, q_pad - n_q), (0, 0)))

    bk = _divisor_block(n_kv, block_k)
    if bk is None:
        bk = min(block_k, -(-n_kv // 8) * 8)
        kv_pad = -(-n_kv // bk) * bk
        k = jnp.pad(k, ((0, 0), (0, kv_pad - n_kv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, kv_pad - n_kv), (0, 0)))
        n_kv = kv_pad

    grid = (bh, q_pad // bq, n_kv // bk)
    valid = jnp.reshape(valid_len, (1,)).astype(jnp.int32)

    def kv_index(b, i, j, valid_ref):
        # fetch block 0 instead of blocks entirely past valid_len (skipped)
        return (b, jnp.where(j * bk < valid_ref[0], j, 0), 0)

    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, block_k=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, i, j, s: (b, i, 0)),
                pl.BlockSpec((1, bk, d), kv_index),
                pl.BlockSpec((1, bk, d), kv_index),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j, s: (b, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
        interpret=interpret,
    )(valid, q, k, v)
    return out[:, :n_q]


def _xla_decode_reference(q, k, v, valid_len, scale):
    """Masked dense attention on [BH, Nq, D] x [BH, Nkv, D] (bwd + parity)."""
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    mask = jnp.arange(k.shape[1]) < valid_len
    logits = jnp.where(mask[None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", probs, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _decode_core(q, k, v, valid_len, scale, block_q, block_k, interpret):
    return _decode_forward(q, k, v, valid_len, scale, block_q, block_k,
                           interpret=interpret)


def _decode_core_fwd(q, k, v, valid_len, scale, block_q, block_k, interpret):
    out = _decode_forward(q, k, v, valid_len, scale, block_q, block_k,
                          interpret=interpret)
    return out, (q, k, v, valid_len)


def _decode_core_bwd(scale, block_q, block_k, interpret, res, g):
    # XLA recompute: materializes [Nq, Nkv] logits — fine at training chunk
    # sizes (Self-Forcing rollout exit steps); a Pallas bwd is a later opt.
    q, k, v, valid_len = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_decode_reference(q_, k_, v_, valid_len, scale),
        q, k, v)
    return vjp(g) + (None,)


_decode_core.defvjp(_decode_core_fwd, _decode_core_bwd)


def flash_decode_attention(q, k, v, valid_len, scale: Optional[float] = None,
                           block_q: int = 1600, block_k: int = 1024,
                           interpret: bool = False):
    """KV-cache attention over [B, Nq, H, D] queries and a fixed-capacity
    [B, Nkv, H, D] cache; only keys < ``valid_len`` (traced int32) attend.

    This is the AR-generation hot op (CausalWan chunk x full cache, ref
    ``network_causal.py:377-412``): never materializes the [Nq, Nkv] logits
    the masked-dense fallback needs (6.9 GB at 21f 480p), and skips key
    blocks past valid_len entirely."""
    b, n_q, h, d = q.shape
    n_kv = k.shape[1]
    scale = scale if scale is not None else 1.0 / np.sqrt(d)

    def to_bh(x, n):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    out = _decode_core(to_bh(q, n_q), to_bh(k, n_kv), to_bh(v, n_kv),
                       valid_len, float(scale), block_q, block_k, interpret)
    return out.reshape(b, h, n_q, d).transpose(0, 2, 1, 3)


def _xla_reference(q, k, v, scale, causal_block):
    """Math-equivalent XLA attention on [BH, N, D] (backward + parity tests)."""
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if causal_block is not None:
        n = q.shape[1]
        idx = jnp.arange(n) // causal_block
        allowed = idx[None, :] <= idx[:, None]
        logits = jnp.where(allowed[None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", probs, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_core(q, k, v, scale, causal_block, block_q, block_k, interpret):
    return _flash_forward(q, k, v, scale, causal_block, block_q, block_k,
                          interpret=interpret)


def _flash_core_fwd(q, k, v, scale, causal_block, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, scale, causal_block, block_q, block_k,
                         interpret=interpret)
    return out, (q, k, v)


def _flash_core_bwd(scale, causal_block, block_q, block_k, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, scale, causal_block),
                     q, k, v)
    return vjp(g)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(q, k, v, mask=None, scale: Optional[float] = None,
                    causal_block: Optional[int] = None,
                    block_q: int = 1600, block_k: int = 1024,
                    interpret: bool = False):
    """Flash attention over [B, N, H, D]; returns [B, N, H, D].

    Dense ``mask`` is unsupported in the kernel (falls back to XLA in the
    dispatcher); block-causal masks use ``causal_block``.
    """
    assert mask is None, "flash kernel supports causal_block masks only"
    b, n, h, d = q.shape
    scale = scale if scale is not None else 1.0 / np.sqrt(d)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    out = _flash_core(to_bh(q), to_bh(k), to_bh(v), float(scale), causal_block,
                      block_q, block_k, interpret)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
