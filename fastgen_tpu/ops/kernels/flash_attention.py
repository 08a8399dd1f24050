"""Pallas TPU flash attention (forward) with optional block-causal masking.

The hot op of every DiT/video backbone (SURVEY §7: FlexAttention block-causal
masks + SDPA -> one Pallas kernel). Canonical TPU pattern: grid
(batch*heads, q_blocks, k_blocks) with the k axis innermost; VMEM scratch
carries the running max / denominator / accumulator across k blocks
(online softmax), so HBM traffic is O(N*D) per query block instead of O(N^2).

Backward is the standard two-kernel flash decomposition (the capability the
reference trains through via fused FlexAttention backward,
``network_causal.py:414-442``): the forward additionally emits the per-row
logsumexp; ``delta = rowsum(dO * O)`` is computed in XLA; then a dq kernel
(grid q-outer, k-inner) and a dk/dv kernel (grid k-outer, q-inner) each
recompute p = exp(s - lse) blockwise — nothing [N, N] ever touches HBM, so
training memory stays O(N*D) at diffusion-forcing video lengths. Block-causal
skipping applies to both (a k block skips q blocks before its causal reach).

Block-causal masking (`causal_block=c`): query token i may attend to key j iff
j // c <= i // c (diffusion forcing, ref ``network_causal.py:131-196``).
Fully-masked k-blocks are skipped analytically via the block index comparison.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scratch,
                      l_scratch, acc_scratch,
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

    # blocks aligned to the causal chunk: every VISITED block is fully
    # allowed (a q/k block lies entirely inside one chunk), so the
    # block-level visit predicate below subsumes the elementwise mask —
    # skip the two [block_q, block_k] iotas + compare + select per block
    # (pure VPU overhead between the MXU dots)
    aligned = (causal_block is not None
               and causal_block % block_q == 0
               and causal_block % block_k == 0)

    def _compute():
        # dots run in the input dtype (bf16 on the fast MXU path) with f32
        # accumulation via preferred_element_type
        q = q_ref[0]                                # [block_q, d]
        k = k_ref[0]                                # [block_k, d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:  # scale==1.0: caller folded it into k
            s = s * scale

        if causal_block is not None and not aligned:
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            allowed = (k_pos // causal_block) <= (q_pos // causal_block)
            s = jnp.where(allowed, s, NEG_INF)
        if valid_len != seq_len:
            # sequence padded up to the block size: mask padded keys
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
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
        l_safe = jnp.maximum(l_scratch[:], 1e-30)
        o_ref[0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)
        # per-row logsumexp of the (scaled, masked) logits — the backward's
        # residual: p = exp(s - lse) reconstructs softmax rows blockwise.
        # Broadcast over 8 lanes: Mosaic needs the last block dim == array
        # dim or a multiple of 128 (cf. the in-tree kernel's MIN_BLOCK_SIZE
        # trailing axis; 8 keeps the HBM footprint 16x smaller)
        lse_ref[0] = jnp.broadcast_to(m_scratch[:] + jnp.log(l_safe),
                                      lse_ref.shape[1:])


def _flash_forward(q, k, v, scale, causal_block, block_q, block_k,
                   interpret: bool = False):
    """q,k,v: [BH, N, D] -> (out [BH, N, D], lse [BH, N] f32). Ragged N is
    zero-padded up to the block size; padded keys are masked analytically,
    padded query rows are sliced off."""
    bh, n_q, d = q.shape
    n_kv = k.shape[1]
    # fold the softmax scale into k (one [N, d] mul, fused into the pad)
    # instead of a [bq, bk] VPU pass per visited block — same trick as the
    # backward; lse stays the logsumexp of the *scaled* logits, consistent
    # with what the backward recomputes from its own folded k
    fold = scale != 1.0 and jnp.dtype(k.dtype).itemsize < 4
    if fold:
        k = (k.astype(jnp.float32) * scale).astype(k.dtype)
        scale = 1.0
    # prefer blocks that divide n exactly: padded rows/keys are wasted MXU
    # work and large blocks amortize the online-softmax VPU overhead
    # (32760 tokens: blocks (1560, 936) run ~2x faster than (256, 512));
    # f32 inputs double VMEM pressure -> halve the caps to stay under ~16MB
    if jnp.dtype(q.dtype).itemsize >= 4:
        block_q, block_k = block_q // 2, block_k // 2
    nq8 = -(-n_q // 8) * 8
    nkv8 = -(-n_kv // 8) * 8
    bq = _divisor_block(nq8, block_q, floor=min(block_q, 128))
    if bq is None:
        bq = min(block_q, max(8, nq8))
    bk = _divisor_block(nkv8, block_k, floor=min(block_k, 128))
    if bk is None:
        bk = min(block_k, max(8, nkv8))
    block_q, block_k = bq, bk
    q_pad = -(-n_q // block_q) * block_q
    kv_pad = -(-n_kv // block_k) * block_k
    if q_pad != n_q:
        q = jnp.pad(q, ((0, 0), (0, q_pad - n_q), (0, 0)))
    if kv_pad != n_kv:
        kp = ((0, 0), (0, kv_pad - n_kv), (0, 0))
        k, v = jnp.pad(k, kp), jnp.pad(v, kp)
    grid = (bh, q_pad // block_q, kv_pad // block_k)

    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, block_q=block_q, block_k=block_k,
        causal_block=causal_block, seq_len=kv_pad, valid_len=n_kv)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 8), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, q_pad, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :n_q], lse[:, :n_q, 0]


def _decode_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_scratch,
                   l_scratch, acc_scratch, *, scale: float, block_k: int):
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
        l_safe = jnp.maximum(l_scratch[:], 1e-30)
        o_ref[0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(m_scratch[:] + jnp.log(l_safe),
                                      lse_ref.shape[1:])


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

    out, lse = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, block_k=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, i, j, s: (b, i, 0)),
                pl.BlockSpec((1, bk, d), kv_index),
                pl.BlockSpec((1, bk, d), kv_index),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, d), lambda b, i, j, s: (b, i, 0)),
                pl.BlockSpec((1, bq, 8), lambda b, i, j, s: (b, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, q_pad, 8), jnp.float32),
        ],
        interpret=interpret,
    )(valid, q, k, v)
    return out[:, :n_q], lse[:, :n_q, 0]


# ---------------------------------------------------------------------------
# Flash backward: two Pallas kernels, nothing [N, N] in HBM.
#
#   delta = rowsum(dO * O)                      (XLA, [BH, N])
#   p  = exp(s - lse)  per block                (recomputed from residual lse)
#   ds = p * (dO V^T - delta) * scale
#   dq kernel  (grid q-outer, k-inner):  dq += ds K
#   dkv kernel (grid k-outer, q-inner):  dv += p^T dO ; dk += ds^T Q
#
# Both support block-causal masks with the same analytic block skipping as
# the forward, a static valid_len (ragged self-attention padding), and a
# traced valid_len via scalar prefetch (KV-cache decode path).
# ---------------------------------------------------------------------------


def _bwd_masked_logits(q, k, qi, ki, block_q, block_k, scale, causal_block,
                       static_valid, valid):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale != 1.0:  # scale==1.0: caller folded it into k (pre-scaled)
        s = s * scale
    # chunk-aligned blocks: the caller's block-level visit predicate already
    # equals the (uniform) elementwise mask — skip the iota/compare/select
    aligned = (causal_block is not None
               and causal_block % block_q == 0
               and causal_block % block_k == 0)
    k_pos = None
    if causal_block is not None and not aligned:
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        allowed = (k_pos // causal_block) <= (q_pos // causal_block)
        s = jnp.where(allowed, s, NEG_INF)
    if static_valid is not None or valid is not None:
        if k_pos is None:
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
        if static_valid is not None:
            s = jnp.where(k_pos < static_valid, s, NEG_INF)
        if valid is not None:
            s = jnp.where(k_pos < valid, s, NEG_INF)
    return s


def _flash_bwd_dq_kernel(*args, scale, block_q, block_k, causal_block,
                         static_valid, dynamic_valid):
    if dynamic_valid:
        (valid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dq_scratch) = args
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dq_scratch) = args
        valid_ref = None
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    def _compute():
        q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        s = _bwd_masked_logits(q, k, qi, ki, block_q, block_k, scale,
                               causal_block, static_valid,
                               valid_ref[0] if dynamic_valid else None)
        p = jnp.exp(s - lse_ref[0][:, :1])
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0][:, :1])
        if scale != 1.0:
            ds = ds * scale
        dq_scratch[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    need = None
    if causal_block is not None:
        need = (ki * block_k // causal_block) <= \
            ((qi * block_q + block_q - 1) // causal_block)
    if dynamic_valid:
        dyn = ki * block_k < valid_ref[0]
        need = dyn if need is None else jnp.logical_and(need, dyn)
    if need is None:
        _compute()
    else:
        pl.when(need)(_compute)

    @pl.when(ki == num_k - 1)
    def _finalize():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(*args, scale, block_q, block_k, causal_block,
                          static_valid, dynamic_valid):
    if dynamic_valid:
        (valid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_scratch, dv_scratch) = args
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_scratch, dv_scratch) = args
        valid_ref = None
    ki = pl.program_id(1)
    qj = pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(qj == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    def _compute():
        q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        s = _bwd_masked_logits(q, k, qj, ki, block_q, block_k, scale,
                               causal_block, static_valid,
                               valid_ref[0] if dynamic_valid else None)
        p = jnp.exp(s - lse_ref[0][:, :1])
        dv_scratch[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0][:, :1])
        if scale != 1.0:
            ds = ds * scale
        dk_scratch[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    need = None
    if causal_block is not None:
        # a k block only receives gradient from q blocks at/after its causal
        # reach: skip q blocks entirely before it
        need = (ki * block_k // causal_block) <= \
            ((qj * block_q + block_q - 1) // causal_block)
    if dynamic_valid:
        dyn = ki * block_k < valid_ref[0]
        need = dyn if need is None else jnp.logical_and(need, dyn)
    if need is None:
        _compute()
    else:
        pl.when(need)(_compute)

    @pl.when(qj == num_q - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _bwd_blocks(n_q: int, n_kv: int, itemsize: int, block_q: int,
                block_k: int):
    """Backward block sizing. Mosaic reuses the [bq,bk] f32 intermediates
    (s -> p, dp -> ds overwrite in place), so ~2 live at once plus the
    [b,d] f32 scratch accumulators; large blocks amortize the per-iteration
    softmax-recompute VPU work, so cap at the forward's (1600, 1024) with a
    bq*bk <= 1.0M product guard (measured at 32,760 tokens: (936, 936) runs
    the wan_train backward 19% faster than the old 512-cap's (504, 504) and
    within 0.3% of (1560, 936), which standalone-compiles but exceeds the
    16 MB scoped VMEM by 192 KB inside the full train step). f32 inputs
    double the operand-block VMEM -> keep the old conservative 256 cap."""
    if itemsize >= 4:
        cap_q = cap_k = 256
    else:
        cap_k = min(block_k, 1024)
        cap_q = min(block_q, 1600)
    # on-device sweep knobs (scripts/sweep_wan_train.sh; no-op when unset)
    env_q = os.environ.get("FASTGEN_FLASH_BWD_CAP_Q")
    env_k = os.environ.get("FASTGEN_FLASH_BWD_CAP_K")
    if env_q:
        cap_q = int(env_q)
    if env_k:
        cap_k = int(env_k)
    q8, k8 = -(-n_q // 8) * 8, -(-n_kv // 8) * 8
    bk = _divisor_block(k8, cap_k, floor=min(cap_k, 128))
    if bk is None:
        bk = min(cap_k, k8)
    if itemsize < 4:
        cap_q = min(cap_q, max(128, int(1.0e6) // bk // 8 * 8))
    bq = _divisor_block(q8, cap_q, floor=min(cap_q, 128))
    if bq is None:
        bq = min(cap_q, q8)
    return bq, -(-n_q // bq) * bq, bk, -(-n_kv // bk) * bk


def _flash_backward(q, k, v, o, lse, g, scale, causal_block, block_q, block_k,
                    valid_len=None, interpret=False):
    """dq/dk/dv on [BH, Nq, D] x [BH, Nkv, D]. ``valid_len``: traced int32
    scalar (decode path) or None; ragged self-attention padding becomes a
    static valid mask."""
    bh, n_q, d = q.shape
    n_kv = k.shape[1]
    bq, q_pad, bk, kv_pad = _bwd_blocks(
        n_q, n_kv, jnp.dtype(q.dtype).itemsize, block_q, block_k)

    # Fold the softmax scale into k once at the XLA level (one [N, d] mul,
    # fused into the pad) instead of two [bq, bk] VPU passes per block-pair
    # per kernel (s*scale and ds*scale): s = q·(k·scale)^T is exact in the
    # same bf16 ulp class, dq = ds·k_in needs no scale at all, and dk is
    # rescaled once on the way out in f32. The bwd kernels see scale == 1.0.
    fold = scale != 1.0 and jnp.dtype(k.dtype).itemsize < 4
    if fold:
        k = (k.astype(jnp.float32) * scale).astype(k.dtype)

    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    if q_pad != n_q:
        qp = ((0, 0), (0, q_pad - n_q), (0, 0))
        q, g = jnp.pad(q, qp), jnp.pad(g, qp)
        # padded query rows: lse=+inf-ish -> p = 0, and dO = 0 -> ds = 0
        lse = jnp.pad(lse, ((0, 0), (0, q_pad - n_q)),
                      constant_values=-NEG_INF)
        delta = jnp.pad(delta, ((0, 0), (0, q_pad - n_q)))
    # lane-broadcast to [BH, Nq, 8] (Mosaic block-shape constraint)
    lse = jnp.broadcast_to(lse[..., None], (*lse.shape, 8))
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 8))
    if kv_pad != n_kv:
        kp = ((0, 0), (0, kv_pad - n_kv), (0, 0))
        k, v = jnp.pad(k, kp), jnp.pad(v, kp)
    static_valid = n_kv if (kv_pad != n_kv and valid_len is None) else None

    kern = dict(scale=1.0 if fold else scale, block_q=bq, block_k=bk,
                causal_block=causal_block,
                static_valid=static_valid, dynamic_valid=valid_len is not None)
    dq_scratch = [pltpu.VMEM((bq, d), jnp.float32)]
    dkv_scratch = [pltpu.VMEM((bk, d), jnp.float32),
                   pltpu.VMEM((bk, d), jnp.float32)]
    grid_dq = (bh, q_pad // bq, kv_pad // bk)
    grid_dkv = (bh, kv_pad // bk, q_pad // bq)

    if valid_len is None:
        in_specs_dq = [
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),   # q
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),   # k
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),   # v
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),   # do
            pl.BlockSpec((1, bq, 8), lambda b, i, j: (b, i, 0)),   # lse
            pl.BlockSpec((1, bq, 8), lambda b, i, j: (b, i, 0)),   # delta
        ]
        dq = pl.pallas_call(
            functools.partial(_flash_bwd_dq_kernel, **kern),
            grid=grid_dq,
            in_specs=in_specs_dq,
            out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
            scratch_shapes=dq_scratch,
            interpret=interpret,
        )(q, k, v, g, lse, delta)
        in_specs_dkv = [
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, j, 0)),   # q
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, i, 0)),   # k
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, i, 0)),   # v
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, j, 0)),   # do
            pl.BlockSpec((1, bq, 8), lambda b, i, j: (b, j, 0)),   # lse
            pl.BlockSpec((1, bq, 8), lambda b, i, j: (b, j, 0)),   # delta
        ]
        dk, dv = pl.pallas_call(
            functools.partial(_flash_bwd_dkv_kernel, **kern),
            grid=grid_dkv,
            in_specs=in_specs_dkv,
            out_specs=[
                pl.BlockSpec((1, bk, d), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, bk, d), lambda b, i, j: (b, i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, kv_pad, d), k.dtype),
                jax.ShapeDtypeStruct((bh, kv_pad, d), v.dtype),
            ],
            scratch_shapes=dkv_scratch,
            interpret=interpret,
        )(q, k, v, g, lse, delta)
    else:
        valid = jnp.reshape(valid_len, (1,)).astype(jnp.int32)

        def kv_dq(b, i, j, s):
            # skipped k blocks fetch block 0 instead of dead cache rows
            return (b, jnp.where(j * bk < s[0], j, 0), 0)

        dq = pl.pallas_call(
            functools.partial(_flash_bwd_dq_kernel, **kern),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid_dq,
                in_specs=[
                    pl.BlockSpec((1, bq, d), lambda b, i, j, s: (b, i, 0)),
                    pl.BlockSpec((1, bk, d), kv_dq),
                    pl.BlockSpec((1, bk, d), kv_dq),
                    pl.BlockSpec((1, bq, d), lambda b, i, j, s: (b, i, 0)),
                    pl.BlockSpec((1, bq, 8), lambda b, i, j, s: (b, i, 0)),
                    pl.BlockSpec((1, bq, 8), lambda b, i, j, s: (b, i, 0)),
                ],
                out_specs=pl.BlockSpec((1, bq, d),
                                       lambda b, i, j, s: (b, i, 0)),
                scratch_shapes=dq_scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
            interpret=interpret,
        )(valid, q, k, v, g, lse, delta)
        dk, dv = pl.pallas_call(
            functools.partial(_flash_bwd_dkv_kernel, **kern),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid_dkv,
                in_specs=[
                    pl.BlockSpec((1, bq, d), lambda b, i, j, s: (b, j, 0)),
                    pl.BlockSpec((1, bk, d), lambda b, i, j, s: (b, i, 0)),
                    pl.BlockSpec((1, bk, d), lambda b, i, j, s: (b, i, 0)),
                    pl.BlockSpec((1, bq, d), lambda b, i, j, s: (b, j, 0)),
                    pl.BlockSpec((1, bq, 8), lambda b, i, j, s: (b, j, 0)),
                    pl.BlockSpec((1, bq, 8), lambda b, i, j, s: (b, j, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, bk, d), lambda b, i, j, s: (b, i, 0)),
                    pl.BlockSpec((1, bk, d), lambda b, i, j, s: (b, i, 0)),
                ],
                scratch_shapes=dkv_scratch,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bh, kv_pad, d), k.dtype),
                jax.ShapeDtypeStruct((bh, kv_pad, d), v.dtype),
            ],
            interpret=interpret,
        )(valid, q, k, v, g, lse, delta)
    if fold:
        # dk above is d(loss)/d(k·scale); rescale once in f32 on the way out
        dk = (dk.astype(jnp.float32) * scale).astype(k.dtype)
    return dq[:, :n_q], dk[:, :n_kv], dv[:, :n_kv]


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
                           interpret=interpret)[0]


def _decode_core_fwd(q, k, v, valid_len, scale, block_q, block_k, interpret):
    out, lse = _decode_forward(q, k, v, valid_len, scale, block_q, block_k,
                               interpret=interpret)
    return out, (q, k, v, out, lse, valid_len)


def _decode_core_bwd(scale, block_q, block_k, interpret, res, g):
    # Pallas flash backward with the traced valid_len as scalar prefetch —
    # the Self-Forcing rollout trains through this without ever forming the
    # [Nq, Nkv] logits (the old XLA recompute did)
    q, k, v, o, lse, valid_len = res
    dq, dk, dv = _flash_backward(q, k, v, o, lse, g, scale, None,
                                 block_q, block_k, valid_len=valid_len,
                                 interpret=interpret)
    return dq, dk, dv, None


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

    # Fold the softmax scale into the (small) QUERY tensor for sub-4-byte
    # inputs, then run fwd+bwd with scale=1.0: the backward's recomputed
    # logits then match the forward's lse bit-for-bit (advisor r4 #1 — the
    # old behavior folded into k only inside ``_flash_backward``, so the
    # backward reconstructed p from slightly different logits than produced
    # the lse). q-side folding keeps the elementwise pass off the
    # multi-GB KV cache; autodiff chains dq through the multiply.
    qf = to_bh(q, n_q)
    fold = scale != 1.0 and jnp.dtype(q.dtype).itemsize < 4
    if fold:
        qf = (qf.astype(jnp.float32) * scale).astype(q.dtype)
    out = _decode_core(qf, to_bh(k, n_kv), to_bh(v, n_kv),
                       valid_len, 1.0 if fold else float(scale),
                       block_q, block_k, interpret)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_attach(q, k, v, out, lse, scale, causal_block, block_q, block_k,
                  interpret):
    """Identity on ``out`` that carries the flash backward.

    The forward kernel runs OUTSIDE the custom_vjp (on stop_gradient'd
    inputs), and its (out, lse) enter here as primal arguments. This makes
    the backward's residuals exactly the values a ``jax.checkpoint`` policy
    can save by name (see ``save_attn_policy``): under block remat with
    ``save_only_these_names`` the recompute graph reads the saved (out, lse)
    and the forward pallas_call is dead code — the flash forward runs ONCE
    per step instead of once per remat recompute. With the fwd kernel inside
    the custom_vjp (the usual structure), linearization re-invokes the fwd
    rule during the recompute and no policy can prevent it (verified at
    jaxpr level in tests/test_flash_attention.py remat-count test)."""
    return out


def _flash_attach_fwd(q, k, v, out, lse, scale, causal_block, block_q,
                      block_k, interpret):
    return out, (q, k, v, out, lse)


def _flash_attach_bwd(scale, causal_block, block_q, block_k, interpret,
                      res, g):
    q, k, v, o, lse = res
    dq, dk, dv = _flash_backward(q, k, v, o, lse, g, scale, causal_block,
                                 block_q, block_k, interpret=interpret)
    # out/lse cotangents flow into stop_gradient'd values and are DCE'd
    return dq, dk, dv, jnp.zeros_like(o), jnp.zeros_like(lse)


_flash_attach.defvjp(_flash_attach_fwd, _flash_attach_bwd)


def _flash_core(q, k, v, scale, causal_block, block_q, block_k, interpret,
                remat_name: Optional[str] = None):
    sg = jax.lax.stop_gradient
    out, lse = _flash_forward(sg(q), sg(k), sg(v), scale, causal_block,
                              block_q, block_k, interpret=interpret)
    if remat_name:
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(out, remat_name + "_out")
        lse = checkpoint_name(lse, remat_name + "_lse")
    return _flash_attach(q, k, v, out, lse, scale, causal_block, block_q,
                         block_k, interpret)


def save_attn_policy(*names: str):
    """``jax.checkpoint`` policy saving the named flash attention outputs.

    Pass the same ``remat_name`` strings given to ``flash_attention``; the
    policy saves each call's (out, lse) across a remat boundary so the
    backward recompute skips the flash forward entirely (it re-runs only the
    cheap q/k/v projections feeding the backward kernels)."""
    tags = [n + suffix for n in names for suffix in ("_out", "_lse")]
    return jax.checkpoint_policies.save_only_these_names(*tags)


def flash_attention(q, k, v, mask=None, scale: Optional[float] = None,
                    causal_block: Optional[int] = None,
                    block_q: int = 1600, block_k: int = 1024,
                    interpret: bool = False,
                    remat_name: Optional[str] = None):
    """Flash attention over [B, Nq, H, D] x [B, Nkv, H, D]; returns
    [B, Nq, H, D]. Cross-attention (Nq != Nkv) is supported with
    ``causal_block=None``.

    Dense ``mask`` is unsupported in the kernel (falls back to XLA in the
    dispatcher); block-causal masks use ``causal_block``.
    """
    assert mask is None, "flash kernel supports causal_block masks only"
    b, n_q, h, d = q.shape
    n_kv = k.shape[1]
    assert causal_block is None or n_q == n_kv, \
        "causal_block requires self-attention shapes"
    scale = scale if scale is not None else 1.0 / np.sqrt(d)

    def to_bh(x, n):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    out = _flash_core(to_bh(q, n_q), to_bh(k, n_kv), to_bh(v, n_kv),
                      float(scale), causal_block, block_q, block_k, interpret,
                      remat_name=remat_name)
    return out.reshape(b, h, n_q, d).transpose(0, 2, 1, 3)
