"""Decompose the wan_train step: per-op efficiency at the 32k-token shape.

The wan_train bench (``FASTGEN_BENCH=wan_train python bench.py``) measures
35.7% useful-FLOPs MFU at 21f@480p (32,760 block-causal tokens) on a v5e.
Executed-FLOP accounting (save_attn + scan_group=2: flash fwd 1x, FFN fwd 3x,
projections/cross fwd 2x, everything bwd 2x-of-fwd) puts the ceiling at
3.0/4.56 = 66% — so roughly half the gap to the ceiling is *kernel
efficiency*, not remat overhead. This script measures each constituent at the
exact training shape so the tuning effort goes where the time is.

Run on the TPU:  python scripts/bench_wan_parts.py [--parts attn,ffn,...]

Ref workload: /root/reference/fastgen/networks/Wan/network_causal.py:131-196.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TOY = "--toy" in sys.argv
if TOY:
    # CPU smoke test of the harness. The axon sitecustomize force-registers
    # the TPU backend regardless of JAX_PLATFORMS, so the config must be set
    # post-import (same pattern as tests/conftest.py) — a stray TPU client
    # from a "CPU" smoke run contends with live training on the tunnel.
    jax.config.update("jax_platforms", "cpu")

# wan_train shape: CausalWan-1.3B, 21f @ 480p latents, chunk_size 3 frames
B, N, H, D = 1, 32760, 12, 128
MODEL_D, FFN_D = 1536, 8960
CHUNK = 3 * 30 * 52  # 4680 tokens per diffusion-forcing chunk
L_TXT = 512


def _peak():
    kind = jax.devices()[0].device_kind
    for prefix, peak in (("TPU v6 lite", 918e12), ("TPU v5 lite", 197e12),
                         ("TPU v5p", 459e12), ("TPU v5", 459e12),
                         ("TPU v4", 275e12)):
        if kind.startswith(prefix):
            return peak, kind
    return None, kind


def timeit(fn, *args, reps=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def report(name, secs, useful_flops):
    peak, _ = _peak()
    tf = useful_flops / secs / 1e12
    pct = f" = {useful_flops / secs / peak * 100:5.1f}% peak" if peak else ""
    print(f"{name:42s} {secs * 1e3:8.2f} ms  {tf:7.1f} TF/s{pct}")


def attn_flops(causal_block):
    if causal_block:
        n_chunks = N // causal_block
        pairs = sum(causal_block * i * causal_block
                    for i in range(1, n_chunks + 1))
    else:
        pairs = N * N
    return 4 * pairs * D * H * B  # qk^T + p@v


def part_attn():
    from fastgen_tpu.ops.kernels.flash_attention import flash_attention

    if TOY:  # pallas needs interpret mode on the CPU backend
        flash_attention = functools.partial(flash_attention, interpret=True)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, N, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, N, H, D), jnp.bfloat16)

    for cb, tag in ((CHUNK, "block-causal"), (None, "full")):
        f = attn_flops(cb)
        fwd = jax.jit(functools.partial(flash_attention, causal_block=cb))
        report(f"flash fwd {tag}", timeit(fwd, q, k, v), f)

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, causal_block=cb)
                           .astype(jnp.float32))

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        t_full = timeit(g, q, k, v)
        # grad includes one fwd (no residuals saved across jit boundary)
        report(f"flash fwd+bwd {tag}", t_full, 3 * f)

    # cross-attention (32k q x 512 kv)
    kc = jax.random.normal(key, (B, L_TXT, H, D), jnp.bfloat16)
    vc = jax.random.normal(key, (B, L_TXT, H, D), jnp.bfloat16)
    f = 4 * N * L_TXT * D * H * B
    fwd = jax.jit(functools.partial(flash_attention, causal_block=None))
    report("flash fwd cross 32k x 512", timeit(fwd, q, kc, vc), f)


def part_ffn():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, MODEL_D), jnp.bfloat16)
    w1 = jax.random.normal(key, (MODEL_D, FFN_D), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((FFN_D,), jnp.bfloat16)
    w2 = jax.random.normal(key, (FFN_D, MODEL_D), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((MODEL_D,), jnp.bfloat16)
    f = 2 * N * MODEL_D * FFN_D * 2

    @jax.jit
    def ffn(x, w1, b1, w2, b2):
        return jax.nn.gelu(x @ w1 + b1, approximate=True) @ w2 + b2

    report("FFN fwd (gelu mlp)", timeit(ffn, x, w1, b1, w2, b2), f)

    @jax.jit
    def ffn_g(x, w1, b1, w2, b2):
        def loss(args):
            return jnp.sum(ffn.__wrapped__(*args).astype(jnp.float32))
        return jax.grad(loss)((x, w1, b1, w2, b2))

    report("FFN fwd+bwd", timeit(ffn_g, x, w1, b1, w2, b2), 3 * f)


def part_proj():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, MODEL_D), jnp.bfloat16)
    w = jax.random.normal(key, (MODEL_D, MODEL_D), jnp.bfloat16) * 0.02
    f = 2 * N * MODEL_D * MODEL_D

    @jax.jit
    def proj(x, w):
        return x @ w

    report("projection [32760,1536]x[1536,1536]", timeit(proj, x, w), f)


def part_block():
    """One full WanBlock fwd and fwd+bwd (no remat) — the scan body."""
    from fastgen_tpu.networks.wan.network import WanBlock, _rope_freqs

    blk = WanBlock(MODEL_D, H, FFN_D)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, MODEL_D), jnp.bfloat16)
    tp = jax.random.normal(key, (B, 21, 6, MODEL_D), jnp.float32)
    ctx = jax.random.normal(key, (B, L_TXT, MODEL_D), jnp.bfloat16)
    tables, splits = _rope_freqs(D, 1024)
    # replicate WanVideoDiT rope assembly at 21x30x52
    from fastgen_tpu.networks.wan.network import _build_rope

    hh, ww = (4, 6) if TOY else (30, 52)
    cos, sin = _build_rope(tables, splits, 21, hh, ww)
    params = blk.init(key, x, tp, ctx, (cos, sin), N // 21,
                      causal_block=CHUNK)

    per_layer = (
        4 * 2 * N * MODEL_D * MODEL_D + 2 * 2 * N * MODEL_D * MODEL_D
        + 2 * 2 * L_TXT * MODEL_D * MODEL_D + 2 * 2 * N * MODEL_D * FFN_D
        + attn_flops(CHUNK) + 4 * N * L_TXT * D * H)

    @jax.jit
    def fwd(p, x):
        return blk.apply(p, x, tp, ctx, (cos, sin), N // 21,
                         causal_block=CHUNK)[0]

    report("WanBlock fwd", timeit(fwd, params, x), per_layer)

    @jax.jit
    def fwdbwd(p, x):
        def loss(x):
            return jnp.sum(blk.apply(p, x, tp, ctx, (cos, sin), N // 21,
                                     causal_block=CHUNK)[0]
                           .astype(jnp.float32))
        return jax.grad(loss)(x)

    report("WanBlock fwd+bwd (x-grad only)", timeit(fwdbwd, params, x),
           3 * per_layer)


PARTS = {"attn": part_attn, "ffn": part_ffn, "proj": part_proj,
         "block": part_block}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="attn,ffn,proj,block")
    ap.add_argument("--toy", action="store_true",
                    help="tiny shapes (CPU smoke test of the harness)")
    args = ap.parse_args()
    if args.toy:
        N, CHUNK, L_TXT = 21 * 4 * 6, 4 * 6, 16
        MODEL_D, FFN_D, H, D = 128, 256, 4, 32
    peak, kind = _peak()
    print(f"device: {kind}, bf16 peak {peak and peak / 1e12} TF/s")
    for p in args.parts.split(","):
        PARTS[p]()
