"""Benchmark: 4-step EDM-CIFAR10 student sampling throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline is
measured against a fixed reference point recorded on first run
(``bench_baseline.json``); 1.0 until a baseline exists.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# bf16 peak FLOP/s per chip by device kind (most-specific prefix wins)
_PEAK_BF16 = (
    ("TPU v6 lite", 918e12),   # v6e Trillium
    ("TPU v5 lite", 197e12),   # v5e
    ("TPU v5p", 459e12),
    ("TPU v5", 459e12),
    ("TPU v4", 275e12),
)


def _peak_flops():
    import jax

    kind = jax.devices()[0].device_kind
    for prefix, peak in _PEAK_BF16:
        if kind.startswith(prefix):
            return peak, kind
    return None, kind


def _analytic_flops(jitted, *args):
    """XLA's static FLOP count for one call of the jitted fn (analytic — the
    compiled HLO's dot/conv op counts, not a runtime measurement)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _mfu(flops_per_call, calls, elapsed):
    """Model FLOPs utilization vs the chip's bf16 peak; None if unknown."""
    peak, kind = _peak_flops()
    if flops_per_call is None or peak is None or elapsed <= 0:
        return None, kind
    return flops_per_call * calls / elapsed / peak, kind


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("FASTGEN_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    if os.environ.get("FASTGEN_BENCH") == "wan":
        return bench_wan()
    if os.environ.get("FASTGEN_BENCH") == "wan_ar":
        return bench_wan_ar()
    if os.environ.get("FASTGEN_BENCH") == "wan_train":
        return bench_wan_train()

    from fastgen_tpu.configs.net import EDM_CIFAR10_Config
    from fastgen_tpu.configs.methods.config_dmd2 import create_config
    from fastgen_tpu.utils import instantiate

    batch = int(os.environ.get("FASTGEN_BENCH_BATCH", "256"))
    steps = int(os.environ.get("FASTGEN_BENCH_STEPS", "4"))
    dtype = jnp.bfloat16

    config = create_config()
    config.model.input_shape = [32, 32, 3]
    net = instantiate(EDM_CIFAR10_Config)

    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((batch, 32, 32, 3), dtype)
    t0 = jnp.full((batch,), 80.0, jnp.float32)
    cond = jax.nn.one_hot(jnp.arange(batch) % 10, 10, dtype=dtype)
    params = net.init({"params": key}, x0[:1], t0[:1], condition=cond[:1])
    params = jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params)

    ns = net.noise_scheduler
    t_list = ns.get_t_list(steps)

    def sample4(params, noise, key):
        """4-step SDE student sampler (generator_fn contract, model.py:315-372)."""
        x = ns.latents(noise, t_init=jnp.asarray(float(t_list[0]), jnp.float32))
        x_pred = x
        for i, (t_cur, t_next) in enumerate(zip(t_list[:-1], t_list[1:])):
            tb = jnp.full((noise.shape[0],), t_cur, jnp.float32)
            x_pred = net.apply(params, x, tb, condition=cond, fwd_pred_type="x0")
            if float(t_next) > 0:
                key, sub = jax.random.split(key)
                eps = jax.random.normal(sub, x_pred.shape, x_pred.dtype)
                x = ns.forward_process(
                    x_pred, eps, jnp.full((noise.shape[0],), t_next, jnp.float32))
        return x_pred

    fn = jax.jit(sample4)
    noise = jax.random.normal(key, (batch, 32, 32, 3), dtype)

    def sync(o):
        # some remote backends no-op block_until_ready; force a host fetch
        return float(jnp.sum(o[0, 0, 0]))

    # warmup / compile
    out = fn(params, noise, key)
    sync(out)
    flops_per_call = _analytic_flops(fn, params, noise, key)

    reps = int(os.environ.get("FASTGEN_BENCH_REPS", "10"))
    # FASTGEN_BENCH_PROFILE=<dir>: capture a jax.profiler trace of the timed
    # loop (device xplane) for scripts/profile_flagship.py's op attribution
    prof_dir = os.environ.get("FASTGEN_BENCH_PROFILE")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)
    t_start = time.perf_counter()
    prev = noise
    for i in range(reps):
        # chain the output into the next input so reps cannot overlap/elide
        prev = fn(params, prev, jax.random.fold_in(key, i))
    sync(prev)
    elapsed = time.perf_counter() - t_start
    if prof_dir:
        jax.profiler.stop_trace()
    samples_per_sec = batch * reps / elapsed
    mfu, device_kind = _mfu(flops_per_call, reps, elapsed)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    vs_baseline = 1.0
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                base = json.load(f)["value"]
            vs_baseline = samples_per_sec / base
        except Exception:
            pass
    else:
        try:
            with open(baseline_path, "w") as f:
                json.dump({"value": samples_per_sec,
                           "device_kind": device_kind,
                           "date": time.strftime("%Y-%m-%d"),
                           "note": "first recorded run on this hardware "
                                   "(4-step EDM-CIFAR10 student sampling, "
                                   "bf16, batch 256)"}, f)
        except OSError:
            pass

    record = {
        "metric": f"{steps}-step EDM-CIFAR10 samples/sec/chip (bf16, batch {batch})",
        "value": round(samples_per_sec, 2),
        "unit": "samples/sec",
        "vs_baseline": round(vs_baseline, 3),
    }
    if mfu is not None:
        record["mfu"] = round(mfu, 4)
        record["analytic_flops_per_batch"] = flops_per_call
        record["device_kind"] = device_kind
    print(json.dumps(record))


def bench_wan():
    """Secondary metric: CausalWan-1.3B denoise steps/sec (one 480p-latent
    denoise forward of the full 21-frame clip, bf16, batch 1)."""
    import time

    import jax
    import jax.numpy as jnp

    from fastgen_tpu.configs.net import CausalWan_1_3B_Config
    from fastgen_tpu.utils import instantiate

    net = instantiate(CausalWan_1_3B_Config)
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    b = int(os.environ.get("FASTGEN_BENCH_BATCH", "1"))
    x = jax.random.normal(key, (b, 21, 60, 104, 16), dtype)
    t = jnp.full((b,), 0.9, jnp.float32)
    cond = {"text_embeds": jax.random.normal(key, (b, 512, 4096), dtype)}
    params = net.init({"params": key}, x[:, :3], t, condition=cond)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params)

    fn = jax.jit(lambda p, x, t, c: net.apply(p, x, t, condition=c,
                                              fwd_pred_type="x0", causal=True))

    def sync(o):
        return float(jnp.sum(o[0, 0, 0, 0]))

    out = fn(params, x, t, cond)
    sync(out)
    flops_per_call = _analytic_flops(fn, params, x, t, cond)
    if flops_per_call is not None and \
            os.environ.get("FASTGEN_ATTN_IMPL", "auto") != "xla":
        # the Pallas flash kernel is an XLA custom call: its dots are not in
        # cost_analysis. Add the block-causal self-attention FLOPs
        # analytically: 4 * allowed_qk_pairs * dim per block.
        f, hgt, wid = 21, 60 // 2, 104 // 2
        chunk_tokens = net.chunk_size * hgt * wid
        n_chunks = f // net.chunk_size
        allowed_pairs = sum(chunk_tokens * i * chunk_tokens
                            for i in range(1, n_chunks + 1))
        flops_per_call += 4.0 * allowed_pairs * net.dim * net.num_layers * b
    reps = int(os.environ.get("FASTGEN_BENCH_REPS", "3"))
    t0 = time.perf_counter()
    prev = x
    for i in range(reps):
        prev = fn(params, prev, t, cond)
    sync(prev)
    elapsed = time.perf_counter() - t0
    dt = elapsed / reps
    mfu, device_kind = _mfu(flops_per_call, reps, elapsed)
    record = {
        "metric": "CausalWan-1.3B 21f@480p denoise steps/sec/chip (bf16, block-causal)",
        "value": round(b / dt, 3),
        "unit": "denoise steps/sec",
        "vs_baseline": 1.0,
    }
    if mfu is not None:
        record["mfu"] = round(mfu, 4)
        record["device_kind"] = device_kind
    print(json.dumps(record))


def bench_wan_train():
    """Training metric: diffusion-forcing CausalWan-1.3B training step/sec —
    value-and-grad of a DSM loss through the full 21-frame 480p-latent clip
    (32,760 tokens of block-causal self-attention, bf16 params, f32 loss).
    This is the workload the Pallas flash backward exists for: the XLA
    attention path materializes [32k, 32k] f32 logits under grad and OOMs
    (set FASTGEN_ATTN_IMPL=xla to reproduce)."""
    import time

    import jax
    import jax.numpy as jnp

    from fastgen_tpu.configs.net import CausalWan_1_3B_Config
    from fastgen_tpu.utils import instantiate

    cfg = CausalWan_1_3B_Config
    # scan-over-blocks + segment remat: the only configuration whose 32k-token
    # backward fits a 16G v5e — the python-loop remat's scheduler overlaps
    # ~12 blocks' recompute workspace and OOMs (see WanVideoDiT.scan_blocks)
    cfg.remat = True
    cfg.scan_blocks = True
    # "ffn": only the [N, ffn_dim] FFN segment gets the inner remat; the
    # attention recompute rides the outer per-block remat alone (flash fwd
    # 2x/step instead of 3x) at ~1 GB more backward workspace
    # best measured single-chip config (see ops/kernels/flash_attention.py
    # save_attn_policy and WanVideoDiT.scan_group): flash fwd runs once per
    # step, two blocks per remat segment — 35.7% MFU vs 30.1% for the plain
    # per-block "all" remat on a 16 GB v5e
    cfg.remat_inner_mode = os.environ.get("FASTGEN_BENCH_REMAT_MODE",
                                          "save_attn")
    cfg.scan_group = int(os.environ.get("FASTGEN_BENCH_SCAN_GROUP", "2"))
    # unrolled python loop over remat groups: identical boundaries to the
    # grouped scan, but named-offload ("offload_attn") compiles — the libtpu
    # async-offload bug only triggers inside scan bodies (WanVideoDiT.
    # group_unroll; grad parity in tests/test_wan_remat.py)
    cfg.group_unroll = os.environ.get("FASTGEN_BENCH_GROUP_UNROLL", "0") == "1"
    # bf16 residual stream by default: reference torch-autocast numerics
    # (parity-tested in tests/test_wan_remat.py) and the measured best config
    # — 0.124 steps/s / 37.5% MFU vs 0.109 / 32.8% with an f32 stream
    # (quality/wan_train_sweep.jsonl, v5e)
    cfg.residual_f32 = os.environ.get("FASTGEN_BENCH_RESIDUAL_F32",
                                      "0") == "1"
    net = instantiate(cfg)
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    b = int(os.environ.get("FASTGEN_BENCH_BATCH", "1"))
    x = jax.random.normal(key, (b, 21, 60, 104, 16), dtype)
    t = jnp.full((b,), 0.9, jnp.float32)
    cond = {"text_embeds": jax.random.normal(key, (b, 512, 4096), dtype)}
    params = net.init({"params": key}, x[:, :3], t, condition=cond)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params)

    def loss_fn(p, noisy, t, c, target):
        pred = net.apply(p, noisy, t, condition=c, fwd_pred_type="x0",
                         causal=True)
        return jnp.mean((pred.astype(jnp.float32) -
                         target.astype(jnp.float32)) ** 2)

    import optax

    def step_fn(p, noisy, t, c, target):
        loss, grads = jax.value_and_grad(loss_fn)(p, noisy, t, c, target)
        # reduce grads to a scalar on device: returning the full 2.6 GB grad
        # tree as a jit output double-buffers across chained reps and OOMs;
        # the global norm still forces the whole backward to run
        return loss, optax.global_norm(grads)

    step = jax.jit(step_fn)

    def sync(loss, gnorm):
        return float(loss) + float(gnorm)

    target = jax.random.normal(jax.random.fold_in(key, 1), x.shape, dtype)
    loss, gnorm = step(params, x, t, cond, target)
    sync(loss, gnorm)
    # model FLOPs, exact analytic count (cost_analysis is unreliable over
    # lax.scan bodies; the flash custom calls are invisible to it anyway).
    # MFU convention: useful FLOPs only — fwd + 2x for backward; the remat
    # recompute is NOT counted (it is overhead, not model compute).
    f, hgt, wid = 21, 60 // 2, 104 // 2
    n_tok = f * hgt * wid
    l_txt = 512
    d, ffd, nl = net.dim, net.ffn_dim, net.num_layers
    chunk_tokens = net.chunk_size * hgt * wid
    n_chunks = f // net.chunk_size
    allowed_pairs = sum(chunk_tokens * i * chunk_tokens
                        for i in range(1, n_chunks + 1))
    per_layer = (
        4 * 2 * n_tok * d * d          # self-attn q/k/v/out projections
        + 2 * 2 * n_tok * d * d        # cross-attn q/out
        + 2 * 2 * l_txt * d * d        # cross-attn k/v over text tokens
        + 2 * 2 * n_tok * d * ffd      # FFN fc1/fc2
        + 4 * allowed_pairs * d        # block-causal self-attn (qk^T + p@v)
        + 4 * n_tok * l_txt * d        # cross-attn scores + out
    )
    embed_head = 2 * 2 * n_tok * d * (
        net.in_channels * net.patch_size[0] * net.patch_size[1]
        * net.patch_size[2] + net.out_channels)
    fwd_flops = b * (nl * per_layer + embed_head)
    flops_per_call = 3.0 * fwd_flops
    reps = int(os.environ.get("FASTGEN_BENCH_REPS", "3"))
    t0 = time.perf_counter()
    noisy = x
    for i in range(reps):
        loss, gnorm = step(params, noisy, t, cond, target)
        # chain the scalar loss into the next input so reps serialize on device
        noisy = x + (0.0 * loss).astype(dtype)
    sync(loss, gnorm)
    elapsed = time.perf_counter() - t0
    dt = elapsed / reps
    mfu, device_kind = _mfu(flops_per_call, reps, elapsed)
    record = {
        "metric": ("CausalWan-1.3B 21f@480p diffusion-forcing training "
                   "step/sec/chip (32,760-token block-causal, bf16)"),
        "value": round(b / dt, 4),
        "unit": "train steps/sec",
        "vs_baseline": 1.0,
    }
    if mfu is not None:
        record["mfu"] = round(mfu, 4)
        record["device_kind"] = device_kind
    print(json.dumps(record))


def bench_wan_ar():
    """Production serving metric: KV-cached autoregressive 4-step generation
    of a full 21-frame 480p-latent clip with CausalWan-1.3B (CausVid/
    Self-Forcing inference path: 7 chunks x (4 denoise + 1 cache-store)
    forwards against the growing KV cache)."""
    import time

    import jax
    import jax.numpy as jnp

    from fastgen_tpu.configs.methods.config_causvid import create_config
    from fastgen_tpu.configs.net import CausalWan_1_3B_Config
    from fastgen_tpu.utils import instantiate

    config = create_config()
    config.model.net = CausalWan_1_3B_Config
    config.model.input_shape = [21, 60, 104, 16]
    config.model.student_sample_steps = int(os.environ.get("FASTGEN_BENCH_STEPS", "4"))
    model = instantiate(config.model_class, config=config.model)

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    b = int(os.environ.get("FASTGEN_BENCH_BATCH", "1"))
    x = jnp.zeros((b, 3, 60, 104, 16), dtype)
    t = jnp.full((b,), 0.9, jnp.float32)
    cond = {"text_embeds": jax.random.normal(key, (b, 512, 4096), dtype)}
    net = model.net
    params_net = net.init({"params": key}, x, t, condition=cond)
    params_net = jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params_net)

    # generator_fn jits per-chunk programs internally (traced start_frame:
    # one executable per chunk width), so the outer call stays in Python
    def gen(p, noise, k):
        return model.generator_fn(p, noise, rng=k, condition=cond,
                                  student_sample_steps=config.model.student_sample_steps)

    def sync(o):
        return float(jnp.sum(o[0, 0, 0, 0]))

    noise = jax.random.normal(key, (b, 21, 60, 104, 16), dtype)
    sync(gen(params_net, noise, key))
    reps = int(os.environ.get("FASTGEN_BENCH_REPS", "2"))
    t0 = time.perf_counter()
    out = None
    for i in range(reps):
        out = gen(params_net, noise, jax.random.fold_in(key, i))
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    frames_per_sec = b * 21 / dt
    print(json.dumps({
        "metric": (f"CausalWan-1.3B AR {config.model.student_sample_steps}-step"
                   " 21f@480p generation (bf16, KV-cached)"),
        "value": round(frames_per_sec, 3),
        "unit": "latent frames/sec",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
