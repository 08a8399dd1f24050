"""Pipeline parallelism: GPipe-style microbatched execution of a stack of
identical transformer blocks over a ``pp`` mesh axis.

The reference has **no pipeline parallelism** (SURVEY.md §2.4: DDP/FSDP2
only); like ``parallel.tp``/``parallel.sp`` this is a TPU capability
extension, not a port. It targets the scan-over-blocks layout the video
DiTs already use (``WanVideoDiT.scan_blocks``: ``params['blocks']`` leaves
carry a leading ``[num_layers]`` axis) — exactly the layout whose leading
axis shards naturally over a pipeline:

- the ``[L, ...]`` block stack is split contiguously over the ``pp`` axis
  (stage s owns layers ``[s*L/S, (s+1)*L/S)``);
- the batch is split into ``num_microbatches`` microbatches;
- inside one ``shard_map``, every tick each stage applies its block chunk to
  its current microbatch and hands the activation to the next stage with a
  single ``lax.ppermute`` hop (ICI neighbor traffic, no all-to-all);
- after ``M + S - 1`` ticks all microbatches have drained; the last stage's
  outputs are broadcast back with one masked ``psum``.

Everything is ``lax.scan``/``ppermute``/``psum`` — fully differentiable, so
the same function runs under ``jax.grad`` (GPipe schedule: backward replays
the pipeline in reverse through the scan transpose). Bubble fraction is the
textbook ``(S-1)/(M+S-1)``; pick ``num_microbatches >= 4*S`` to amortize.

Composes with dp/fsdp on the batch axes of the mesh: the microbatch loop is
over the *per-shard* batch, and GSPMD handles the batch axes outside the
``shard_map`` as usual.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

try:
    from jax import shard_map as _shard_map  # jax >= 0.8

    def shard_map(f, *, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, *, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)
from jax.sharding import Mesh, PartitionSpec as P


_ACTIVE_MESH = None


def set_active_mesh(mesh) -> None:
    """Register the pipeline mesh that ``scan_blocks`` networks route their
    block stack through (mirrors ``parallel.sp.set_active_mesh``). Pass a
    mesh with a ``pp`` axis >1 to enable; ``None`` to disable."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_active_mesh():
    return _ACTIVE_MESH


def pp_size() -> int:
    m = _ACTIVE_MESH
    if m is None:
        return 1
    return int(dict(m.shape).get("pp", 1))


def auto_microbatches(batch: int, pp: int, target_factor: int = 4) -> int:
    """Largest divisor of ``batch`` that is <= target_factor*pp (bubble
    fraction (pp-1)/(M+pp-1)); at least 1."""
    cap = max(target_factor * pp, 1)
    for m in range(min(batch, cap), 0, -1):
        if batch % m == 0:
            return m
    return 1


def chunk_scan(single_block_apply: Callable[..., Any]) -> Callable[..., Any]:
    """Lift a single-block apply ``fn(params_one, x, *bcast) -> x`` to a
    stage apply over a ``[L_stage, ...]``-stacked params chunk (sequential
    ``lax.scan``, the same execution the non-pipelined scan-over-blocks
    path uses)."""

    def apply_chunk(params_chunk, x, *bcast):
        def body(carry, p):
            return single_block_apply(p, carry, *bcast), None

        x, _ = jax.lax.scan(body, x, params_chunk)
        return x

    return apply_chunk


def pipeline_blocks(stage_apply: Callable[..., Any], stacked_params, x,
                    *bcast, mesh: Mesh, num_microbatches: int,
                    batched=(), axis: str = "pp"):
    """Run ``x`` through the full block stack, pipelined over ``mesh[axis]``.

    Args:
      stage_apply: ``fn(params_stage, x_mb, *batched_mb, *bcast) -> x_mb``
        applying one stage's chunk of blocks (leading axis ``L/S``) to one
        microbatch — typically ``chunk_scan(single_block_apply)``.
      stacked_params: pytree whose leaves carry a leading ``[L]`` layer axis;
        ``L`` must divide by the pipeline size S.
      x: ``[B, ...]`` activations; ``B`` must divide by ``num_microbatches``.
      *bcast: batch-independent broadcast inputs (RoPE tables, masks) passed
        whole to every stage at every tick.
      batched: tuple of per-sample side inputs (timestep embeddings, text
        context) with leading batch axis ``B``; they are microbatched in
        lockstep — stage s at tick t receives the slice for microbatch
        ``t - s``, matching the activation it holds.
      mesh / axis: the mesh and the name of its pipeline axis.

    Returns ``[B, ...]`` outputs equal (up to reduction order) to the serial
    scan over the full stack.
    """
    S = int(dict(mesh.shape)[axis])
    M = int(num_microbatches)
    B = x.shape[0]
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert L % S == 0, f"{L} layers not divisible by pp={S}"
    assert B % M == 0, f"batch {B} not divisible by num_microbatches={M}"
    if S == 1:
        return stage_apply(stacked_params, x, *batched, *bcast)

    xm = x.reshape((M, B // M) + x.shape[1:])
    bm = jax.tree_util.tree_map(
        lambda a: a.reshape((M, B // M) + a.shape[1:]), tuple(batched))
    param_spec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    rep = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)  # noqa: E731

    @partial(shard_map, mesh=mesh,
             in_specs=(param_spec, P(), rep(bm)) + rep(tuple(bcast)),
             out_specs=P())
    def run(params_stage, xm, bm, *bcast):
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(state, t):
            # stage 0 ingests microbatch t (clamped once the feed drains —
            # those ticks' outputs never leave the pipeline); later stages
            # consume the activation ppermuted in on the previous tick,
            # which belongs to microbatch t - idx
            x_in = jnp.where(idx == 0, xm[jnp.minimum(t, M - 1)], state)
            mb_i = jnp.clip(t - idx, 0, M - 1)
            side = jax.tree_util.tree_map(lambda a: a[mb_i], bm)
            y = stage_apply(params_stage, x_in, *side, *bcast)
            return jax.lax.ppermute(y, axis, perm), y

        T = M + S - 1
        state0 = jnp.zeros_like(xm[0])
        _, ys = jax.lax.scan(tick, state0, jnp.arange(T))
        # the last stage emits microbatch m at tick m + (S-1)
        outs = jax.lax.dynamic_slice_in_dim(ys, S - 1, M, axis=0)
        # broadcast the valid (last-stage) outputs to every pp rank
        return jax.lax.psum(jnp.where(idx == S - 1, outs, 0), axis)

    out = run(stacked_params, xm, bm, *bcast)
    return out.reshape((B,) + x.shape[1:])
