"""Device mesh + sharding rules: the TPU-native replacement for the
reference's entire distributed stack (``fastgen/utils/distributed/``).

One ``jax.sharding.Mesh`` with axes ``(dp, fsdp, tp)`` expresses everything the
reference builds out of NCCL process groups:

* DDP  (``ddp.py:44-104``)        -> params replicated, batch sharded on dp*fsdp
* FSDP2 (``fsdp.py:67-266``)      -> params sharded over the fsdp axis
* HSDP (``fsdp.py:104-113``)      -> dp>1 and fsdp>1 (2-D replicate x shard)
* NCCL collectives                -> inserted by GSPMD from shardings
* meta-init + rank-0 broadcast (``fsdp.py:139-217``) -> ``jax.eval_shape``
  abstract init + ``jax.device_put`` with NamedSharding (no broadcast needed)

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
the same code then spans hosts with collectives over ICI/DCN.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXES = ("dp", "fsdp")  # batch is sharded over both data axes


def build_mesh(dp: int = 1, fsdp: int = -1, tp: int = 1, sp: int = 1,
               devices=None) -> Mesh:
    """Build the (dp, fsdp, tp, sp) mesh; -1 axes absorb the remaining
    devices. sp (sequence/context parallel, ``parallel.sp``) shards the token
    axis of video-DiT activations; the reference has no such capability."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sizes = {"dp": dp, "fsdp": fsdp, "tp": tp, "sp": sp}
    free = [k for k, v in sizes.items() if v == -1]
    fixed = int(np.prod([v for v in sizes.values() if v != -1]))
    assert n % max(fixed, 1) == 0, f"{n} devices not divisible by fixed axes {sizes}"
    if free:
        assert len(free) == 1, "at most one mesh axis may be -1"
        sizes[free[0]] = n // fixed
    total = int(np.prod(list(sizes.values())))
    assert total == n, f"mesh {sizes} does not cover {n} devices"
    arr = np.asarray(devices).reshape(sizes["dp"], sizes["fsdp"], sizes["tp"],
                                      sizes["sp"])
    return Mesh(arr, ("dp", "fsdp", "tp", "sp"))


def mesh_from_trainer_config(trainer_cfg, devices=None) -> Mesh:
    """Resolve the reference's ddp/fsdp flags into a mesh (surface parity).

    - neither flag: single-axis fsdp=1 (all devices on dp) so pure data
      parallel still uses every chip;
    - ddp: all devices on dp (params replicated);
    - fsdp: all devices on fsdp (params sharded);
    - fsdp + fsdp_sharding_group_size=g: HSDP mesh (n/g, g).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    m = trainer_cfg.mesh
    # an explicit tp/sp request defines the mesh geometry outright — the
    # ddp/fsdp flags can't express those axes; they still control *param*
    # sharding (shard_state fsdp=...) on top of this geometry
    if m.tp > 1 or getattr(m, "sp", 1) > 1:
        return build_mesh(dp=m.dp, fsdp=m.fsdp, tp=m.tp,
                          sp=getattr(m, "sp", 1), devices=devices)
    if trainer_cfg.fsdp:
        g = trainer_cfg.fsdp_sharding_group_size
        if g:
            return build_mesh(dp=n // g, fsdp=g, tp=1, devices=devices)
        return build_mesh(dp=1, fsdp=-1, tp=1, devices=devices)
    if trainer_cfg.ddp:
        return build_mesh(dp=-1, fsdp=1, tp=1, devices=devices)
    return build_mesh(dp=m.dp, fsdp=m.fsdp, tp=m.tp,
                      sp=getattr(m, "sp", 1), devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over both data axes (DDP- and FSDP-equivalent)."""
    return NamedSharding(mesh, P(DATA_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec_for(shape, fsdp_size: int, min_size: int = 2**14) -> P:
    """Shard the largest axis divisible by fsdp_size; small params replicate.

    This is the GSPMD equivalent of FSDP2's flat-param shard: each weight is
    split along one dimension; all-gather/reduce-scatter are inserted by the
    compiler exactly where ``fully_shard`` would do it by hand.
    """
    if int(np.prod(shape)) < min_size:
        return P()
    best_axis, best_len = None, 0
    for i, d in enumerate(shape):
        if d % fsdp_size == 0 and d > best_len:
            best_axis, best_len = i, d
    if best_axis is None:
        return P()
    spec = [None] * len(shape)
    spec[best_axis] = "fsdp"
    return P(*spec)


def _param_spec(path: str, shape, mesh_shape, fsdp: bool,
                min_size: int = 2**14) -> P:
    """Compose the tp rule (if the mesh has a tp axis) with the fsdp rule.

    tp claims its dim first (column/row per ``parallel.tp``); fsdp then takes
    the largest *remaining* dim divisible by the fsdp size — the standard 2-D
    weight sharding (tp within a block, fsdp across blocks' storage).
    """
    from fastgen_tpu.parallel.tp import tp_dim_for

    tp_size = mesh_shape.get("tp", 1)
    spec = [None] * len(shape)
    tp_dim = tp_dim_for(path, tuple(shape), tp_size)
    if tp_dim is not None:
        spec[tp_dim] = "tp"
    fsdp_size = mesh_shape.get("fsdp", 1)
    if fsdp and fsdp_size > 1 and int(np.prod(shape)) >= min_size:
        best_axis, best_len = None, 0
        for i, d in enumerate(shape):
            if i != tp_dim and d % fsdp_size == 0 and d > best_len:
                best_axis, best_len = i, d
        if best_axis is not None:
            spec[best_axis] = "fsdp"
    return P(*spec)


def fsdp_param_shardings(params: Any, mesh: Mesh,
                         min_size: int = 2**14) -> Any:
    """Per-leaf NamedShardings for FSDP-style (+tp if the mesh has it)
    parameter sharding."""
    mesh_shape = dict(mesh.shape)
    if mesh_shape.get("fsdp", 1) == 1 and mesh_shape.get("tp", 1) == 1:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), params)

    def leaf_sharding(path, leaf):
        return NamedSharding(mesh, _param_spec(jax.tree_util.keystr(path),
                                               np.shape(leaf), mesh_shape,
                                               fsdp=True, min_size=min_size))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def state_shardings(state, mesh: Mesh, fsdp: bool = True, min_size: int = 2**14):
    """Shardings for a full MethodState pytree: params/ema/opt sharded like
    FSDP (plus tensor-parallel rules when mesh tp>1), iteration replicated.

    Path-aware: optimizer/EMA trees mirror the param paths, so every moment
    buffer lands on the same shards as its parameter (the property FSDP2 gets
    from DTensor and optax gets for free here).
    """
    mesh_shape = dict(mesh.shape)

    def leaf_sharding(path, leaf):
        if not hasattr(leaf, "shape"):
            return replicated(mesh)
        return NamedSharding(mesh, _param_spec(jax.tree_util.keystr(path),
                                               np.shape(leaf), mesh_shape,
                                               fsdp=fsdp, min_size=min_size))

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def shard_state(state, mesh: Mesh, fsdp: bool = True):
    """device_put the state with FSDP/replicated shardings (the meta-init
    equivalent: host arrays land directly in their shards)."""
    shardings = state_shardings(state, mesh, fsdp=fsdp)
    return jax.device_put(state, shardings), shardings


def shard_batch(batch, mesh: Mesh):
    sh = batch_sharding(mesh)

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, P(DATA_AXES, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, batch)


def process_count() -> int:
    try:
        return jax.process_count()
    except Exception:
        return 1


def is_rank0() -> bool:
    try:
        return jax.process_index() == 0
    except Exception:
        return True
