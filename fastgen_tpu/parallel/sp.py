"""Sequence (context) parallelism: shard the token axis of video-DiT
activations over an ``sp`` mesh axis.

The reference has no sequence/context parallelism at all (SURVEY.md §5:
"No ring attention / Ulysses / context parallel" — it scales sequence length
only by chunked autoregression + activation checkpointing). On TPU an ``sp``
axis is the natural way to train diffusion-forcing video at lengths whose
activations exceed one chip: every per-token tensor (patch embeddings, block
activations, FFN workspace) is split N/sp per device, and GSPMD inserts the
collectives around attention (gathering K/V over sp — the "sequence sharding
with gathered KV" recipe) while everything else stays communication-free.

Design: pure sharding constraints, zero model-math changes. The trainer
registers its mesh via ``set_active_mesh``; networks pin their token axis
with ``shard_seq`` at the points where XLA's propagation would otherwise
drop the layout (entry, per-block outputs). When no mesh is registered, the
mesh has no ``sp`` axis, sp == 1, or the token count does not divide, the
helper is an exact no-op — so the same model code runs everywhere.

Composes with dp/fsdp (batch axes) and tp (head axis): activations carry
``P((dp, fsdp), sp, ...)`` while attention partitions heads over tp.
Like tp, sp>1 routes attention through the XLA path (a pallas_call is a
single-device program GSPMD cannot partition).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    """Register the mesh whose axes ``shard_seq`` constraints refer to."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def sp_size() -> int:
    m = _ACTIVE_MESH
    if m is None:
        return 1
    return int(dict(m.shape).get("sp", 1))


def shard_seq(x, seq_axis: int = 1):
    """Pin ``x``'s token axis to the sp mesh axis (batch axis 0 stays on the
    data axes). No-op unless an active mesh with sp>1 is registered and the
    token count divides sp."""
    m = _ACTIVE_MESH
    if m is None:
        return x
    shape = dict(m.shape)
    sp = shape.get("sp", 1)
    if sp <= 1 or x.ndim <= seq_axis or x.shape[seq_axis] % sp != 0:
        return x
    spec = [None] * x.ndim
    data_axes = tuple(a for a in ("dp", "fsdp") if shape.get(a, 1) >= 1)
    data_size = int(np.prod([shape.get(a, 1) for a in data_axes])) if data_axes else 1
    # batch-1 traces (e.g. net.init shape inference) can't take the data axes
    if data_axes and x.shape[0] % max(data_size, 1) == 0:
        spec[0] = data_axes
    spec[seq_axis] = "sp"
    return jax.lax.with_sharding_constraint(x, NamedSharding(m, P(*spec)))
