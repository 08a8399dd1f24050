"""Tensor parallelism: Megatron-style column/row sharding rules for the
transformer backbones, expressed purely as GSPMD PartitionSpecs.

The reference has **no tensor parallelism at all** (SURVEY.md §2.4: DDP/FSDP2
only — `/root/reference/fastgen/utils/distributed/fsdp.py`); on TPU a `tp`
mesh axis is the natural way to fit the big DiTs (Flux 12B, Wan 14B) and keep
their matmuls MXU-sized, so this is a capability extension, not a port.

Design: each attention/MLP projection weight is assigned a PartitionSpec —
column-parallel layers shard the output features (`P(..., "tp")`), so heads
and hidden units split across the axis with no communication; row-parallel
layers shard the input features (`P("tp", ...)`), and GSPMD inserts the one
all-reduce per block that Megatron-LM does by hand. No model code changes:
sharding propagates from the weights through the (head-split) attention math.

Rules are keyed on the *module name* of the parameter's owner, which is
stable across the zoo (e.g. ``to_q``/``fc1`` in Wan, ``qkv`` in DiT/CogVideoX,
``img_qkv``/``qkv_mlp`` in Flux, ``q_proj``/``mlp_layer1`` in Cosmos,
``attn1_q``/``ff_proj`` in the SD UNets). An unmatched weight simply falls
back to the FSDP rule — correctness never depends on the table because GSPMD
resharding is semantics-preserving.

Note for real-TPU runs with tp>1: the Pallas flash-attention kernel is a
single-device program; force ``FASTGEN_ATTN_IMPL=xla`` (or rely on the
trainer doing it) so attention is partitioned by XLA over the head axis.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

# Output-features sharded (no comm; heads/hidden split). Final path segment
# of the owning module.
_COLUMN = (
    "to_q", "to_k", "to_v",                      # Wan / LTX2 / diffusers-style
    "qkv", "img_qkv", "txt_qkv", "qkv_mlp",      # DiT / CogVideoX / Flux fused
    "q_proj", "k_proj", "v_proj",                # Cosmos
    "attn1_q", "attn1_k", "attn1_v",             # SD15/SDXL self-attn
    "attn2_q", "attn2_k", "attn2_v",             # SD15/SDXL cross-attn
    "fc1", "ff_in", "ff_proj", "mlp_layer1",     # MLP up-projections
    "img_mlp_in", "txt_mlp_in", "audio_ff_in",
)
# Input-features sharded (one all-reduce after, inserted by GSPMD).
_ROW = (
    "to_out", "proj", "img_proj", "txt_proj", "proj_out", "output_proj",
    "attn1_out", "attn2_out",
    "fc2", "ff_out", "mlp_layer2", "img_mlp_out", "txt_mlp_out",
    "audio_ff_out",
)

_COLUMN_RE = re.compile(r"(^|[/.'\[])(%s)(['\]/.]|$)" % "|".join(_COLUMN))
_ROW_RE = re.compile(r"(^|[/.'\[])(%s)(['\]/.]|$)" % "|".join(_ROW))


def tp_rule_for(path: str) -> Optional[str]:
    """"column" | "row" | None for a parameter path string.

    ``path`` is the keystr of the leaf inside the state pytree, e.g.
    ``params['net']['blocks_0']['self_attn']['to_q']['kernel']`` — matching is
    on the owning-module segment so optimizer-state mirrors (mu/nu/EMA trees,
    which embed the same param paths) inherit identical specs.
    """
    if _ROW_RE.search(path):
        return "row"
    if _COLUMN_RE.search(path):
        return "column"
    return None


def tp_dim_for(path: str, shape: Tuple[int, ...], tp_size: int
               ) -> Optional[int]:
    """Which dim of this leaf gets the "tp" axis (None = replicate over tp).

    Dense kernels are [in, out] (conv kernels [..., in, out]): column-parallel
    shards the last dim, row-parallel the second-to-last. 1-D leaves (biases,
    norm scales) shard dim 0 only for column layers — a row-parallel bias must
    stay replicated since it is added after the all-reduce.
    """
    if tp_size <= 1 or not shape:
        return None
    rule = tp_rule_for(path)
    if rule is None:
        return None
    if len(shape) == 1:
        dim = 0 if rule == "column" else None
    elif rule == "column":
        dim = len(shape) - 1
    else:
        dim = len(shape) - 2
    if dim is None or shape[dim] % tp_size != 0:
        return None
    return dim
