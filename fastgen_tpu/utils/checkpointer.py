"""Orbax-based sharded checkpointing (ref ``fastgen/utils/checkpointer.py``).

One Checkpointer covers both of the reference's classes: Orbax writes sharded
per-host like DCP's ``FSDPCheckpointer`` (``checkpointer.py:267-331``) and
restores into any new sharding/topology, which also covers the single-file
``Checkpointer`` semantics. Async save overlaps with training.

Layout per step: the full ``MethodState`` pytree
``{params, opt_states, ema, iteration}`` plus a small metadata dict
(callback state, python-side counters).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from fastgen_tpu.utils import logging_utils as logger


def tolerant_merge(template, raw, path: str = ""):
    """Merge an orbax raw-restored tree (dicts/lists only) into a typed
    template pytree. Missing entries keep the template's (initialized) value;
    extra raw entries are dropped; shape mismatches keep init and warn."""
    import dataclasses

    import jax.numpy as jnp

    if raw is None:
        if template is not None:
            logger.warning(f"checkpoint missing {path or '<root>'}; keeping init")
        return template
    if isinstance(template, dict):
        src = raw if isinstance(raw, dict) else {}
        return {k: tolerant_merge(v, src.get(k), f"{path}/{k}")
                for k, v in template.items()}
    if isinstance(template, tuple) and hasattr(template, "_fields"):  # namedtuple
        src = raw if isinstance(raw, dict) else {}
        return type(template)(**{
            f: tolerant_merge(getattr(template, f), src.get(f), f"{path}/{f}")
            for f in template._fields})
    if isinstance(template, (list, tuple)):
        src = list(raw) if isinstance(raw, (list, tuple)) else []
        merged = [tolerant_merge(v, src[i] if i < len(src) else None,
                                 f"{path}[{i}]")
                  for i, v in enumerate(template)]
        return type(template)(merged) if isinstance(template, tuple) else merged
    if dataclasses.is_dataclass(template) and not isinstance(template, type):
        src = raw if isinstance(raw, dict) else {}
        kwargs = {f.name: tolerant_merge(getattr(template, f.name),
                                         src.get(f.name), f"{path}/{f.name}")
                  for f in dataclasses.fields(template)}
        return template.replace(**kwargs) if hasattr(template, "replace") \
            else type(template)(**kwargs)
    # leaf
    if hasattr(template, "shape") and hasattr(raw, "shape") and \
            tuple(template.shape) != tuple(raw.shape):
        logger.warning(f"checkpoint shape mismatch at {path}: "
                       f"{raw.shape} vs {template.shape}; keeping init")
        return template
    if hasattr(template, "dtype"):
        return jnp.asarray(raw, dtype=template.dtype)
    return raw


class Checkpointer:
    def __init__(self, save_dir: str, max_to_keep: Optional[int] = None,
                 async_save: bool = True, s3_client=None,
                 s3_credential_path: Optional[str] = None, **kwargs):
        from fastgen_tpu.utils.s3_filesystem import S3FileSystem, is_s3_path

        # s3:// save dirs stage locally and sync after save / before load
        # (ref ``utils/distributed/s3_filesystem.py`` S3StorageWriter/Reader)
        self.s3_path: Optional[str] = None
        self.s3: Optional[S3FileSystem] = None
        if is_s3_path(save_dir):
            import jax

            # multi-host Orbax needs a directory shared by all processes; the
            # per-host tempdir staging below is single-host only (advisor r1)
            assert jax.process_count() == 1, (
                "s3:// checkpoint staging is single-host only — use shared "
                "storage (NFS/GCS) for multi-host runs")
            self.s3_path = save_dir.rstrip("/")
            self.s3 = S3FileSystem(client=s3_client,
                                   credential_path=s3_credential_path)
            import hashlib
            import tempfile

            tag = hashlib.md5(self.s3_path.encode()).hexdigest()[:12]
            save_dir = os.path.join(tempfile.gettempdir(),
                                    f"fastgen_ckpt_{tag}")
            if self.s3.exists(self.s3_path):
                os.makedirs(save_dir, exist_ok=True)
                self.s3.download_dir(self.s3_path, save_dir)
                self._drop_uncommitted_steps(save_dir)
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self.manager = ocp.CheckpointManager(self.save_dir, options=options)

    # Orbax finalizes a step by writing this file at the step-dir root; it is
    # the commit marker the S3 sync orders around
    _COMMIT_MARKER = "_CHECKPOINT_METADATA"

    @classmethod
    def _drop_uncommitted_steps(cls, save_dir: str) -> None:
        """Remove locally staged step dirs lacking the Orbax commit marker
        (a crash mid-upload must not be restorable as a committed step)."""
        import shutil

        for name in os.listdir(save_dir):
            full = os.path.join(save_dir, name)
            if (name.isdigit() and os.path.isdir(full)
                    and not os.path.exists(os.path.join(full, cls._COMMIT_MARKER))):
                logger.warning(f"Dropping uncommitted checkpoint step {name}")
                shutil.rmtree(full)

    def _sync_step_to_s3(self, iteration: int) -> None:
        """Upload only the new step (commit marker last) + its metadata
        sidecar, then mirror local max_to_keep pruning to S3 so pruned steps
        never resurrect on restart."""
        from fastgen_tpu.utils.s3_filesystem import parse_s3_path

        step_dir = os.path.join(self.save_dir, str(iteration))
        self.s3.upload_dir(step_dir, f"{self.s3_path}/{iteration}",
                           upload_last=(self._COMMIT_MARKER,))
        meta = os.path.join(self.save_dir, f"metadata_{iteration}.json")
        if os.path.exists(meta):
            self.s3.upload_file(meta, f"{self.s3_path}/metadata_{iteration}.json")
        local_steps = {name for name in os.listdir(self.save_dir)
                       if name.isdigit()
                       and os.path.isdir(os.path.join(self.save_dir, name))}
        _, prefix = parse_s3_path(self.s3_path)
        remote_steps = set()
        for key in self.s3.list_keys(self.s3_path):
            rel = key[len(prefix):].lstrip("/") if prefix else key
            top = rel.split("/")[0]
            if top.isdigit():
                remote_steps.add(top)
        for step in sorted(remote_steps - local_steps):
            # trailing slash: prefix "1" would string-match steps "10"/"123"
            self.s3.delete_prefix(f"{self.s3_path}/{step}/")
            # the metadata sidecar lives OUTSIDE the step prefix — delete it
            # too or pruned steps' sidecars accumulate forever
            self.s3.delete_prefix(f"{self.s3_path}/metadata_{step}.json")

    def save(self, iteration: int, state: Any, metadata: Optional[dict] = None) -> None:
        self.manager.save(iteration, args=ocp.args.StandardSave({"state": state}))
        if metadata:
            # host-side metadata (callback state) rides as a JSON sidecar: it is
            # tiny and structure-free, which orbax's strict tree matching is not
            import json

            with open(os.path.join(self.save_dir, f"metadata_{iteration}.json"), "w") as f:
                json.dump(metadata, f)
        if self.s3 is not None:
            self.manager.wait_until_finished()
            self._sync_step_to_s3(iteration)
        logger.info(f"Queued checkpoint save at iteration {iteration} -> {self.save_dir}")

    def wait(self):
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def load(self, state_template: Any, step: Optional[int] = None,
             metadata_template: Optional[dict] = None):
        """Restore into the template's shapes/shardings; returns (state, metadata, step).

        Missing checkpoint -> (None, None, None) (trainer starts fresh, like the
        reference's resume scan, ``checkpointer.py:113-197``).
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None, None
        try:
            restored = self.manager.restore(
                step, args=ocp.args.StandardRestore({"state": state_template}))
        except Exception as e:
            # tolerant load (reference ``checkpointer.py:113-197`` strict=False
            # + fresh-optimizer fallback ``:411-432``): raw-restore the saved
            # tree and merge leaves into the template — missing keys keep
            # their initialized values, extra keys are dropped, shape
            # mismatches keep init with a warning.
            logger.warning(f"strict restore failed ({type(e).__name__}); "
                           "falling back to tolerant merge")
            raw = self.manager.restore(step)
            restored = {"state": tolerant_merge(state_template,
                                                raw.get("state", raw))}
        metadata = None
        meta_path = os.path.join(self.save_dir, f"metadata_{step}.json")
        if os.path.exists(meta_path):
            import json

            with open(meta_path) as f:
                metadata = json.load(f)
        logger.info(f"Restored checkpoint step {step} from {self.save_dir}")
        return restored["state"], metadata, step

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()


class FSDPCheckpointer(Checkpointer):
    """Alias for surface parity — Orbax is natively sharded."""


def raw_restore(path: str, step: Optional[int] = None):
    """Raw-restore an Orbax run directory as host numpy: ``(state_dict,
    step)``. Numpy matters — orbax-restored jax.Arrays carry committed
    devices and layouts that poison donated jitted steps downstream (TPU
    backend InvalidArgument); numpy leaves re-enter as fresh default-layout
    buffers."""
    import jax
    import numpy as np

    mngr = ocp.CheckpointManager(os.path.abspath(path))
    try:
        step = step if step is not None else mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint steps under {path}")
        raw = mngr.restore(step)
    finally:
        mngr.close()
    raw = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, raw)
    return raw.get("state", raw), step


def load_native_net_params(path: str, step: Optional[int] = None,
                           prefer_ema: bool = True):
    """Raw-restore a fastgen-tpu Orbax run directory and return the net's
    variable tree — the native counterpart of ``load_torch_state_dict`` for
    ``pretrained_model_path`` (e.g. a stage-1 SFT teacher feeding a DMD2
    distillation run, ref ``model.py:600-644`` loads its own torch ckpts the
    same way). Prefers the first EMA tree when present."""
    state, step = raw_restore(path, step)
    if prefer_ema and state.get("ema"):
        name = sorted(state["ema"])[0]
        logger.info(f"Loaded native ckpt {path}@{step} (ema '{name}')")
        return state["ema"][name]
    logger.info(f"Loaded native ckpt {path}@{step} (net params)")
    return state["params"]["net"]


# --------------------------------------------------------------------- npz
# Portable single-file param snapshots. Orbax run directories are the
# checkpoint of record, but they are large (opt state, per-leaf dirs) and live
# under untracked output roots; these helpers pack just a net's variable tree
# into one compressed npz small enough to commit, so long-horizon runs survive
# the session that produced them (QUALITY.md v6). bf16 arrays are stored as a
# uint16 view with a ``::bf16`` key suffix — numpy can't serialize ml_dtypes
# descriptors portably.

_BF16_SUFFIX = "::bf16"


def _flatten_variables(tree, prefix=""):
    import numpy as np

    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            # non-str keys would stringify into the '/'-joined npz name and
            # load back as a str-keyed tree that silently fails to merge
            assert isinstance(k, str), f"non-str param key {k!r} ({type(k)})"
            assert "/" not in k, f"'/' in param key {k!r}"
            flat.update(_flatten_variables(v, f"{prefix}{k}/"))
        return flat
    flat[prefix[:-1]] = np.asarray(tree)
    return flat


def save_net_params_npz(variables, out_path: str, dtype: str = "bfloat16"):
    """Pack a net variable tree into one compressed npz (atomic write).

    ``dtype``: narrow floating leaves to this dtype ("bfloat16"/"float16"/
    "float32"); integer/bool leaves (e.g. BN counters) keep their dtype."""
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np

    target = jnp.dtype(dtype)
    out = {}
    for key, arr in _flatten_variables(variables).items():
        if np.issubdtype(arr.dtype, np.floating) or \
                jnp.issubdtype(arr.dtype, jnp.floating):
            # any float (incl. ml_dtypes fp8/bf16) narrows to the target —
            # a dtype we can't round-trip must fail HERE, not at load time
            arr = arr.astype(target)
        if arr.dtype == ml_dtypes.bfloat16:
            key, arr = key + _BF16_SUFFIX, arr.view(np.uint16)
        if not (np.issubdtype(arr.dtype, np.floating)
                or np.issubdtype(arr.dtype, np.integer)
                or np.issubdtype(arr.dtype, np.bool_)):
            raise ValueError(f"cannot serialize {key!r} dtype {arr.dtype} "
                             f"portably in npz")
        out[key] = arr
    tmp = f"{out_path}.tmp.npz"
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez_compressed(tmp, **out)
    os.replace(tmp, out_path)
    logger.info(f"Saved {len(out)} param leaves to {out_path}")


def load_net_params_npz(path: str):
    """Inverse of :func:`save_net_params_npz` — returns the nested variable
    dict with numpy leaves (bf16 restored via ml_dtypes)."""
    import ml_dtypes
    import numpy as np

    tree: dict = {}
    with np.load(path) as data:
        for key in data.files:
            arr = data[key]
            if key.endswith(_BF16_SUFFIX):
                key, arr = key[:-len(_BF16_SUFFIX)], arr.view(ml_dtypes.bfloat16)
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return tree
