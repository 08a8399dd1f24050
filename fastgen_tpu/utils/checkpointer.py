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
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self.manager = ocp.CheckpointManager(self.save_dir, options=options)

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
            self.s3.upload_dir(self.save_dir, self.s3_path)
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
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore({"state": state_template}))
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
