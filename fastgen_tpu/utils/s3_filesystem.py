"""S3 filesystem for checkpoints (ref ``utils/distributed/s3_filesystem.py``).

The reference implements a ``FileSystemBase`` over boto3 so DCP can stream
sharded checkpoints to S3 (``s3_filesystem.py:17-196``) plus credential
loading from a JSON file (``:26-44``). Here the same capability wraps the
Orbax checkpointer: an ``s3://bucket/prefix`` save_dir stages locally and
syncs directory trees to/from S3 after each save / before each load.

boto3 is optional (not baked into this image): construction raises a clear
error without it, and everything is injectable for tests (``client=...``).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

from fastgen_tpu.utils import logging_utils as logger


def is_s3_path(path: str) -> bool:
    return isinstance(path, str) and path.startswith("s3://")


def parse_s3_path(path: str) -> Tuple[str, str]:
    """'s3://bucket/some/prefix' -> ('bucket', 'some/prefix')."""
    assert is_s3_path(path), path
    rest = path[len("s3://"):]
    bucket, _, prefix = rest.partition("/")
    return bucket, prefix.rstrip("/")


def load_s3_credentials(credential_path: str) -> dict:
    """JSON credential file -> boto3 client kwargs (ref ``:26-44``)."""
    with open(credential_path) as f:
        creds = json.load(f)
    return {k: creds[src] for k, src in
            (("aws_access_key_id", "access_key"),
             ("aws_secret_access_key", "secret_key"),
             ("endpoint_url", "endpoint_url"),
             ("region_name", "region")) if src in creds}


def make_s3_client(credential_path: Optional[str] = None):
    try:
        import boto3  # noqa: PLC0415
    except ImportError as e:
        raise ImportError(
            "s3:// checkpoint paths require boto3, which is not installed in "
            "this environment — use a local save_dir or install boto3") from e
    kwargs = load_s3_credentials(credential_path) if credential_path else {}
    return boto3.client("s3", **kwargs)


class S3FileSystem:
    """Minimal directory-tree sync over an S3 client."""

    def __init__(self, client=None, credential_path: Optional[str] = None):
        self.client = client or make_s3_client(credential_path)

    def upload_dir(self, local_dir: str, s3_path: str,
                   upload_last: Tuple[str, ...] = ()) -> int:
        """Upload a directory tree; any relpath in ``upload_last`` is uploaded
        after everything else (crash-safety: commit markers go last, so an
        interrupted upload never looks committed on S3)."""
        bucket, prefix = parse_s3_path(s3_path)
        pending, deferred = [], []
        for root, _, files in os.walk(local_dir):
            for name in files:
                full = os.path.join(root, name)
                rel = os.path.relpath(full, local_dir)
                (deferred if rel in upload_last else pending).append((full, rel))
        n = 0
        for full, rel in pending + deferred:
            key = f"{prefix}/{rel}" if prefix else rel
            self.client.upload_file(full, bucket, key)
            n += 1
        logger.info(f"Uploaded {n} files {local_dir} -> {s3_path}")
        return n

    def upload_file(self, local_path: str, s3_path: str) -> None:
        bucket, key = parse_s3_path(s3_path)
        self.client.upload_file(local_path, bucket, key)

    def delete_prefix(self, s3_path: str) -> int:
        """Delete every object under the prefix (mirrors local pruning)."""
        bucket, _ = parse_s3_path(s3_path)
        keys = list(self.list_keys(s3_path))
        for i in range(0, len(keys), 1000):
            self.client.delete_objects(
                Bucket=bucket,
                Delete={"Objects": [{"Key": k} for k in keys[i:i + 1000]]})
        if keys:
            logger.info(f"Deleted {len(keys)} objects under {s3_path}")
        return len(keys)

    def download_dir(self, s3_path: str, local_dir: str) -> int:
        bucket, prefix = parse_s3_path(s3_path)
        n = 0
        for key in self.list_keys(s3_path):
            rel = key[len(prefix):].lstrip("/") if prefix else key
            dest = os.path.join(local_dir, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            self.client.download_file(bucket, key, dest)
            n += 1
        logger.info(f"Downloaded {n} files {s3_path} -> {local_dir}")
        return n

    def list_keys(self, s3_path: str):
        bucket, prefix = parse_s3_path(s3_path)
        token = None
        while True:
            kwargs = {"Bucket": bucket, "Prefix": prefix}
            if token:
                kwargs["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kwargs)
            for item in resp.get("Contents", []):
                yield item["Key"]
            if not resp.get("IsTruncated"):
                return
            token = resp.get("NextContinuationToken")

    def exists(self, s3_path: str) -> bool:
        return next(iter(self.list_keys(s3_path)), None) is not None
