"""S3 checkpoint filesystem tests (ref ``utils/distributed/s3_filesystem.py``)
with an in-memory fake client (boto3 is not installed in this image)."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastgen_tpu.utils.s3_filesystem import (
    S3FileSystem,
    is_s3_path,
    load_s3_credentials,
    parse_s3_path,
)


class FakeS3Client:
    """Dict-backed stand-in implementing the subset of boto3 we use."""

    def __init__(self):
        self.store = {}  # (bucket, key) -> bytes

    def upload_file(self, filename, bucket, key):
        with open(filename, "rb") as f:
            self.store[(bucket, key)] = f.read()

    def download_file(self, bucket, key, filename):
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        with open(filename, "wb") as f:
            f.write(self.store[(bucket, key)])

    def list_objects_v2(self, Bucket, Prefix, ContinuationToken=None):
        keys = sorted(k for (b, k) in self.store
                      if b == Bucket and k.startswith(Prefix))
        return {"Contents": [{"Key": k} for k in keys], "IsTruncated": False}


def test_parse_and_predicates():
    assert is_s3_path("s3://bkt/a/b") and not is_s3_path("/tmp/x")
    assert parse_s3_path("s3://bkt/a/b/") == ("bkt", "a/b")
    assert parse_s3_path("s3://bkt") == ("bkt", "")


def test_credentials(tmp_path):
    p = tmp_path / "creds.json"
    p.write_text(json.dumps({"access_key": "AK", "secret_key": "SK",
                             "endpoint_url": "https://e", "region": "us"}))
    kw = load_s3_credentials(str(p))
    assert kw == {"aws_access_key_id": "AK", "aws_secret_access_key": "SK",
                  "endpoint_url": "https://e", "region_name": "us"}


def test_dir_roundtrip(tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha")
    (src / "sub" / "b.bin").write_bytes(b"\x00\x01")
    fs = S3FileSystem(client=FakeS3Client())
    assert not fs.exists("s3://bkt/ckpt")
    assert fs.upload_dir(str(src), "s3://bkt/ckpt") == 2
    assert fs.exists("s3://bkt/ckpt")
    dst = tmp_path / "dst"
    assert fs.download_dir("s3://bkt/ckpt", str(dst)) == 2
    assert (dst / "a.txt").read_text() == "alpha"
    assert (dst / "sub" / "b.bin").read_bytes() == b"\x00\x01"


def test_checkpointer_s3_roundtrip(tmp_path, monkeypatch):
    """Checkpointer with an s3:// save_dir: save syncs up; a fresh
    Checkpointer over the same s3 path restores the state."""
    from flax import struct
    from fastgen_tpu.utils.checkpointer import Checkpointer

    class TinyState(struct.PyTreeNode):
        w: jnp.ndarray
        step: jnp.ndarray

    client = FakeS3Client()
    state = TinyState(w=jnp.arange(4.0), step=jnp.asarray(3))

    import tempfile
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path / "stage1"))
    os.makedirs(tmp_path / "stage1", exist_ok=True)
    ck = Checkpointer("s3://bkt/run1/ckpt", async_save=False, s3_client=client)
    ck.save(3, state, metadata={"callbacks": {"x": 1}})
    ck.wait()
    assert any(k for (b, k) in client.store if b == "bkt")

    # fresh host dir (simulates another machine resuming from S3)
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path / "stage2"))
    os.makedirs(tmp_path / "stage2", exist_ok=True)
    ck2 = Checkpointer("s3://bkt/run1/ckpt", async_save=False, s3_client=client)
    template = TinyState(w=jnp.zeros(4), step=jnp.asarray(0))
    restored, meta, step = ck2.load(template)
    assert step == 3
    np.testing.assert_array_equal(np.asarray(restored.w), np.arange(4.0))
    assert meta == {"callbacks": {"x": 1}}


def test_boto3_missing_raises():
    from fastgen_tpu.utils.checkpointer import Checkpointer

    with pytest.raises(ImportError, match="boto3"):
        Checkpointer("s3://bkt/nope")
