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


class OrderedFakeS3Client(FakeS3Client):
    """Also records upload order and supports delete_objects."""

    def __init__(self):
        super().__init__()
        self.upload_order = []

    def upload_file(self, filename, bucket, key):
        super().upload_file(filename, bucket, key)
        self.upload_order.append(key)

    def delete_objects(self, Bucket, Delete):
        for obj in Delete["Objects"]:
            self.store.pop((Bucket, obj["Key"]), None)
        return {}


class TestCrashSafety:
    """The advisor-found S3 safety contract: commit marker uploads last, a
    crash mid-upload never restores as a committed step, and steps pruned by
    max_to_keep never resurrect from S3."""

    def test_commit_marker_uploads_last(self, tmp_path):
        src = tmp_path / "step"
        src.mkdir()
        (src / "_CHECKPOINT_METADATA").write_text("{}")
        (src / "array_0").write_bytes(b"x" * 16)
        (src / "zz_shard").write_bytes(b"y" * 16)
        client = OrderedFakeS3Client()
        fs = S3FileSystem(client=client)
        fs.upload_dir(str(src), "s3://bkt/ck/7",
                      upload_last=("_CHECKPOINT_METADATA",))
        assert client.upload_order[-1].endswith("_CHECKPOINT_METADATA")
        assert len(client.upload_order) == 3

    def test_uncommitted_step_dropped_on_resume(self, tmp_path, monkeypatch):
        """A step prefix in S3 without the Orbax commit marker (crash mid-
        upload) is not restorable."""
        import tempfile

        from fastgen_tpu.utils.checkpointer import Checkpointer

        client = OrderedFakeS3Client()
        # committed step 1
        client.store[("bkt", "run/ckpt/1/_CHECKPOINT_METADATA")] = b"{}"
        client.store[("bkt", "run/ckpt/1/data")] = b"d1"
        # torn step 2: no commit marker
        client.store[("bkt", "run/ckpt/2/data")] = b"d2"
        monkeypatch.setattr(tempfile, "gettempdir",
                            lambda: str(tmp_path / "stage"))
        os.makedirs(tmp_path / "stage", exist_ok=True)
        ck = Checkpointer("s3://bkt/run/ckpt", async_save=False,
                          s3_client=client)
        staged = [d for d in os.listdir(ck.save_dir) if d.isdigit()]
        assert staged == ["1"]

    def test_pruned_steps_deleted_from_s3(self, tmp_path, monkeypatch):
        """max_to_keep pruning mirrors to S3 so stale steps cannot resurrect
        on the next restart."""
        import tempfile

        import jax.numpy as jnp
        from flax import struct

        from fastgen_tpu.utils.checkpointer import Checkpointer

        class TinyState(struct.PyTreeNode):
            w: jnp.ndarray

        client = OrderedFakeS3Client()
        monkeypatch.setattr(tempfile, "gettempdir",
                            lambda: str(tmp_path / "stage"))
        os.makedirs(tmp_path / "stage", exist_ok=True)
        ck = Checkpointer("s3://bkt/run2/ckpt", async_save=False,
                          s3_client=client, max_to_keep=1)
        ck.save(1, TinyState(w=jnp.zeros(2)))
        ck.wait()
        ck.save(2, TinyState(w=jnp.ones(2)))
        ck.wait()
        tops = {k.split("run2/ckpt/")[1].split("/")[0]
                for (_, k) in client.store if "run2/ckpt/" in k}
        steps = {t for t in tops if t.isdigit()}
        assert steps == {"2"}


def test_trainer_use_s3_wiring(tmp_path):
    """trainer.use_s3 routes checkpoints to <s3_container>/<save_dir> with the
    configured credentials (ref ``checkpointer.py:99-141``). Without boto3 in
    the image this surfaces as the ImportError from client construction —
    proving the s3 path was actually taken."""
    from fastgen_tpu.configs.methods.config_sft import create_config
    from fastgen_tpu.trainer import Trainer

    cfg = create_config()
    cfg.trainer.checkpointer.use_s3 = True
    cfg.trainer.checkpointer.s3_container = "s3://bkt/fastgen"
    cfg.trainer.checkpointer.s3_credential = str(tmp_path / "creds.json")
    (tmp_path / "creds.json").write_text('{"access_key": "a", "secret_key": "b"}')
    with pytest.raises(ImportError, match="boto3"):
        Trainer(cfg)
