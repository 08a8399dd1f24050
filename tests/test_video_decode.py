"""Raw-video WDS decode (ref ``datasets/decoders.py:80`` decode_video_segment).

The zero-egress image ships no av/ffmpeg, so the decode test is skip-marked;
the gate test (hard error when mp4 is requested with no backend) always runs.
"""

import io
import os
import subprocess
import tarfile

import numpy as np
import pytest

from fastgen_tpu.data.wds import (VideoWDSLoader, _video_decoder_backend,
                                  decode_video_bytes)

BACKEND = _video_decoder_backend()


def _write_shard(tmp_path, members):
    shard = os.path.join(tmp_path, "shard-000000.tar")
    with tarfile.open(shard, "w") as tar:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return shard


class TestVideoDecodeGate:
    def test_mp4_without_backend_raises(self, tmp_path, monkeypatch):
        import fastgen_tpu.data.wds as wds_mod

        monkeypatch.setattr(wds_mod, "_video_decoder_backend", lambda: None)
        shard = _write_shard(str(tmp_path),
                             [("a.mp4", b"\x00" * 64), ("a.txt", b"hi")])
        loader = VideoWDSLoader([shard], batch_size=1, sequence_length=2,
                                key_map={"real": "mp4", "condition": "txt"})
        with pytest.raises(NotImplementedError, match="latent shards"):
            loader.map_sample({"__key__": "a", "mp4": b"\x00" * 64,
                               "txt": "hi"})

    def test_latent_path_unaffected(self, tmp_path):
        arr = np.random.RandomState(0).randn(4, 2, 2, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, arr)
        shard = _write_shard(str(tmp_path),
                             [("a.npy", buf.getvalue()), ("a.txt", b"hi")])
        loader = VideoWDSLoader([shard], batch_size=1, sequence_length=3)
        batch = next(iter(loader))
        assert batch["real"].shape == (1, 3, 2, 2, 3)


@pytest.mark.skipif(BACKEND is None,
                    reason="no av/ffmpeg backend in this image")
class TestVideoDecode:
    def _make_mp4(self, tmp_path, frames):
        """Encode uint8 [T, H, W, 3] frames to an mp4 via ffmpeg."""
        from fastgen_tpu.data.wds import _ffmpeg_exe

        t, h, w, _ = frames.shape
        out = os.path.join(str(tmp_path), "clip.mp4")
        subprocess.run(
            [_ffmpeg_exe(), "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
             "-s", f"{w}x{h}", "-r", "8", "-i", "pipe:0",
             "-pix_fmt", "yuv420p", out],
            input=frames.tobytes(), check=True, capture_output=True)
        with open(out, "rb") as f:
            return f.read()

    def test_decode_video_bytes(self, tmp_path):
        rs = np.random.RandomState(0)
        frames = rs.randint(0, 255, (8, 32, 32, 3), np.uint8)
        data = self._make_mp4(tmp_path, frames)
        out = decode_video_bytes(data, num_frames=5)
        assert out is not None and out.shape == (5, 32, 32, 3)
        assert out.dtype == np.uint8

    def test_loader_end_to_end(self, tmp_path):
        rs = np.random.RandomState(1)
        frames = rs.randint(0, 255, (8, 32, 32, 3), np.uint8)
        data = self._make_mp4(tmp_path, frames)
        shard = _write_shard(str(tmp_path),
                             [("a.mp4", data), ("a.txt", b"a clip")])
        loader = VideoWDSLoader([shard], batch_size=1, sequence_length=4,
                                key_map={"real": "mp4", "condition": "txt"})
        batch = next(iter(loader))
        assert batch["real"].shape == (1, 4, 32, 32, 3)
        assert batch["real"].min() >= -1.0 and batch["real"].max() <= 1.0
