"""WebDataset-style tar-shard loaders (ref ``fastgen/datasets/wds_dataloaders.py``
+ ``wds_utils.py``).

The ``webdataset``/``av`` packages are not in this image, so the tar-shard
format is read directly: each shard is a tar whose members group into samples
by basename-before-first-dot; extensions select decoders. The public config
surface matches the reference: ``datatags=["WDS:/path"]``, ``key_map``,
``files_map``, ``presets_map``, ``presets_filter``, ``ignore_index``,
``input_res`` (``wds_dataloaders.py:194-417``).

Determinism / resume: shards are ordered deterministically, split across
processes (node-splitter, ``wds_utils.py:281``), and ``DeterministicWDS``
resumes from an exact global sample index (``wds_utils.py:530-659``) — the
trainer passes ``sampler_start_idx = iter * batch * accum * world``
(``trainer.py:156-163``).
"""

from __future__ import annotations

import glob
import io
import json
import os
import tarfile
from typing import Any, Dict, Iterator, List, Optional

import numpy as np
import PIL.Image

from fastgen_tpu.data.crop_resize import crop_resize_image
from fastgen_tpu.utils import logging_utils as logger

# canned negative prompts etc. (ref presets in ``wds_dataloaders.py``)
PRESETS = {
    "empty_string": "",
    "neg_prompt_wan": (
        "Bright tones, overexposed, static, blurred details, subtitles, style, "
        "works, paintings, images, static, overall gray, worst quality, "
        "low quality, JPEG compression residue, ugly, incomplete, extra fingers, "
        "poorly drawn hands, poorly drawn faces, deformed, disfigured, "
        "misshapen limbs, fused fingers, still picture, messy background, "
        "three legs, many people in the background, walking backwards"),
}


def decode_member(name: str, data: bytes) -> Any:
    """Decode one tar member by extension (ref ``decoders.py``). Dispatch is
    on the FINAL suffix so multi-dot member names ("x.latent.npy") decode by
    their container format while key_map still addresses the full extension."""
    ext = name.split(".", 1)[1] if "." in name else ""
    ext = ext.rsplit(".", 1)[-1]
    if ext in ("jpg", "jpeg", "png", "webp"):
        # native libjpeg/PNG decode first (GIL-free C, fastgen_tpu/native);
        # anything it can't handle (webp, CMYK, palette PNG) rides PIL
        try:
            from fastgen_tpu import native

            img = native.decode_image_rgb(data)
            if img is not None:
                return PIL.Image.fromarray(img)
        except Exception:  # noqa: BLE001 - PIL fallback
            pass
        return PIL.Image.open(io.BytesIO(data))
    if ext in ("txt", "text"):
        return data.decode("utf-8")
    if ext == "json":
        return json.loads(data)
    if ext == "cls":
        return int(data.decode())
    if ext in ("npy",):
        return np.load(io.BytesIO(data), allow_pickle=False)
    if ext in ("npz",):
        return dict(np.load(io.BytesIO(data)))
    if ext in ("pth", "pt"):
        import torch

        t = torch.load(io.BytesIO(data), map_location="cpu", weights_only=True)
        return t.numpy() if hasattr(t, "numpy") else t
    return data


VIDEO_EXTENSIONS = ("mp4", "mov", "webm", "avi", "mkv")


def _video_decoder_backend() -> Optional[str]:
    """Best available raw-video decode backend: the ``av`` package (the
    reference's path, ``decoders.py:80``), an ``ffmpeg`` binary, or
    ``imageio_ffmpeg``'s bundled binary. None when the image has neither
    (this zero-egress image ships none — latent/npy shards are the
    first-class path)."""
    try:
        import av  # noqa: F401

        return "av"
    except ImportError:
        pass
    import shutil

    if shutil.which("ffmpeg"):
        return "ffmpeg"
    try:
        import imageio_ffmpeg  # noqa: F401

        return "imageio_ffmpeg"
    except ImportError:
        return None


def _ffmpeg_exe() -> str:
    import shutil

    exe = shutil.which("ffmpeg")
    if exe:
        return exe
    import imageio_ffmpeg

    return imageio_ffmpeg.get_ffmpeg_exe()


def decode_video_bytes(data: bytes, num_frames: Optional[int] = None,
                       start_frame: int = 0) -> Optional[np.ndarray]:
    """Decode a video container to [T, H, W, 3] uint8 frames (ref
    ``decode_video_segment``, ``datasets/decoders.py:80-170``).

    Uses PyAV when importable, else pipes through an ffmpeg binary
    (``-f rawvideo -pix_fmt rgb24``); returns None when no backend exists.
    """
    backend = _video_decoder_backend()
    if backend is None:
        return None
    if backend == "av":
        import av

        frames = []
        with av.open(io.BytesIO(data)) as container:
            for i, frame in enumerate(container.decode(video=0)):
                if i < start_frame:
                    continue
                frames.append(frame.to_ndarray(format="rgb24"))
                if num_frames and len(frames) >= num_frames:
                    break
        return np.stack(frames) if frames else None

    # ffmpeg subprocess: mp4 moov atoms can trail the mdat, so stage the
    # bytes in a temp file rather than piping stdin
    import re
    import subprocess
    import tempfile

    exe = _ffmpeg_exe()
    with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
        f.write(data)
        f.flush()
        probe = subprocess.run([exe, "-hide_banner", "-i", f.name],
                               capture_output=True, text=True)
        m = re.search(r"Video:.* (\d{2,})x(\d{2,})", probe.stderr)
        if not m:
            logger.error("ffmpeg could not probe video dimensions")
            return None
        w, h = int(m.group(1)), int(m.group(2))
        cmd = [exe, "-hide_banner", "-loglevel", "error", "-i", f.name,
               "-f", "rawvideo", "-pix_fmt", "rgb24"]
        if num_frames:
            cmd += ["-vframes", str(start_frame + num_frames)]
        cmd += ["pipe:1"]
        raw = subprocess.run(cmd, capture_output=True).stdout
    n = len(raw) // (h * w * 3)
    if n == 0:
        return None
    frames = np.frombuffer(raw[: n * h * w * 3],
                           np.uint8).reshape(n, h, w, 3)
    return frames[start_frame:]


def iter_tar_samples(path: str) -> Iterator[Dict[str, Any]]:
    """Yield {ext: decoded} sample dicts from one tar shard, in file order."""
    with tarfile.open(path, "r") as tf:
        current_key = None
        sample: Dict[str, Any] = {}
        for member in tf:
            if not member.isfile():
                continue
            base = os.path.basename(member.name)
            if "." not in base:
                continue
            key, ext = base.split(".", 1)
            if current_key is not None and key != current_key and sample:
                sample["__key__"] = current_key
                yield sample
                sample = {}
            current_key = key
            sample[ext] = decode_member(base, tf.extractfile(member).read())
        if sample:
            sample["__key__"] = current_key
            yield sample


class ShardWriter:
    """Numbered-tar WDS shard writer — the in-tree counterpart of the
    external ``webdataset.ShardWriter`` the reference points users at
    (``fastgen/datasets/README.md`` "Preparing Your Data"). Produces exactly
    the layout ``iter_tar_samples``/``WDSLoader`` read back::

        with ShardWriter("shards/", shard_size=1000) as w:
            w.write("00000042", {"latent.npy": arr, "txt": "a caption"})

    Value encoding by member suffix: ``np.ndarray`` -> .npy bytes (or .npz
    for a dict of arrays), ``str`` -> utf-8, ``dict`` -> json, ``bytes``
    passthrough (already-encoded media like jpg/mp4).
    """

    def __init__(self, out_dir: str, shard_size: int = 1000,
                 pattern: str = "{:05d}.tar"):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.shard_size = shard_size
        self.pattern = pattern
        self._tar: Optional[tarfile.TarFile] = None
        self._shard_idx = 0
        self._in_shard = 0
        self.num_samples = 0

    @staticmethod
    def _encode(name: str, value: Any) -> bytes:
        if isinstance(value, bytes):
            return value
        if isinstance(value, str):
            return value.encode("utf-8")
        if isinstance(value, dict):
            if name.endswith(".npz"):
                buf = io.BytesIO()
                np.savez(buf, **{k: np.asarray(v) for k, v in value.items()})
                return buf.getvalue()
            return json.dumps(value).encode("utf-8")
        arr = np.asarray(value)
        buf = io.BytesIO()
        np.save(buf, arr)
        return buf.getvalue()

    def write(self, key: str, members: Dict[str, Any]) -> None:
        if self._tar is None:
            path = os.path.join(self.out_dir,
                                self.pattern.format(self._shard_idx))
            self._tar = tarfile.open(path, "w")
            self._in_shard = 0
        for suffix, value in members.items():
            data = self._encode(suffix, value)
            info = tarfile.TarInfo(f"{key}.{suffix}")
            info.size = len(data)
            self._tar.addfile(info, io.BytesIO(data))
        self._in_shard += 1
        self.num_samples += 1
        if self._in_shard >= self.shard_size:
            self._tar.close()
            self._tar = None
            self._shard_idx += 1

    def close(self) -> None:
        if self._tar is not None:
            self._tar.close()
            self._tar = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def resolve_datatags(datatags: List[str]) -> List[str]:
    """'WDS:<dir-or-glob>' -> sorted shard paths (deterministic order)."""
    shards: List[str] = []
    for tag in datatags:
        path = tag.split(":", 1)[1] if tag.startswith("WDS:") else tag
        if os.path.isdir(path):
            shards.extend(sorted(glob.glob(os.path.join(path, "*.tar"))))
        else:
            shards.extend(sorted(glob.glob(path)))
    if not shards:
        raise FileNotFoundError(f"No tar shards found for {datatags}")
    return shards


class BaseWDSLoader:
    """Shard iteration with node splitting + epoch shuffling
    (ref ``wds_utils.py:364``)."""

    def __init__(self, datatags: List[str], batch_size: int = 32, shuffle: bool = True,
                 seed: int = 0, sampler_start_idx: int = 0, prefetch: int = 2,
                 **kwargs):
        self.shards = resolve_datatags(datatags)
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.seed = seed
        self.start_idx = sampler_start_idx
        try:
            import jax

            self.rank, self.world = jax.process_index(), jax.process_count()
        except Exception:
            self.rank, self.world = 0, 1

    def _shard_order(self, epoch: int) -> List[str]:
        order = list(self.shards)
        if self.shuffle:
            np.random.RandomState((self.seed + epoch) % (1 << 31)).shuffle(order)
        # node splitting: strided by process (ref ``_nodesplitter``)
        return order[self.rank::self.world]

    def iter_samples(self) -> Iterator[Dict[str, Any]]:
        epoch = 0
        while True:
            for shard in self._shard_order(epoch):
                yield from iter_tar_samples(shard)
            epoch += 1

    def map_sample(self, sample: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        return sample

    def collate(self, samples: List[Dict[str, Any]]) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k in samples[0]:
            vals = [s[k] for s in samples]
            if isinstance(vals[0], np.ndarray):
                out[k] = np.stack(vals)
            else:
                out[k] = vals
        return out

    def _iter_batches(self):
        it = self.iter_samples()
        skip = self.start_idx // max(self.world, 1)
        batch: List[Dict[str, Any]] = []
        seen = 0
        for sample in it:
            mapped = self.map_sample(sample)
            if mapped is None:
                continue
            seen += 1
            if seen <= skip:
                continue
            batch.append(mapped)
            if len(batch) == self.batch_size:
                yield self.collate(batch)
                batch = []

    def __iter__(self):
        # overlap tar read + decode with device compute (the reference's
        # DataLoader num_workers equivalent)
        from fastgen_tpu.data.prefetch import prefetch_iter

        yield from prefetch_iter(self._iter_batches(), self.prefetch)


class WDSLoader(BaseWDSLoader):
    """key_map / files_map / presets_map sample assembly
    (ref ``wds_dataloaders.py:194-417``)."""

    def __init__(self, datatags, batch_size: int = 32, key_map: Optional[dict] = None,
                 files_map: Optional[dict] = None, presets_map: Optional[dict] = None,
                 presets_filter: Optional[dict] = None, ignore_index: Optional[list] = None,
                 input_res: Optional[int] = None, crop_mode: str = "center", **kwargs):
        super().__init__(datatags, batch_size=batch_size, **kwargs)
        self.key_map = key_map or {}
        self.files_map = {}
        for out_key, path in (files_map or {}).items():
            self.files_map[out_key] = np.load(path) if path.endswith((".npy", ".npz")) \
                else open(path, "rb").read()
        self.presets_map = presets_map or {}
        self.presets_filter = presets_filter or {}
        self.ignore_index = set(ignore_index or [])
        self.input_res = input_res
        self.crop_mode = crop_mode

    def _postprocess(self, value):
        if isinstance(value, PIL.Image.Image):
            res = self.input_res or min(value.size)
            arr = crop_resize_image(value, res, self.crop_mode)
            return arr.astype(np.float32) / 127.5 - 1.0
        return value

    def map_sample(self, sample):
        if sample.get("__key__") in self.ignore_index:
            return None
        for k, want in self.presets_filter.items():
            if sample.get(k) != want:
                return None
        out = {}
        for out_key, ext in self.key_map.items():
            if ext not in sample:
                logger.warning(f"sample {sample.get('__key__')} missing {ext!r}; skipped")
                return None
            out[out_key] = self._postprocess(sample[ext])
        for out_key, preset in self.presets_map.items():
            out[out_key] = PRESETS.get(preset, preset)
        for out_key, value in self.files_map.items():
            out[out_key] = value
        return out


class ImageWDSLoader(WDSLoader):
    """(ref ``wds_dataloaders.py:419``)."""

    def __init__(self, datatags, input_res: int = 512, **kwargs):
        kwargs.setdefault("key_map", {"real": "jpg", "condition": "txt"})
        super().__init__(datatags, input_res=input_res, **kwargs)


class VideoWDSLoader(WDSLoader):
    """(ref ``wds_dataloaders.py:487``). Without the ``av`` package, videos are
    read from .npy/.npz latent members ([T,H,W,C]); raw mp4 decode is gated."""

    def __init__(self, datatags, sequence_length: int = 81, img_size=None, **kwargs):
        kwargs.setdefault("key_map", {"real": "npy", "condition": "txt"})
        super().__init__(datatags, **kwargs)
        self.sequence_length = sequence_length

    def map_sample(self, sample):
        video_keys = [k for k in self.key_map.values()
                      if k.rsplit(".", 1)[-1] in VIDEO_EXTENSIONS]
        if video_keys and _video_decoder_backend() is None:
            raise NotImplementedError(
                "raw video decode requires the 'av' package, an ffmpeg "
                "binary, or imageio_ffmpeg (none present in this image); "
                "use latent shards (.npy/.npz) instead")
        for ext in video_keys:
            if ext in sample and isinstance(sample[ext], (bytes, bytearray)):
                frames = decode_video_bytes(bytes(sample[ext]),
                                            num_frames=self.sequence_length)
                if frames is None:
                    return None
                # [-1,1] float NTHWC, matching the image loaders' range
                sample[ext] = frames.astype(np.float32) / 127.5 - 1.0
        out = super().map_sample(sample)
        if out is None:
            return None
        real = out.get("real")
        if isinstance(real, np.ndarray) and real.ndim == 4:
            out["real"] = real[: self.sequence_length]
        return out


class DeterministicWDS(WDSLoader):
    """Exact global-sample-index resume (ref ``wds_utils.py:530-659``):
    no shuffling of samples within shards; shard order seeded per epoch;
    global index = epoch-major, shard-major, file order. Supports the full
    WDSLoader key_map surface."""

    def __init__(self, datatags, batch_size: int = 32, **kwargs):
        kwargs["shuffle"] = kwargs.get("shuffle", True)
        super().__init__(datatags, batch_size=batch_size, **kwargs)

    def _count_samples(self) -> int:
        if not hasattr(self, "_total"):
            self._total = sum(1 for shard in self.shards
                              for _ in iter_tar_samples(shard))
        return self._total

    def __iter__(self):
        from fastgen_tpu.data.prefetch import prefetch_iter

        # the queue preserves order, so prefetch keeps exact-resume semantics
        yield from prefetch_iter(self._iter_batches(), self.prefetch)

    def _iter_batches(self):
        # world-strided: process r takes global samples r, r+world, ... exactly
        # like the InfiniteSampler, so global batches tile deterministically
        idx = self.start_idx + self.rank
        total = self._count_samples()
        batch: List[Dict[str, Any]] = []
        while True:
            epoch = idx // total
            order = list(self.shards)
            if self.shuffle:
                np.random.RandomState((self.seed + epoch) % (1 << 31)).shuffle(order)
            flat: List[Dict[str, Any]] = []
            for shard in order:
                flat.extend(iter_tar_samples(shard))
            while idx // total == epoch:
                sample = self.map_sample(flat[idx % total])
                if sample is not None:
                    batch.append(sample)
                    if len(batch) == self.batch_size:
                        yield self.collate(batch)
                        batch = []
                idx += self.world
