"""Dataloader tests (mirrors the reference's ``test_dataloader.py`` coverage:
synthetic zip/WDS shard fixtures, resumability invariants, deterministic
order/resume-from-index for DeterministicWDS)."""

import io
import json
import tarfile
import zipfile

import numpy as np
import PIL.Image
import pytest

from fastgen_tpu.data.class_cond_dataloader import ImageLoader, SyntheticVideoLoader
from fastgen_tpu.data.class_cond_dataset import ImageFolderDataset
from fastgen_tpu.data.samplers import InfiniteSampler
from fastgen_tpu.data.wds import (
    DeterministicWDS,
    ImageWDSLoader,
    WDSLoader,
    iter_tar_samples,
    resolve_datatags,
)


@pytest.fixture(scope="module")
def zip_dataset(tmp_path_factory):
    """EDM-style zip with dataset.json labels."""
    path = tmp_path_factory.mktemp("zipds") / "tiny-8x8.zip"
    rs = np.random.RandomState(0)
    labels = []
    with zipfile.ZipFile(path, "w") as z:
        for i in range(20):
            img = PIL.Image.fromarray(rs.randint(0, 255, (8, 8, 3), np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            fname = f"img{i:05d}.png"
            z.writestr(fname, buf.getvalue())
            labels.append([fname, i % 4])
        z.writestr("dataset.json", json.dumps({"labels": labels}))
    return str(path)


@pytest.fixture(scope="module")
def wds_shards(tmp_path_factory):
    """Two tar shards with jpg+txt+cls members."""
    d = tmp_path_factory.mktemp("wds")
    rs = np.random.RandomState(0)
    n = 0
    for shard in range(2):
        with tarfile.open(d / f"shard-{shard:04d}.tar", "w") as tf:
            for i in range(6):
                key = f"s{shard}_{i:04d}"
                img = PIL.Image.fromarray(rs.randint(0, 255, (16, 16, 3), np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                info = tarfile.TarInfo(f"{key}.jpg")
                info.size = len(buf.getvalue())
                tf.addfile(info, io.BytesIO(buf.getvalue()))
                txt = f"caption {n}".encode()
                info = tarfile.TarInfo(f"{key}.txt")
                info.size = len(txt)
                tf.addfile(info, io.BytesIO(txt))
                n += 1
    return str(d)


class TestZipDataset:
    def test_dataset(self, zip_dataset):
        ds = ImageFolderDataset(zip_dataset, use_labels=True)
        assert len(ds) == 20
        assert ds.label_dim == 4
        img, onehot = ds[3]
        assert img.shape == (8, 8, 3) and img.dtype == np.uint8
        assert onehot.shape == (4,) and onehot.sum() == 1

    def test_loader_batches(self, zip_dataset):
        loader = ImageLoader(dataset_path=zip_dataset, batch_size=4, prefetch=0)
        it = iter(loader)
        b = next(it)
        assert b["real"].shape == (4, 8, 8, 3)
        assert b["real"].min() >= -1 and b["real"].max() <= 1
        assert b["condition"].shape == (4, 4)

    def test_sampler_resume(self, zip_dataset):
        """Resume from start_idx yields the same sequence as continuing
        (ref resumability invariants, ``test_dataloader.py:645-1141``)."""
        s1 = list(__import__("itertools").islice(iter(InfiniteSampler(20, seed=3)), 30))
        s2 = list(__import__("itertools").islice(
            iter(InfiniteSampler(20, seed=3, start_idx=10)), 20))
        assert s1[10:] == s2
        # unique within an epoch
        assert sorted(s1[:20]) == list(range(20))


class TestWDS:
    def test_tar_iteration(self, wds_shards):
        shards = resolve_datatags([f"WDS:{wds_shards}"])
        assert len(shards) == 2
        samples = list(iter_tar_samples(shards[0]))
        assert len(samples) == 6
        assert "jpg" in samples[0] and "txt" in samples[0]

    def test_wds_loader_key_map(self, wds_shards):
        loader = WDSLoader([f"WDS:{wds_shards}"], batch_size=4,
                           key_map={"real": "jpg", "condition": "txt"},
                           presets_map={"neg_condition": "empty_string"},
                           input_res=16, shuffle=False)
        b = next(iter(loader))
        assert b["real"].shape == (4, 16, 16, 3)
        assert isinstance(b["condition"][0], str)
        assert b["neg_condition"] == ["", "", "", ""]

    def test_image_wds_loader_resize(self, wds_shards):
        loader = ImageWDSLoader([f"WDS:{wds_shards}"], input_res=8, batch_size=2,
                                shuffle=False)
        b = next(iter(loader))
        assert b["real"].shape == (2, 8, 8, 3)

    def test_deterministic_resume(self, wds_shards):
        kwargs = dict(batch_size=2, key_map={"real": "jpg", "condition": "txt"},
                      input_res=16, seed=5)
        full = DeterministicWDS([f"WDS:{wds_shards}"], **kwargs)
        batches = [next(iter_) for iter_ in [iter(full)] for _ in range(6)]
        # resume at global sample index 4 (= 2 batches in)
        resumed = DeterministicWDS([f"WDS:{wds_shards}"], sampler_start_idx=4,
                                   **kwargs)
        rbatches = [next(it) for it in [iter(resumed)] for _ in range(4)]
        for a, b in zip(batches[2:], rbatches):
            np.testing.assert_array_equal(a["real"], b["real"])
            assert a["condition"] == b["condition"]

    def test_deterministic_epoch_reshuffle(self, wds_shards):
        kwargs = dict(batch_size=12, key_map={"condition": "txt"}, seed=5)
        loader = DeterministicWDS([f"WDS:{wds_shards}"], **kwargs)
        it = iter(loader)
        e0 = next(it)["condition"]
        e1 = next(it)["condition"]
        assert sorted(e0) == sorted(e1)  # same 12 samples


def test_synthetic_video_loader():
    loader = SyntheticVideoLoader(batch_size=2, frames=3, resolution=4,
                                  channels=2, text_len=5, text_dim=8)
    b = next(iter(loader))
    assert b["real"].shape == (2, 3, 4, 4, 2)
    assert b["condition"]["text_embeds"].shape == (2, 5, 8)


def test_augment_pipe_smoke():
    import jax
    import jax.numpy as jnp

    from fastgen_tpu.data.augment import AugmentPipe

    pipe = AugmentPipe(p=0.5, xflip=1, scale=1, rotate_frac=1, brightness=1,
                       contrast=1, lumaflip=1, hue=1, saturation=1)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 8, 8, 3)) * 2 - 1
    out, labels = pipe.process(key, x)
    assert out.shape == x.shape
    assert labels.shape == (4, pipe.label_dim)
    assert bool(jnp.isfinite(out).all())
    # identity at p=0
    pipe0 = AugmentPipe(p=0, xflip=1, brightness=1)
    out0, lab0 = pipe0.process(key, x)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(x))
    assert bool((lab0 == 0).all())


def test_augment_warp_matmul_matches_gather():
    """The MXU one-hot-matmul resample must match map_coordinates exactly
    (same bilinear math, out-of-range fades to 0) on both warp paths."""
    import jax
    import jax.numpy as jnp

    from fastgen_tpu.data.augment import AugmentPipe

    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (3, 16, 16, 3)) * 2 - 1
    for antialias in (False, True):
        pm = AugmentPipe(p=1, scale=1, rotate_frac=1, translate_frac=1,
                         antialias=antialias, warp_impl="matmul")
        pg = AugmentPipe(p=1, scale=1, rotate_frac=1, translate_frac=1,
                         antialias=antialias, warp_impl="gather")
        om, lm = pm.process(key, x)
        og, lg = pg.process(key, x)
        np.testing.assert_array_equal(np.asarray(lm), np.asarray(lg))
        np.testing.assert_allclose(np.asarray(om), np.asarray(og),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"antialias={antialias}")


@pytest.fixture(scope="module")
def kd_shards(tmp_path_factory):
    """WDS shards with precomputed latent/noise/txt_emb/path npy members —
    the KD pair/path loader contract (ref ``configs/data.py:60-82``)."""
    d = tmp_path_factory.mktemp("kdwds")
    rs = np.random.RandomState(3)

    def add_npy(tf, name, arr):
        buf = io.BytesIO()
        np.save(buf, arr)
        info = tarfile.TarInfo(name)
        info.size = len(buf.getvalue())
        tf.addfile(info, io.BytesIO(buf.getvalue()))

    with tarfile.open(d / "shard-0000.tar", "w") as tf:
        for i in range(8):
            key = f"p{i:04d}"
            add_npy(tf, f"{key}.latent.npy", rs.randn(4, 4, 3).astype(np.float32))
            add_npy(tf, f"{key}.noise.npy", rs.randn(4, 4, 3).astype(np.float32))
            add_npy(tf, f"{key}.txt_emb.npy", rs.randn(5, 8).astype(np.float32))
            add_npy(tf, f"{key}.path.npy", rs.randn(4, 4, 4, 3).astype(np.float32))
    return str(d)


class TestKDLoaders:
    def test_pair_loader_preset(self, kd_shards):
        """Pair loader yields {real, noise, condition} precomputed tensors."""
        import copy

        from fastgen_tpu.configs.data import Pair_Loader_Config
        from fastgen_tpu.utils import instantiate

        cfg = copy.deepcopy(Pair_Loader_Config)
        cfg.datatags = [f"WDS:{kd_shards}"]
        loader = instantiate(cfg)
        b = next(iter(loader))
        assert b["real"].shape == (2, 4, 4, 3)
        assert b["noise"].shape == (2, 4, 4, 3)
        assert b["condition"].shape == (2, 5, 8)

    def test_path_loader_preset(self, kd_shards):
        """Path loader yields the 4-step trajectory tensor under 'path'."""
        import copy

        from fastgen_tpu.configs.data import Path_Loader_Config
        from fastgen_tpu.utils import instantiate

        cfg = copy.deepcopy(Path_Loader_Config)
        cfg.datatags = [f"WDS:{kd_shards}"]
        loader = instantiate(cfg)
        b = next(iter(loader))
        assert b["path"].shape == (2, 4, 4, 4, 3)
        assert b["real"].shape == (2, 4, 4, 3)


class TestResumeInvariants:
    """The reference's resumability matrix (``test_dataloader.py:645-1141``):
    unique samples within an epoch, and no overlap/gap across a resumed
    training stream."""

    def test_zip_loader_epoch_unique(self, zip_dataset):
        ds = ImageFolderDataset(path=zip_dataset)
        loader = ImageLoader(dataset=ds, batch_size=4, seed=5, prefetch=0)
        it = iter(loader.sampler)
        epoch = [next(it) for _ in range(len(ds))]
        assert sorted(epoch) == list(range(len(ds)))

    def test_zip_loader_resume_no_overlap_no_gap(self, zip_dataset):
        ds = ImageFolderDataset(path=zip_dataset)
        batch, consumed_iters = 4, 3
        base = ImageLoader(dataset=ds, batch_size=batch, seed=9, prefetch=0)
        it = iter(base.sampler)
        stream = [next(it) for _ in range(batch * 6)]
        resumed = ImageLoader(dataset=ds, batch_size=batch, seed=9, prefetch=0,
                              sampler_start_idx=consumed_iters * batch)
        it2 = iter(resumed.sampler)
        tail = [next(it2) for _ in range(batch * 3)]
        assert tail == stream[consumed_iters * batch:consumed_iters * batch
                              + batch * 3]

    def test_deterministic_wds_no_overlap_across_resume(self, wds_shards):
        kw = dict(datatags=[f"WDS:{wds_shards}"], batch_size=3, seed=2,
                  key_map={"condition": "txt"}, prefetch=0)
        fresh = iter(DeterministicWDS(**kw))
        stream = [tuple(next(fresh)["condition"]) for _ in range(4)]
        resumed = iter(DeterministicWDS(sampler_start_idx=6, **kw))
        tail = [tuple(next(resumed)["condition"]) for _ in range(2)]
        assert tail == stream[2:4]
        # no duplicate samples within the resumed window
        flat = [c for b in stream for c in b]
        assert len(set(flat)) == len(flat)


@pytest.fixture(scope="module")
def rich_shards(tmp_path_factory):
    """Shards with jpg+txt+cls+json members, one sample per shard missing its
    txt (partial sample), mirroring the reference's filtering fixtures
    (ref ``test_dataloader.py:912-1010``)."""
    d = tmp_path_factory.mktemp("richwds")
    rs = np.random.RandomState(1)

    def add(tf, name, payload: bytes):
        info = tarfile.TarInfo(name)
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))

    for shard in range(2):
        with tarfile.open(d / f"shard-{shard:04d}.tar", "w") as tf:
            for i in range(5):
                key = f"r{shard}_{i:04d}"
                img = PIL.Image.fromarray(rs.randint(0, 255, (8, 8, 3), np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                add(tf, f"{key}.jpg", buf.getvalue())
                if i != 2:  # sample index 2 in each shard is partial (no txt)
                    add(tf, f"{key}.txt", f"cap {shard}:{i}".encode())
                add(tf, f"{key}.cls", str(i % 2).encode())
                add(tf, f"{key}.json", json.dumps({"aesthetic": i}).encode())
    return str(d)


class TestWDSFiltering:
    """key_map/presets_filter/ignore_index filtering invariants
    (ref ``test_dataloader.py:912-1010``)."""

    KW = dict(batch_size=1, shuffle=False, prefetch=0)

    def _keys(self, loader, n):
        it = iter(loader)
        return [next(it)["condition"][0] for _ in range(n)]

    def test_partial_samples_skipped(self, rich_shards):
        """Samples missing a key_map member are skipped, not crashed on."""
        loader = WDSLoader([f"WDS:{rich_shards}"],
                           key_map={"real": "jpg", "condition": "txt"},
                           input_res=8, **self.KW)
        caps = self._keys(loader, 8)  # one full epoch = 8 complete samples
        assert len(caps) == 8 and "cap 0:2" not in caps and "cap 1:2" not in caps

    def test_missing_key_optional_when_unmapped(self, rich_shards):
        """A member absent from key_map is irrelevant: mapping only jpg keeps
        all 10 samples including the partial ones."""
        loader = WDSLoader([f"WDS:{rich_shards}"], key_map={"real": "jpg"},
                           input_res=8, **self.KW)
        it = iter(loader)
        seen = [next(it)["real"].shape for _ in range(10)]
        assert len(seen) == 10

    def test_ignore_index(self, rich_shards):
        loader = WDSLoader([f"WDS:{rich_shards}"],
                           key_map={"condition": "txt"},
                           ignore_index=["r0_0000", "r1_0001"], **self.KW)
        caps = self._keys(loader, 6)
        assert "cap 0:0" not in caps and "cap 1:1" not in caps

    def test_presets_filter(self, rich_shards):
        """presets_filter keeps only samples whose member equals the wanted
        value (here: cls == 0 keeps indices 0,2,4 per shard; 2 is partial)."""
        loader = WDSLoader([f"WDS:{rich_shards}"],
                           key_map={"condition": "txt"},
                           presets_filter={"cls": 0}, **self.KW)
        caps = self._keys(loader, 4)
        assert set(caps) == {"cap 0:0", "cap 0:4", "cap 1:0", "cap 1:4"}

    def test_files_map_injection(self, rich_shards, tmp_path):
        """files_map loads a host-side npy once and injects it per sample."""
        emb = np.arange(6, dtype=np.float32).reshape(2, 3)
        path = tmp_path / "fixed_emb.npy"
        np.save(path, emb)
        loader = WDSLoader([f"WDS:{rich_shards}"],
                           key_map={"condition": "txt"},
                           files_map={"neg_condition": str(path)},
                           batch_size=2, shuffle=False, prefetch=0)
        b = next(iter(loader))
        assert b["neg_condition"].shape == (2, 2, 3)
        np.testing.assert_array_equal(b["neg_condition"][0], emb)

    def test_presets_map_passthrough(self, rich_shards):
        """Unknown preset names pass through as literal strings."""
        loader = WDSLoader([f"WDS:{rich_shards}"],
                           key_map={"condition": "txt"},
                           presets_map={"neg_condition": "a literal prompt",
                                        "empty": "empty_string"},
                           **self.KW)
        b = next(iter(loader))
        assert b["neg_condition"] == ["a literal prompt"]
        assert b["empty"] == [""]

    def test_collate_batch_types(self, rich_shards):
        """Collate types: ndarray members stack, strings/ints stay lists
        (ref ``test_deterministic_batch_types``)."""
        loader = WDSLoader([f"WDS:{rich_shards}"],
                           key_map={"real": "jpg", "condition": "txt",
                                    "label": "cls", "meta": "json"},
                           input_res=8, batch_size=4, shuffle=False, prefetch=0)
        b = next(iter(loader))
        assert isinstance(b["real"], np.ndarray) and b["real"].shape == (4, 8, 8, 3)
        assert isinstance(b["condition"], list) and isinstance(b["condition"][0], str)
        assert isinstance(b["label"], list) and isinstance(b["label"][0], int)
        assert isinstance(b["meta"], list) and b["meta"][0] == {"aesthetic": 0}


class TestNodeSplitting:
    """Multi-process sharding invariants, run in-process by forcing rank/world
    (the reference spawns real ranks; the loader only reads the two ints)."""

    def _ranked(self, cls, rank, world, **kw):
        loader = cls(**kw)
        loader.rank, loader.world = rank, world
        return loader

    def test_shard_split_disjoint_union(self, wds_shards):
        kw = dict(datatags=[f"WDS:{wds_shards}"], key_map={"condition": "txt"},
                  batch_size=1, shuffle=False, prefetch=0)
        per_rank = []
        for r in range(2):
            loader = self._ranked(WDSLoader, r, 2, **kw)
            assert loader._shard_order(0) == loader.shards[r::2]
            it = iter(loader)
            per_rank.append({next(it)["condition"][0] for _ in range(6)})
        assert not (per_rank[0] & per_rank[1])
        assert len(per_rank[0] | per_rank[1]) == 12

    def test_deterministic_world_strided_tiling(self, wds_shards):
        """DeterministicWDS world-striding: rank r takes global samples
        r, r+world, ... so one epoch across ranks tiles every sample exactly
        once (the invariant the trainer's sampler_start_idx math relies on)."""
        kw = dict(datatags=[f"WDS:{wds_shards}"], key_map={"condition": "txt"},
                  batch_size=3, seed=11, prefetch=0)
        streams = []
        for r in range(2):
            it = iter(self._ranked(DeterministicWDS, r, 2, **kw))
            streams.append([c for _ in range(2) for c in next(it)["condition"]])
        assert not (set(streams[0]) & set(streams[1]))
        assert len(set(streams[0]) | set(streams[1])) == 12
        # global order interleaves rank streams sample-by-sample
        fresh = iter(DeterministicWDS(**kw))
        global_order = [c for _ in range(4) for c in next(fresh)["condition"]]
        assert global_order[0::2] == streams[0]
        assert global_order[1::2] == streams[1]

    def test_deterministic_resume_matches_world_math(self, wds_shards):
        """Resume with start_idx = iters*batch*world reproduces each rank's
        continuation exactly (trainer.py sampler_start_idx contract)."""
        kw = dict(datatags=[f"WDS:{wds_shards}"], key_map={"condition": "txt"},
                  batch_size=2, seed=4, prefetch=0)
        for r in range(2):
            full = iter(self._ranked(DeterministicWDS, r, 2, **kw))
            stream = [tuple(next(full)["condition"]) for _ in range(4)]
            resumed = iter(self._ranked(DeterministicWDS, r, 2,
                                        sampler_start_idx=2 * 2 * 2, **kw))
            tail = [tuple(next(resumed)["condition"]) for _ in range(2)]
            assert tail == stream[2:4]


class TestDeterministicFiltering:
    """DeterministicWDS × ignore_index (ref ``test_deterministic_with_
    ignore_index`` / ``test_deterministic_resume_with_ignore_index``)."""

    def test_ignored_never_yielded(self, wds_shards):
        loader = DeterministicWDS([f"WDS:{wds_shards}"], batch_size=1, seed=0,
                                  key_map={"condition": "txt"}, prefetch=0,
                                  ignore_index=["s0_0001", "s1_0003"])
        it = iter(loader)
        caps = [next(it)["condition"][0] for _ in range(10)]  # one epoch
        assert "caption 1" not in caps and "caption 9" not in caps
        assert len(set(caps)) == 10

    def test_resume_with_ignore_is_contiguous_suffix(self, wds_shards):
        kw = dict(datatags=[f"WDS:{wds_shards}"], batch_size=1, seed=0,
                  key_map={"condition": "txt"}, prefetch=0,
                  ignore_index=["s0_0001", "s1_0003"])
        fresh = iter(DeterministicWDS(**kw))
        stream = [next(fresh)["condition"][0] for _ in range(20)]
        resumed = iter(DeterministicWDS(sampler_start_idx=5, **kw))
        tail = [next(resumed)["condition"][0] for _ in range(6)]
        pos = stream.index(tail[0])
        assert stream[pos:pos + 6] == tail

    def test_data_integrity_across_resume(self, wds_shards):
        """Resumed pixel data is bit-exact, not merely same keys
        (ref ``test_deterministic_data_integrity``)."""
        kw = dict(datatags=[f"WDS:{wds_shards}"], batch_size=2, seed=8,
                  key_map={"real": "jpg"}, input_res=16, prefetch=0)
        fresh = iter(DeterministicWDS(**kw))
        imgs = [next(fresh)["real"] for _ in range(4)]
        resumed = iter(DeterministicWDS(sampler_start_idx=4, **kw))
        for want in imgs[2:]:
            np.testing.assert_array_equal(next(resumed)["real"], want)


class TestDecoders:
    """decode_member extension dispatch incl. multi-dot member names
    (ref ``decoders.py``)."""

    def test_scalar_and_structured_members(self):
        from fastgen_tpu.data.wds import decode_member

        assert decode_member("a.cls", b"7") == 7
        assert decode_member("a.json", b'{"x": 1}') == {"x": 1}
        assert decode_member("a.txt", "héllo".encode()) == "héllo"

    def test_npy_and_npz(self):
        from fastgen_tpu.data.wds import decode_member

        arr = np.arange(4, dtype=np.int32)
        buf = io.BytesIO()
        np.save(buf, arr)
        np.testing.assert_array_equal(decode_member("a.npy", buf.getvalue()), arr)
        buf = io.BytesIO()
        np.savez(buf, x=arr)
        out = decode_member("a.npz", buf.getvalue())
        np.testing.assert_array_equal(out["x"], arr)

    def test_multidot_name_decodes_by_final_suffix(self):
        from fastgen_tpu.data.wds import decode_member

        arr = np.ones((2, 2), np.float32)
        buf = io.BytesIO()
        np.save(buf, arr)
        np.testing.assert_array_equal(
            decode_member("a.latent.npy", buf.getvalue()), arr)

    def test_unknown_extension_passes_bytes(self):
        from fastgen_tpu.data.wds import decode_member

        assert decode_member("a.bin", b"\x00\x01") == b"\x00\x01"


class TestVideoWDS:
    def test_sequence_length_truncation(self, tmp_path):
        from fastgen_tpu.data.wds import VideoWDSLoader

        rs = np.random.RandomState(0)
        with tarfile.open(tmp_path / "v-0000.tar", "w") as tf:
            for i in range(3):
                buf = io.BytesIO()
                np.save(buf, rs.randn(9, 4, 4, 3).astype(np.float32))
                info = tarfile.TarInfo(f"v{i:04d}.npy")
                info.size = len(buf.getvalue())
                tf.addfile(info, io.BytesIO(buf.getvalue()))
                cap = f"video {i}".encode()
                info = tarfile.TarInfo(f"v{i:04d}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))
        loader = VideoWDSLoader([f"WDS:{tmp_path}"], sequence_length=5,
                                batch_size=2, shuffle=False, prefetch=0)
        b = next(iter(loader))
        assert b["real"].shape == (2, 5, 4, 4, 3)

    def test_mp4_requires_av(self, wds_shards):
        from fastgen_tpu.data.wds import VideoWDSLoader

        loader = VideoWDSLoader([f"WDS:{wds_shards}"], batch_size=1,
                                key_map={"real": "mp4"}, prefetch=0)
        with pytest.raises(NotImplementedError):
            next(iter(loader))


class TestShardWriter:
    """ShardWriter (data/wds.py): the in-tree webdataset.ShardWriter
    equivalent must round-trip through iter_tar_samples/WDSLoader."""

    def test_roundtrip_and_sharding(self, tmp_path):
        from fastgen_tpu.data.wds import ShardWriter, iter_tar_samples

        rs = np.random.RandomState(0)
        arrs = [rs.randn(3, 4).astype(np.float32) for _ in range(5)]
        with ShardWriter(str(tmp_path), shard_size=2) as w:
            for i, a in enumerate(arrs):
                w.write(f"{i:08d}", {"latent.npy": a, "txt": f"caption {i}",
                                     "meta.json": {"idx": i},
                                     "stats.npz": {"mu": a.mean(0)}})
        import os

        shards = sorted(os.listdir(tmp_path))
        assert shards == ["00000.tar", "00001.tar", "00002.tar"]

        seen = []
        for shard in shards:
            for s in iter_tar_samples(str(tmp_path / shard)):
                i = int(s["__key__"])
                np.testing.assert_array_equal(s["latent.npy"], arrs[i])
                assert s["txt"] == f"caption {i}"
                assert s["meta.json"]["idx"] == i
                np.testing.assert_allclose(s["stats.npz"]["mu"],
                                           arrs[i].mean(0), rtol=1e-6)
                seen.append(i)
        assert seen == list(range(5))

    def test_loader_reads_written_shards(self, tmp_path):
        from fastgen_tpu.data.wds import ShardWriter, WDSLoader

        with ShardWriter(str(tmp_path)) as w:
            for i in range(4):
                w.write(f"{i:08d}", {"latent.npy": np.full((2, 2), i, np.float32),
                                     "txt_emb.npy": np.arange(3, dtype=np.float32)})
        loader = WDSLoader(datatags=[f"WDS:{tmp_path}"], batch_size=4,
                           key_map={"real": "latent.npy",
                                    "condition": "txt_emb.npy"})
        batch = next(iter(loader))
        assert batch["real"].shape == (4, 2, 2)
        assert batch["condition"].shape == (4, 3)

    def test_pack_wds_cli(self, tmp_path):
        """scripts/pack_wds.py groups files by stem into shards."""
        import os
        import subprocess
        import sys as _sys

        src = tmp_path / "src"
        src.mkdir()
        for i in range(3):
            np.save(src / f"s{i}.latent.npy", np.full((2,), i, np.float32))
            (src / f"s{i}.txt").write_text(f"cap {i}")
        out = tmp_path / "shards"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [_sys.executable, os.path.join(repo, "scripts", "pack_wds.py"),
             "--src", str(src), "--out", str(out), "--shard_size", "2"],
            capture_output=True, text=True,
            env={**os.environ, "PYTHONPATH": repo, "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, r.stderr
        from fastgen_tpu.data.wds import iter_tar_samples

        samples = [s for shard in sorted(os.listdir(out))
                   for s in iter_tar_samples(str(out / shard))]
        assert [s["__key__"] for s in samples] == ["s0", "s1", "s2"]
        assert samples[1]["txt"] == "cap 1"
        np.testing.assert_array_equal(samples[2]["latent.npy"],
                                      np.full((2,), 2, np.float32))
