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
