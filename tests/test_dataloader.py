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
