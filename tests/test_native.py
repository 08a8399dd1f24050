"""Native C++ data-loader core (``fastgen_tpu/native``): zip reading, PNG
decode parity vs PIL, dataset integration, and fallback behavior."""

import io
import zipfile

import numpy as np
import PIL.Image
import pytest

from fastgen_tpu import native


def _make_zip(tmp_path, n=4, res=16, gray=False, labels=True):
    rs = np.random.RandomState(0)
    path = tmp_path / "data.zip"
    lab = []
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for i in range(n):
            if gray:
                img = PIL.Image.fromarray(
                    rs.randint(0, 256, (res, res), dtype=np.uint8), "L")
            else:
                img = PIL.Image.fromarray(
                    rs.randint(0, 256, (res, res, 3), dtype=np.uint8))
            b = io.BytesIO()
            img.save(b, "png")
            z.writestr(f"img{i:03d}.png", b.getvalue())
            lab.append([f"img{i:03d}.png", i % 3])
        if labels:
            import json

            z.writestr("dataset.json", json.dumps({"labels": lab}))
    return str(path)


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="no g++/zlib toolchain")


@needs_native
def test_reader_matches_zipfile_and_pil(tmp_path):
    path = _make_zip(tmp_path, n=3)
    r = native.NativeZipReader(path)
    names = r.names()
    with zipfile.ZipFile(path) as z:
        assert set(names) == set(z.namelist())
        for i, nm in enumerate(names):
            assert r.read(i) == z.read(nm)
            if nm.endswith(".png"):
                ref = np.asarray(PIL.Image.open(io.BytesIO(z.read(nm))))
                dec = r.decode_png_rgb(i, 16, 16)
                np.testing.assert_array_equal(dec, ref)
    r.close()


@needs_native
def test_batch_decode(tmp_path):
    path = _make_zip(tmp_path, n=6)
    r = native.NativeZipReader(path)
    png_idx = [i for i, nm in enumerate(r.names()) if nm.endswith(".png")]
    imgs, n_ok = r.decode_batch(png_idx, 16, 16)
    assert n_ok == 6 and imgs.shape == (6, 16, 16, 3)
    # wrong expected resolution -> clean failure, not garbage
    _, n_bad = r.decode_batch(png_idx, 8, 8)
    assert n_bad == 0


@needs_native
def test_dataset_uses_native_with_pil_parity(tmp_path):
    from fastgen_tpu.data.class_cond_dataset import ImageFolderDataset

    path = _make_zip(tmp_path, n=4)
    ds_native = ImageFolderDataset(path=path, cache=False)
    assert ds_native._native_reader() is not None
    ds_pil = ImageFolderDataset(path=path, cache=False)
    ds_pil._native = False  # force fallback
    for i in range(len(ds_native)):
        a, la = ds_native[i]
        b, lb = ds_pil[i]
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(la, lb)


@needs_native
def test_gray_dataset_stays_on_pil_path(tmp_path):
    """1-channel datasets keep the PIL [H,W,1] layout (the native decoder
    broadcasts to RGB, which would contradict num_channels)."""
    from fastgen_tpu.data.class_cond_dataset import ImageFolderDataset

    path = _make_zip(tmp_path, n=2, gray=True, labels=False)
    ds = ImageFolderDataset(path=path, use_labels=False, cache=False)
    img, _ = ds[0]
    assert img.shape == (16, 16, 1)
    assert ds.num_channels == 1


# ---- bytes-level image codec (JPEG via libjpeg + PNG, data/wds.py path) ----

def _encode(arr, fmt, **kw):
    b = io.BytesIO()
    PIL.Image.fromarray(arr).save(b, fmt, **kw)
    return b.getvalue()


@needs_native
def test_decode_image_rgb_png_exact():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (37, 53, 3), np.uint8)
    out = native.decode_image_rgb(_encode(img, "PNG"))
    np.testing.assert_array_equal(out, img)
    # grayscale broadcasts to RGB (the WDS path converts to RGB downstream)
    g = img[..., 0]
    out = native.decode_image_rgb(_encode(g, "PNG"))
    np.testing.assert_array_equal(out, np.stack([g] * 3, -1))


@needs_native
def test_decode_image_rgb_jpeg_matches_pil():
    if not native.decode_image_rgb(_encode(
            np.zeros((8, 8, 3), np.uint8), "JPEG")) is not None:
        pytest.skip("zlib-only degraded build (no libjpeg)")
    rs = np.random.RandomState(1)
    for shape in ((37, 53, 3), (64, 64, 3)):
        img = rs.randint(0, 256, shape, np.uint8)
        data = _encode(img, "JPEG", quality=92)
        out = native.decode_image_rgb(data)
        ref = np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))
        assert out.shape == ref.shape
        # same libjpeg underneath: expect (near-)exact agreement
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
    # grayscale jpeg
    g = rs.randint(0, 256, (24, 31), np.uint8)
    data = _encode(g, "JPEG", quality=90)
    out = native.decode_image_rgb(data)
    ref = np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


@needs_native
def test_decode_image_rgb_rejects_garbage():
    assert native.decode_image_rgb(b"\x00" * 32) is None
    assert native.decode_image_rgb(b"\xff\xd8garbage-not-a-jpeg") is None
    assert native.decode_image_rgb(b"") is None


@needs_native
def test_wds_decode_member_uses_native_with_parity():
    from fastgen_tpu.data.wds import decode_member

    rs = np.random.RandomState(2)
    img = rs.randint(0, 256, (32, 32, 3), np.uint8)
    data = _encode(img, "JPEG", quality=95)
    out = decode_member("sample.jpg", data)
    assert isinstance(out, PIL.Image.Image)
    ref = np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.abs(np.asarray(out).astype(int) - ref.astype(int)).max() <= 1
    # png member
    out = decode_member("sample.png", _encode(img, "PNG"))
    np.testing.assert_array_equal(np.asarray(out), img)
