"""Inference helper tests (ref ``scripts/inference/inference_utils.py`` +
conditioning-media loaders ``video_model_inference.py:63-177``)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.inference.inference_utils import (  # noqa: E402
    load_image_file,
    load_video_frames_file,
    save_image_grid,
    save_video_frames,
    vae_scale_factors,
)


def test_save_image_grid(tmp_path):
    imgs = np.random.RandomState(0).uniform(-1, 1, (5, 8, 8, 3)).astype(np.float32)
    p = save_image_grid(imgs, str(tmp_path / "grid.png"))
    assert os.path.exists(p)


def test_save_video_frames_gif(tmp_path):
    video = np.random.RandomState(0).uniform(-1, 1, (3, 8, 8, 3)).astype(np.float32)
    out = save_video_frames(video, str(tmp_path), "clip")
    names = sorted(os.listdir(out))
    assert "clip.gif" in names and "clip.npz" in names
    assert sum(n.endswith(".png") for n in names) == 3


def test_load_image_file_resizes(tmp_path):
    import PIL.Image

    PIL.Image.fromarray(np.zeros((10, 12, 3), np.uint8)).save(tmp_path / "a.png")
    img = load_image_file(str(tmp_path / "a.png"), 16, 20)
    assert img.shape == (16, 20, 3)
    assert img.min() >= -1.0 and img.max() <= 1.0


def test_load_video_npy_pads_short_clip(tmp_path):
    clip = np.random.RandomState(0).uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)
    np.save(tmp_path / "clip.npy", clip)
    out = load_video_frames_file(str(tmp_path / "clip.npy"), 5, 8, 8)
    assert out.shape == (5, 8, 8, 3)
    # short clips pad with the last frame (ref :110-114)
    np.testing.assert_array_equal(out[2], out[4])


def test_load_video_npy_centers_long_clip(tmp_path):
    clip = np.stack([np.full((8, 8, 3), i / 10 - 0.5, np.float32)
                     for i in range(10)])
    np.save(tmp_path / "clip.npy", clip)
    out = load_video_frames_file(str(tmp_path / "clip.npy"), 4, 8, 8)
    # centered segment (ref :116-119): start = (10-4)//2 = 3
    np.testing.assert_array_equal(out, clip[3:7])


def test_load_video_frame_dir_and_uint8(tmp_path):
    import PIL.Image

    for i in range(3):
        PIL.Image.fromarray(
            np.full((8, 8, 3), 60 * i, np.uint8)).save(tmp_path / f"f{i}.png")
    out = load_video_frames_file(str(tmp_path), 3, 8, 8)
    assert out.shape == (3, 8, 8, 3)
    assert out[0].mean() < out[2].mean()


def test_vae_scale_factors():
    class _M:
        ch_mult = (1, 2, 4)
        temporal_downsample = (True, False)

    class _V:
        module = _M()

    assert vae_scale_factors(_V()) == (2, 4)
    assert vae_scale_factors(None) == (1, 1)


def test_load_prompt_file(tmp_path):
    from scripts.inference.inference_utils import load_prompt_file

    p = tmp_path / "prompts.txt"
    p.write_text("# a comment\nfirst prompt\n\n  second prompt  \n")
    assert load_prompt_file(str(p)) == ["first prompt", "second prompt"]
    (tmp_path / "empty.txt").write_text("# only comments\n\n")
    with pytest.raises(SystemExit):
        load_prompt_file(str(tmp_path / "empty.txt"))


def test_shipped_prompt_assets_parse():
    """The prompts/ asset files (ref scripts/inference/prompts/) all load."""
    from scripts.inference.inference_utils import load_prompt_file

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "scripts", "inference", "prompts")
    for name in ("image_prompts.txt", "validation_video_prompts.txt",
                 "negative_prompt.txt", "negative_prompt_cosmos.txt",
                 "classes.txt", "source_image_paths.txt",
                 "source_video_paths.txt"):
        prompts = load_prompt_file(os.path.join(root, name))
        assert prompts
    assert [int(c) for c in load_prompt_file(
        os.path.join(root, "classes.txt"))] == list(range(10))
