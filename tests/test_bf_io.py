"""Remote-blob IO (blobfile parity) against fsspec's memory:// filesystem.

The reference reads/writes checkpoints and datasets through blobfile so
gs:// paths work transparently (train_util.py:243-267, image_datasets.py:
76-85). utils/bf_io.py provides the same capability via fsspec; these tests
exercise listing + checkpoint save/resume on a URL-style filesystem.
"""

import io

import numpy as np
import pytest

fsspec = pytest.importorskip("fsspec")

from guided_diffusion_clip_tpu.utils import bf_io, checkpoint as ckpt


@pytest.fixture
def memfs():
    fs = fsspec.filesystem("memory")
    # memory:// is process-global: isolate each test
    try:
        fs.rm("/", recursive=True)
    except FileNotFoundError:
        pass
    yield fs
    try:
        fs.rm("/", recursive=True)
    except FileNotFoundError:
        pass


def _put_png(fs, path):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(buf, format="PNG")
    with fs.open(path, "wb") as f:
        f.write(buf.getvalue())


def test_listdir_and_recursive_listing(memfs):
    _put_png(memfs, "/data/a.png")
    _put_png(memfs, "/data/b.jpg")
    _put_png(memfs, "/data/sub/c.png")
    with memfs.open("/data/notes.txt", "wb") as f:
        f.write(b"not an image")

    assert bf_io.is_remote("memory://data") and not bf_io.is_remote("/tmp/x")
    names = bf_io.listdir("memory://data")
    assert names == ["a.png", "b.jpg", "notes.txt", "sub"]

    from guided_diffusion_clip_tpu.data.image_datasets import (
        list_image_files_recursively,
    )

    files = list_image_files_recursively("memory://data")
    assert [f.rsplit("/", 1)[-1] for f in files] == ["a.png", "b.jpg", "c.png"]


def test_dataset_reads_remote_images(memfs):
    for i in range(4):
        _put_png(memfs, f"/data/img_{i}.png")
    from guided_diffusion_clip_tpu.data.image_datasets import (
        ImageDataset,
        list_image_files_recursively,
    )

    ds = ImageDataset(
        8, list_image_files_recursively("memory://data"),
        random_flip=False, deterministic=True,
    )
    img, cond = ds[0]
    assert img.shape == (8, 8, 3) and img.dtype == np.float32


def test_checkpoint_save_resume_remote(memfs):
    tree = {"dense": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    base = "memory://ckpts"
    model_path = bf_io.join(base, ckpt.checkpoint_name("model", 5))
    ema_path = bf_io.join(base, ckpt.checkpoint_name("ema", 5, 0.9999))

    ckpt.save_flax(model_path, tree)
    ckpt.save_flax(ema_path, {"dense": {"kernel": tree["dense"]["kernel"] * 2}})

    assert bf_io.exists(model_path)
    assert ckpt.parse_resume_step_from_filename(model_path) == 5

    template = {"dense": {"kernel": np.zeros((2, 3), np.float32)}}
    loaded = ckpt.load_flax(model_path, template)
    np.testing.assert_array_equal(loaded["dense"]["kernel"], tree["dense"]["kernel"])

    # EMA lookup next to the model checkpoint (train_util.py:371-378 parity)
    found = ckpt.find_ema_checkpoint(model_path, 5, 0.9999)
    assert found == ema_path
    ema = ckpt.load_flax(found, template)
    np.testing.assert_array_equal(ema["dense"]["kernel"], tree["dense"]["kernel"] * 2)
    assert ckpt.find_ema_checkpoint(model_path, 5, 0.5) is None


def test_join_keeps_scheme():
    assert bf_io.join("gs://bucket/dir", "f.flax") == "gs://bucket/dir/f.flax"
    assert bf_io.join("gs://bucket/dir/", "a", "b") == "gs://bucket/dir/a/b"
    import os

    assert bf_io.join("/tmp/x", "y") == os.path.join("/tmp/x", "y")
