"""Data pipeline parity: crops vs the reference, CLIP pairing semantics."""

import numpy as np
import pytest
from PIL import Image

from guided_diffusion_clip_tpu.data.image_datasets import (
    ImageDataset,
    center_crop_arr,
    list_image_files_recursively,
    load_data,
    random_crop_arr,
)
from reference_oracle import has_reference


def make_image(w=300, h=220, seed=0):
    rs = np.random.RandomState(seed)
    return Image.fromarray(rs.randint(0, 255, (h, w, 3), dtype=np.uint8))


class TestCrops:
    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_center_crop_matches_reference(self):
        import sys
        import types

        # the reference module imports blobfile/mpi4py at module level; stub
        # them (the crop functions don't use either)
        for mod in ("blobfile", "mpi4py"):
            if mod not in sys.modules:
                stub = types.ModuleType(mod)
                if mod == "mpi4py":
                    stub.MPI = types.SimpleNamespace(
                        COMM_WORLD=types.SimpleNamespace(
                            Get_rank=lambda: 0, Get_size=lambda: 1
                        )
                    )
                sys.modules[mod] = stub
        sys.path.insert(0, "/root/reference")
        from guided_diffusion.image_datasets import center_crop_arr as ref_crop

        for size, w, h in [(64, 300, 220), (128, 128, 128), (64, 500, 130)]:
            img = make_image(w, h)
            np.testing.assert_array_equal(
                center_crop_arr(img, size), ref_crop(img, size)
            )

    def test_random_crop_shape_and_range(self):
        import random

        arr = random_crop_arr(make_image(), 64, rng=random.Random(0))
        assert arr.shape == (64, 64, 3)


@pytest.fixture
def dataset_dir(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rs = np.random.RandomState(0)
    clip = {}
    for i in range(8):
        name = f"img_{i:02d}.png"
        Image.fromarray(rs.randint(0, 255, (16, 16, 3), dtype=np.uint8)).save(d / name)
        clip[name] = rs.randn(2, 512).astype(np.float32)
    clip_path = tmp_path / "clip.npz"
    np.savez(clip_path, **clip)
    return str(d), str(clip_path)


class TestClipPairing:
    def test_deterministic_img2_pairing(self, dataset_dir):
        """idx<4 pairs with itself; idx>=4 pairs with idx-1 (image_datasets.py:129-131)."""
        d, clip_path = dataset_dir
        files = list_image_files_recursively(d)
        ds = ImageDataset(16, files, clip_file_path=clip_path, deterministic=True)
        img2_of_2, cond2 = ds[2][0], ds[2][1]
        np.testing.assert_array_equal(cond2["img2"], ds[2][0])
        np.testing.assert_array_equal(cond2["clip_feat2"], cond2["clip_feat"])
        img5, cond5 = ds[5]
        img4, cond4 = ds.get_sample(4)
        np.testing.assert_array_equal(cond5["img2"], img4)
        np.testing.assert_array_equal(cond5["clip_feat2"], cond4["clip_feat"])

    def test_flip_indexed_lookup(self, dataset_dir):
        """non-deterministic mode may flip; the embedding follows the flip index."""
        d, clip_path = dataset_dir
        files = list_image_files_recursively(d)
        clip = dict(np.load(clip_path).items())
        ds = ImageDataset(16, files, clip_file_path=clip_path, deterministic=False, seed=3)
        seen_flipped = seen_unflipped = False
        for _ in range(20):
            img, cond = ds.get_sample(0)
            key = "img_00.png"
            if np.allclose(cond["clip_feat"], clip[key][0]):
                seen_unflipped = True
            elif np.allclose(cond["clip_feat"], clip[key][1]):
                seen_flipped = True
        assert seen_flipped and seen_unflipped

    def test_batches_shapes_and_range(self, dataset_dir):
        d, clip_path = dataset_dir
        it = load_data(
            data_dir=d, batch_size=4, image_size=16, deterministic=True,
            clip_file_path=clip_path, prefetch=0,
        )
        batch, cond = next(it)
        assert batch.shape == (4, 16, 16, 3)
        assert batch.min() >= -1.0 and batch.max() <= 1.0
        assert cond["clip_feat"].shape == (4, 512)
        assert cond["img2"].shape == (4, 16, 16, 3)

    def test_no_clip_dict_mode(self, dataset_dir):
        d, _ = dataset_dir
        it = load_data(data_dir=d, batch_size=2, image_size=16, prefetch=0)
        batch, cond = next(it)
        assert cond == {}
