"""Parity tests for the native C++ data loader (native/gdc_loader.cpp).

The loader is opt-in (load_data(native=True) / GDC_NATIVE_LOADER=1) and was
previously untested — a silently-divergent pixel path would change training
data. These tests build the .so on demand (make -C native, ~3s) and pin:

  - bit-identical output vs the PIL path when the source is already at the
    target size or a power-of-two multiple (pure BOX halving, no bicubic)
  - close agreement (<=2/255 per channel) when a fractional BICUBIC resize
    remains — the native Catmull-Rom kernel matches PIL's bicubic up to
    PIL's antialias prefilter (native_loader.py module docstring)
  - value range, dtype, flip indicator plumbing, and decode-failure errors
"""

import os

import numpy as np
import pytest
from PIL import Image

from guided_diffusion_clip_tpu.data import native_loader
from guided_diffusion_clip_tpu.data.image_datasets import ImageDataset

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader .so not buildable here"
)


def _write(tmp_path, name, size, fmt="PNG"):
    rs = np.random.RandomState(hash(name) % 2**31)
    arr = rs.randint(0, 255, (size, size, 3), dtype=np.uint8)
    p = str(tmp_path / name)
    Image.fromarray(arr).save(p, format=fmt)
    return p


def _pil_reference(path, image_size):
    ds = ImageDataset(
        image_size, [path], random_flip=False, deterministic=True, native=False
    )
    return ds[0][0]


def _native(path, image_size):
    ds = ImageDataset(
        image_size, [path], random_flip=False, deterministic=True, native=True
    )
    return ds[0][0]


def test_exact_at_target_size(tmp_path):
    p = _write(tmp_path, "exact.png", 32)
    ref, nat = _pil_reference(p, 32), _native(p, 32)
    np.testing.assert_array_equal(nat, ref)


def test_exact_power_of_two_box_chain(tmp_path):
    # 128 -> BOX halve to 64 -> BOX halve to 32: no bicubic step remains
    p = _write(tmp_path, "pow2.png", 128)
    ref, nat = _pil_reference(p, 32), _native(p, 32)
    np.testing.assert_array_equal(nat, ref)


def test_exact_on_fractional_bicubic(tmp_path):
    # 48 -> scale 32/48: antialias-stretched BICUBIC. The native resampler
    # replicates Pillow's fixed-point algorithm, so this is BIT-exact too.
    p = _write(tmp_path, "frac.png", 48)
    ref, nat = _pil_reference(p, 32), _native(p, 32)
    assert nat.shape == ref.shape == (32, 32, 3)
    assert nat.dtype == np.float32
    np.testing.assert_array_equal(nat, ref)
    assert nat.min() >= -1.0 and nat.max() <= 1.0


def test_exact_on_odd_sizes_and_upscale(tmp_path):
    # odd source (non-divisible halving bounds) and an upscale (<1x scale,
    # unstretched kernel branch) both hit different precompute_coeffs paths
    for src, tgt in ((37, 16), (97, 32), (24, 32)):
        p = _write(tmp_path, f"odd_{src}_{tgt}.png", src)
        np.testing.assert_array_equal(
            _native(p, tgt), _pil_reference(p, tgt), err_msg=f"{src}->{tgt}"
        )


def test_jpeg_decode(tmp_path):
    # PIL and the native loader link the same system libjpeg here, so the
    # full decode+resize chain is bit-exact for JPEG sources as well
    p = _write(tmp_path, "photo.jpg", 64, fmt="JPEG")
    ref, nat = _pil_reference(p, 32), _native(p, 32)
    np.testing.assert_array_equal(nat, ref)


def test_flip_indicator_and_determinism(tmp_path):
    p = _write(tmp_path, "flip.png", 32)
    batch, flipped = native_loader.process_batch(
        [p] * 8, 32, random_flip=True, seeds=list(range(1, 9))
    )
    assert batch.shape == (8, 32, 32, 3) and flipped.shape == (8,)
    # same seeds -> same flips and pixels
    batch2, flipped2 = native_loader.process_batch(
        [p] * 8, 32, random_flip=True, seeds=list(range(1, 9))
    )
    np.testing.assert_array_equal(flipped, flipped2)
    np.testing.assert_array_equal(batch, batch2)
    ref = _pil_reference(p, 32)
    for i in range(8):
        expect = ref[:, ::-1] if flipped[i] else ref
        np.testing.assert_array_equal(batch[i], expect)


def test_decode_failure_raises(tmp_path):
    bad = str(tmp_path / "corrupt.png")
    with open(bad, "wb") as f:
        f.write(b"not an image at all")
    with pytest.raises(IOError):
        native_loader.process_batch([bad], 32, random_flip=False)
