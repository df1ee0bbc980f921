"""Export an LSUN lmdb database to a flat directory of PNG crops.

Matches the reference prep semantics (datasets/lsun_bedroom.py:14-37): BOX
resample so the short side equals ``--image-size``, then center crop. The
``lmdb`` package is not part of the baked environment, so its import is
deferred and failure is a clean exit.

Usage: python datasets/lsun_bedroom.py <lmdb_path> <out_dir>
"""

from __future__ import annotations

import argparse
import io
import sys
from pathlib import Path

import numpy as np
from PIL import Image


def _short_side_resize(img: Image.Image, side: int) -> Image.Image:
    w, h = img.size
    factor = side / min(w, h)
    return img.resize(
        (int(round(w * factor)), int(round(h * factor))), resample=Image.BOX
    )


def _center_crop(arr: np.ndarray, side: int) -> np.ndarray:
    dy = (arr.shape[0] - side) // 2
    dx = (arr.shape[1] - side) // 2
    return arr[dy : dy + side, dx : dx + side]


def iter_lmdb_crops(lmdb_path: str, side: int = 256):
    """Yield center-cropped RGB arrays from every record in the database."""
    try:
        import lmdb
    except ImportError as e:
        raise SystemExit("lsun_bedroom.py requires the 'lmdb' package") from e

    db = lmdb.open(
        lmdb_path, map_size=1 << 40, max_readers=100, readonly=True
    )
    try:
        with db.begin(write=False) as txn:
            for _, blob in txn.cursor():
                img = Image.open(io.BytesIO(blob)).convert("RGB")
                yield _center_crop(
                    np.asarray(_short_side_resize(img, side)), side
                )
    finally:
        db.close()


def export(lmdb_path: str, out_dir: str, side: int, log_every: int = 10000) -> int:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    count = 0
    for i, crop in enumerate(iter_lmdb_crops(lmdb_path, side)):
        Image.fromarray(crop).save(out / f"{i:07d}.png")
        count = i + 1
        if i % log_every == 0:
            print(f"exported {i} images", file=sys.stderr)
    return count


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("lmdb_path")
    parser.add_argument("out_dir")
    ns = parser.parse_args(argv)
    export(ns.lmdb_path, ns.out_dir, ns.image_size)


if __name__ == "__main__":
    main()
