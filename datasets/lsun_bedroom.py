"""Convert an LSUN lmdb database into a flat directory of images.

Reference behavior: datasets/lsun_bedroom.py (BOX resize to 256 on the short
side + center crop, :14-37). Requires the `lmdb` package (gated import — not
part of the baked environment).

Usage: python datasets/lsun_bedroom.py <lmdb_path> <out_dir>
"""

import argparse
import io
import os
import sys

import numpy as np
from PIL import Image


def read_images(lmdb_path, image_size=256):
    try:
        import lmdb
    except ImportError as e:
        raise SystemExit("lsun_bedroom.py requires the 'lmdb' package") from e

    env = lmdb.open(lmdb_path, map_size=1099511627776, max_readers=100, readonly=True)
    with env.begin(write=False) as transaction:
        cursor = transaction.cursor()
        for _, webp_data in cursor:
            img = Image.open(io.BytesIO(webp_data)).convert("RGB")
            width, height = img.size
            scale = image_size / min(width, height)
            img = img.resize(
                (int(round(scale * width)), int(round(scale * height))),
                resample=Image.BOX,
            )
            arr = np.array(img)
            h, w, _ = arr.shape
            h_off = (h - image_size) // 2
            w_off = (w - image_size) // 2
            yield arr[h_off : h_off + image_size, w_off : w_off + image_size]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("lmdb_path", type=str)
    parser.add_argument("out_dir", type=str)
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    for i, arr in enumerate(read_images(args.lmdb_path, args.image_size)):
        Image.fromarray(arr).save(os.path.join(args.out_dir, f"{i:07d}.png"))
        if i % 10000 == 0:
            print(f"exported {i} images", file=sys.stderr)


if __name__ == "__main__":
    main()
