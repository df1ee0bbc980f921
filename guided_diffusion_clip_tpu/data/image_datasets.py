"""Image data pipeline with CLIP-embedding pairing.

Reference behavior: guided_diffusion/image_datasets.py. TPU-native shape: a
host-side numpy pipeline (JAX wants host batches it can shard onto the mesh;
no torch DataLoader), sharded across processes by `jax.process_index()`
instead of MPI rank (files[rank::world], image_datasets.py:103), with a
background prefetch thread standing in for the DataLoader worker.

Semantics preserved:
  - recursive file listing over {jpg,jpeg,png,gif}, sorted (:76-85)
  - BOX-halving-then-BICUBIC resize chain for center/random crop (:167-208)
  - scale to [-1, 1] (:154)
  - random flip with *flip-indexed* CLIP lookup: the precomputed dict stores
    one embedding per flip variant, selected by [int(flipped)] (:159-162);
    the 'caleba' key-format special case keeps a single embedding (:159)
  - img2/clip_feat2 pairing: 15% identity / 85% random partner when
    stochastic; deterministic mode pairs idx with idx-1 for idx>=4 (:117-137)
  - class-from-filename-prefix is disabled upstream (`and False`, :47) — we
    expose it behind `class_cond_from_filenames` instead of dead code.

Images are NHWC here (the reference transposes to CHW at :163 for torch).
"""

from __future__ import annotations

import math
import os
import queue
import random
import threading
from typing import Iterator

import numpy as np
from PIL import Image

import jax


def load_data(
    *,
    data_dir: str,
    batch_size: int,
    image_size: int,
    class_cond: bool = False,
    deterministic: bool = False,
    random_crop: bool = False,
    random_flip: bool = True,
    clip_file_path: str | None = None,
    class_cond_from_filenames: bool = False,
    seed: int = 0,
    prefetch: int = 2,
    native: bool | None = None,
) -> Iterator:
    """Infinite generator over (images NHWC f32 in [-1,1], cond dict) batches."""
    if not data_dir:
        raise ValueError("unspecified data directory")
    all_files = list_image_files_recursively(data_dir)
    classes = None
    if class_cond and class_cond_from_filenames:
        class_names = [os.path.basename(p).split("_")[0] for p in all_files]
        sorted_classes = {x: i for i, x in enumerate(sorted(set(class_names)))}
        classes = [sorted_classes[x] for x in class_names]
    dataset = ImageDataset(
        image_size,
        all_files,
        classes=classes,
        shard=jax.process_index(),
        num_shards=jax.process_count(),
        random_crop=random_crop,
        random_flip=random_flip,
        clip_file_path=clip_file_path,
        deterministic=deterministic,
        seed=seed,
        native=native,
    )
    return _batched_iterator(dataset, batch_size, deterministic, prefetch)


def _batched_iterator(dataset, batch_size, deterministic, prefetch):
    def gen():
        order_rng = random.Random(1234 + jax.process_index())
        while True:
            order = list(range(len(dataset)))
            if not deterministic:
                order_rng.shuffle(order)
            for start in range(0, len(order) - batch_size + 1, batch_size):
                idxs = order[start : start + batch_size]
                imgs, conds = zip(*(dataset[i] for i in idxs))
                batch = np.stack(imgs)
                cond = {k: np.stack([c[k] for c in conds]) for k in conds[0]}
                yield batch, cond

    if prefetch <= 0:
        yield from gen()
        return

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = object()

    def worker():
        try:
            for item in gen():
                q.put(item)
        except BaseException as e:  # surface loader errors to the consumer
            q.put(e)
        q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def list_image_files_recursively(data_dir: str) -> list[str]:
    """Recursive listing; gs:// etc. route through fsspec (bf.listdir parity,
    reference image_datasets.py:76-85)."""
    from ..utils import bf_io

    results = []
    for entry in bf_io.listdir(data_dir):
        full_path = bf_io.join(data_dir, entry)
        ext = entry.split(".")[-1]
        if "." in entry and ext.lower() in ["jpg", "jpeg", "png", "gif"]:
            results.append(full_path)
        elif bf_io.isdir(full_path):
            results.extend(list_image_files_recursively(full_path))
    return results


def _load_clip_dict(path: str):
    """Load the precomputed {filename: embedding(s)} dict (.pt via torch, or .npz)."""
    from ..utils import bf_io

    if path.endswith(".npz"):
        with bf_io.open_file(path, "rb") as f:
            data = np.load(f)
            return {k: data[k] for k in data.files}
    import torch

    with bf_io.open_file(path, "rb") as f:
        data = torch.load(f, map_location="cpu", weights_only=False)
    return {k: np.asarray(v) for k, v in data.items()}


class ImageDataset:
    def __init__(
        self,
        resolution: int,
        image_paths: list[str],
        classes=None,
        shard: int = 0,
        num_shards: int = 1,
        random_crop: bool = False,
        random_flip: bool = True,
        clip_file_path: str | None = None,
        deterministic: bool = False,
        seed: int = 0,
        native: bool | None = None,
    ):
        self.resolution = resolution
        self.local_images = image_paths[shard:][::num_shards]
        self.local_classes = None if classes is None else classes[shard:][::num_shards]
        self.random_crop = random_crop
        self.random_flip = random_flip
        self.clip_file_path = clip_file_path
        self.clip_data = _load_clip_dict(clip_file_path) if clip_file_path else None
        self.deterministic = deterministic
        self.rng = random.Random(seed + shard)
        # native C++ decode/resize path (native/gdc_loader.cpp): opt-in via
        # arg or GDC_NATIVE_LOADER=1; falls back silently if the .so is absent
        if native is None:
            native = os.environ.get("GDC_NATIVE_LOADER", "") == "1"
        self.native = False
        if native:
            from . import native_loader

            self.native = native_loader.available()

    def __len__(self):
        return len(self.local_images)

    def __getitem__(self, idx: int):
        img, out_dict = self.get_sample(idx)
        if self.clip_data is None:
            return img, out_dict
        # img2/clip_feat2 pairing (image_datasets.py:117-137)
        if not self.deterministic:
            if self.rng.random() < 0.15:
                idx2_data = img, out_dict
            else:
                idx2 = self.rng.randint(0, len(self) - 1)
                idx2_data = self.get_sample(idx2)
        else:
            idx2_data = (img, out_dict) if idx < 4 else self.get_sample(idx - 1)
        img2, out_dict2 = idx2_data
        out_dict = dict(out_dict)
        out_dict["img2"] = img2
        out_dict["clip_feat2"] = out_dict2["clip_feat"]
        return img, out_dict

    def get_sample(self, idx: int):
        path = self.local_images[idx]
        if self.native:
            return self._get_sample_native(idx, path)
        from ..utils import bf_io

        with bf_io.open_file(path, "rb") as f:
            pil_image = Image.open(f)
            pil_image.load()
        pil_image = pil_image.convert("RGB")

        if self.random_crop:
            arr = random_crop_arr(pil_image, self.resolution, rng=self.rng)
        else:
            arr = center_crop_arr(pil_image, self.resolution)
        img_flipped = self.random_flip and (not self.deterministic) and self.rng.random() < 0.5
        if img_flipped:
            arr = arr[:, ::-1]

        arr = arr.astype(np.float32) / 127.5 - 1

        out_dict = {}
        if self.local_classes is not None:
            out_dict["y"] = np.array(self.local_classes[idx], dtype=np.int32)
        if self.clip_data is not None:
            key = os.path.basename(path)
            if "caleba" in (self.clip_file_path or ""):
                out_dict["clip_feat"] = np.asarray(self.clip_data[key], dtype=np.float32).reshape(-1)
            else:
                out_dict["clip_feat"] = np.asarray(
                    self.clip_data[key][int(img_flipped)], dtype=np.float32
                ).reshape(-1)
        return np.ascontiguousarray(arr), out_dict


def _native_get_sample(ds, idx, path):
    from . import native_loader

    do_flip = ds.random_flip and not ds.deterministic
    seed = ds.rng.getrandbits(63) or 1
    batch, flipped = native_loader.process_batch(
        [path], ds.resolution, random_crop=ds.random_crop,
        random_flip=do_flip, seeds=[seed], num_threads=1,
    )
    arr = batch[0]
    img_flipped = bool(flipped[0])
    out_dict = {}
    if ds.local_classes is not None:
        out_dict["y"] = np.array(ds.local_classes[idx], dtype=np.int32)
    if ds.clip_data is not None:
        key = os.path.basename(path)
        if "caleba" in (ds.clip_file_path or ""):
            out_dict["clip_feat"] = np.asarray(ds.clip_data[key], dtype=np.float32).reshape(-1)
        else:
            out_dict["clip_feat"] = np.asarray(
                ds.clip_data[key][int(img_flipped)], dtype=np.float32
            ).reshape(-1)
    return arr, out_dict


ImageDataset._get_sample_native = _native_get_sample


def center_crop_arr(pil_image: Image.Image, image_size: int) -> np.ndarray:
    """BOX-halve to <2x target, then BICUBIC, then center crop (:167-184)."""
    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    crop_y = (arr.shape[0] - image_size) // 2
    crop_x = (arr.shape[1] - image_size) // 2
    return arr[crop_y : crop_y + image_size, crop_x : crop_x + image_size]


def random_crop_arr(
    pil_image: Image.Image,
    image_size: int,
    min_crop_frac: float = 0.8,
    max_crop_frac: float = 1.0,
    rng: random.Random | None = None,
) -> np.ndarray:
    """Random-scale BOX+BICUBIC resize then random crop (:187-208)."""
    rng = rng or random
    min_smaller_dim_size = math.ceil(image_size / max_crop_frac)
    max_smaller_dim_size = math.ceil(image_size / min_crop_frac)
    smaller_dim_size = rng.randrange(min_smaller_dim_size, max_smaller_dim_size + 1)

    while min(*pil_image.size) >= 2 * smaller_dim_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = smaller_dim_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    crop_y = rng.randrange(arr.shape[0] - image_size + 1)
    crop_x = rng.randrange(arr.shape[1] - image_size + 1)
    return arr[crop_y : crop_y + image_size, crop_x : crop_x + image_size]
