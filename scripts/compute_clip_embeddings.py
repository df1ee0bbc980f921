"""Precompute the per-image CLIP embedding dict the datasets consume.

The reference assumes externally prepared `*_ViT-B32_dict.pt` files keyed by
filename with one embedding per flip variant (image_datasets.py:111, 159-162)
but ships no tool to build them. This computes them natively with the JAX
CLIP encoder (both flip variants per image, matching the flip-indexed lookup),
writing .npz (native) or .pt (torch interop).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from guided_diffusion_clip_tpu.data.image_datasets import (
    center_crop_arr,
    list_image_files_recursively,
)
from guided_diffusion_clip_tpu.models.clip_vit import (
    CLIPConfig,
    CLIPVisionEncoder,
    preprocess_for_clip,
)
from guided_diffusion_clip_tpu.utils.checkpoint import setup_compilation_cache


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--out", required=True, help=".npz or .pt output path")
    parser.add_argument("--clip_model_path", required=True)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--batch_size", type=int, default=64)
    args = parser.parse_args()

    setup_compilation_cache()

    from scripts.clip_guided_sample import load_clip_vision_params  # noqa

    cfg = CLIPConfig()
    enc = CLIPVisionEncoder(cfg)
    vparams = load_clip_vision_params(args.clip_model_path, cfg)

    @jax.jit
    def embed(vp, pixels):
        return enc.apply({"params": vp}, pixels)

    files = list_image_files_recursively(args.data_dir)
    result = {}
    batch, names = [], []

    def flush():
        if not batch:
            return
        x = jnp.asarray(np.stack(batch))
        e = np.asarray(embed(vparams, preprocess_for_clip(x, cfg.image_size)))
        # pairs: [unflipped, flipped] per image (flip-indexed lookup parity)
        for i, name in enumerate(names):
            result[name] = e[2 * i : 2 * i + 2]
        batch.clear()
        names.clear()

    for path in files:
        img = Image.open(path).convert("RGB")
        arr = center_crop_arr(img, args.image_size).astype(np.float32) / 127.5 - 1.0
        batch.append(arr)
        batch.append(arr[:, ::-1].copy())
        names.append(os.path.basename(path))
        if len(names) >= args.batch_size:
            flush()
    flush()

    if args.out.endswith(".pt"):
        import torch

        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in result.items()}, args.out)
    else:
        np.savez(args.out, **result)
    print(f"wrote {len(result)} embeddings to {args.out}")


if __name__ == "__main__":
    main()
