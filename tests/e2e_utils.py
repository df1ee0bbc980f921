"""Shared helpers for the subprocess CLI e2e tests."""

import os
import subprocess
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(name, flags, env_extra=None, timeout=1500):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.update(env_extra or {})
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", name), *flags],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{name} failed:\nSTDOUT:{proc.stdout[-3000:]}\nSTDERR:{proc.stderr[-3000:]}"
    )
    return proc


def make_image_dataset(root, n=16, size=16, seed=0):
    """PNG dir + flip-indexed CLIP dict npz, like the reference data layout."""
    img_dir = root / "imgs"
    img_dir.mkdir(exist_ok=True)
    rs = np.random.RandomState(seed)
    clip = {}
    for i in range(n):
        name = f"img_{i:03d}.png"
        arr = rs.randint(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / name)
        clip[name] = rs.randn(2, 512).astype(np.float32)  # flip-indexed
    clip_path = root / "clip_dict.npz"
    np.savez(clip_path, **clip)
    return str(img_dir), str(clip_path)
