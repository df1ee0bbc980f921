"""Measure the sampling host-IO overlap win on the real chip.

Compares the two loop structures the sampling CLIs can have:
  serial:  dispatch chain k -> fetch k -> PNG/uint8/gather k -> dispatch k+1
  overlap: dispatch chain k+1 BEFORE fetching/writing k
           (utils/sample_util.overlap_device_host — what the CLIs now do)

Config mirrors the reference fast-sampling README recipe: 256px unguided
ddim25 chain, batch 16, int8 conv fast path; host work is the real CLI work
(np.asarray fetch, uint8 convert, tensor2img PNG grid to disk).

Run on the TPU:  python tools/sample_overlap_bench.py
Env: OB_BATCHES (default 4), OB_MODE (int8|bf16, default int8),
     OB_IMAGE_SIZE (default 256).
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.ops.config import int8_emit, set_conv_impl
from guided_diffusion_clip_tpu.utils.checkpoint import setup_compilation_cache
from guided_diffusion_clip_tpu.utils.sample_util import overlap_device_host
from guided_diffusion_clip_tpu.utils.saving_imgs import save_img, tensor2img
from guided_diffusion_clip_tpu.utils.script_util import (
    create_gaussian_diffusion,
    create_upstream_model,
)

T0 = time.time()


def log(msg):
    print(f"[+{time.time() - T0:.0f}s] {msg}", file=sys.stderr, flush=True)


def main():
    B = int(os.environ.get("OB_BATCHES", 4))
    mode = os.environ.get("OB_MODE", "int8")
    size = int(os.environ.get("OB_IMAGE_SIZE", 256))
    batch = 16
    set_conv_impl(mode if mode == "int8" else "xla")
    setup_compilation_cache()

    model = create_upstream_model(
        image_size=size, num_channels=256, num_res_blocks=2, channel_mult="",
        learn_sigma=True, class_cond=True, use_checkpoint=False,
        attention_resolutions="32,16,8", num_heads=4, num_head_channels=64,
        num_heads_upsample=-1, use_scale_shift_norm=True, dropout=0.0,
        resblock_updown=True, use_fp16=True, use_new_attention_order=False,
    )
    diffusion = create_gaussian_diffusion(
        steps=1000, learn_sigma=True, noise_schedule="linear",
        timestep_respacing="ddim25",
    )
    shape = (batch, size, size, 3)

    rs = np.random.RandomState(0)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), jnp.zeros(shape), jnp.zeros((batch,)),
            y=jnp.zeros((batch,), jnp.int32),
        )
    )
    params = jax.device_put(
        jax.tree_util.tree_map(
            lambda s: (rs.standard_normal(s.shape) * 0.02).astype(s.dtype), shapes
        )
    )["params"]

    @jax.jit
    def run_chain(params, key, classes):
        def model_fn(x, t, **kw):
            with int8_emit("s8"):
                return model.apply({"params": params}, x, t, **kw)

        return diffusion.ddim_sample_loop(
            model_fn, shape, key, model_kwargs={"y": classes}
        )

    classes = jnp.zeros((batch,), jnp.int32)
    out_dir = tempfile.mkdtemp(prefix="overlap_bench_")

    def write_batch(item):
        counter, sample = item
        sample_np = np.asarray(sample)  # fetch (syncs this batch)
        _u8 = ((sample_np + 1) * 127.5).clip(0, 255).astype(np.uint8)
        save_img(
            tensor2img(sample_np), os.path.join(out_dir, f"s{counter}.png")
        )

    log(f"compile+warm ({mode}, {size}px, ddim25, batch {batch})")
    t0 = time.time()
    write_batch((999, run_chain(params, jax.random.key(0), classes)))
    log(f"compile+warm done in {time.time() - t0:.0f}s")

    # host-only cost of one write (on an already-fetched batch)
    ready = np.asarray(run_chain(params, jax.random.key(1), classes))
    t0 = time.time()
    _ = ((ready + 1) * 127.5).clip(0, 255).astype(np.uint8)
    save_img(tensor2img(ready), os.path.join(out_dir, "host_only.png"))
    host_s = time.time() - t0

    def run_serial(n, seed0):
        t0 = time.time()
        for i in range(n):
            sample = run_chain(params, jax.random.key(seed0 + i), classes)
            write_batch((i, sample))
        return (time.time() - t0) / n

    def run_overlapped(n, seed0):
        def dispatched():
            for i in range(n):
                yield i, run_chain(params, jax.random.key(seed0 + i), classes)

        t0 = time.time()
        overlap_device_host(dispatched(), write_batch)
        return (time.time() - t0) / n

    results = {}
    # interleave orders to cancel relay drift
    for name, fn, seed in (
        ("serial_a", run_serial, 100), ("overlap_a", run_overlapped, 200),
        ("overlap_b", run_overlapped, 300), ("serial_b", run_serial, 400),
    ):
        results[name] = fn(B, seed)
        log(f"{name}: {results[name]:.3f} s/batch")

    serial = min(results["serial_a"], results["serial_b"])
    overlap = min(results["overlap_a"], results["overlap_b"])
    log(
        f"host-only write: {host_s:.3f}s | serial {serial:.3f} s/batch | "
        f"overlapped {overlap:.3f} s/batch | saved {serial - overlap:.3f} s/batch "
        f"({100 * (serial - overlap) / serial:.1f}%)"
    )


if __name__ == "__main__":
    main()
