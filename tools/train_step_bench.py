"""Measure jitted training-step throughput on the attached TPU chip.

Times TrainLoop's donated-buffer train step (scan grad-accum + EMA) on the
reference README 64px ADM config with synthetic data — the single-chip
data point behind the v5e-16 training-config claim in BASELINE.md.

Usage: python tools/train_step_bench.py
Env: TSB_BATCH (32), TSB_MICRO (16), TSB_IMAGE_SIZE (64), TSB_REPEATS (5),
TSB_CONFIG (readme64 | fork128), TSB_CONV_IMPL (xla | int8 — the
--train_conv_impl quantized-forward path), TSB_OPT_IMPL (tree | flat — the
--opt_impl single-buffer fused AdamW+EMA path). fork128 = the fork's ACTUAL training
recipe (reference config.yaml:28-32: 128px FFHQ, ch64, 2 res blocks,
1 head, batch 48, CLIP-embedding conditioning via the clip_feat MLP) —
the configuration the 128px training claim must be measured at.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()  # JAX_PLATFORMS env alone cannot override the axon hook


import jax
import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
from guided_diffusion_clip_tpu.utils.script_util import (
    create_gaussian_diffusion,
    create_upstream_model,
)


def main():
    config = os.environ.get("TSB_CONFIG", "readme64")
    conv_impl = os.environ.get("TSB_CONV_IMPL", "xla")
    if conv_impl != "xla":
        # mirrors image_train.py's --train_conv_impl: int8 = quantized
        # loss-pass convs with straight-through bf16 backward
        from guided_diffusion_clip_tpu.ops.config import set_conv_impl

        set_conv_impl(conv_impl)
    B = int(os.environ.get("TSB_BATCH", 48 if config == "fork128" else 32))
    micro = int(os.environ.get("TSB_MICRO", 16))
    size = int(os.environ.get("TSB_IMAGE_SIZE", 128 if config == "fork128" else 64))
    repeats = int(os.environ.get("TSB_REPEATS", 5))

    if config == "fork128":
        # the fork's actual recipe (reference config.yaml:28-32): 128px FFHQ,
        # CLIP-embedding conditioning through the clip_feat MLP label-emb
        from guided_diffusion_clip_tpu.utils.script_util import create_model

        model = create_model(
            image_size=size, num_channels=64, num_res_blocks=2,
            learn_sigma=True, class_cond=True, use_checkpoint=False,
            attention_resolutions="16,8", num_heads=1, num_head_channels=-1,
            num_heads_upsample=-1, use_scale_shift_norm=True,
            dropout=float(os.environ.get("TSB_DROPOUT", 0.0)),
            use_fp16=True,
        )
        cond_key, cond_fill = "clip_feat", lambda rs: rs.randn(B, 512).astype(np.float32)
    else:
        # README 64px training config (reference README.md:151-156)
        model = create_upstream_model(
            image_size=size, num_channels=192, num_res_blocks=3, channel_mult="",
            learn_sigma=True, class_cond=True, use_checkpoint=False,
            attention_resolutions="32,16,8", num_heads=4, num_head_channels=64,
            num_heads_upsample=-1, use_scale_shift_norm=True, dropout=float(os.environ.get("TSB_DROPOUT", 0.1)),
            resblock_updown=True, use_fp16=True, use_new_attention_order=True,
        )
        cond_key, cond_fill = "y", lambda rs: rs.randint(0, 1000, (B,)).astype(np.int64)
    diffusion = create_gaussian_diffusion(
        steps=1000, learn_sigma=True, noise_schedule="cosine",
    )

    shape = (B, size, size, 3)
    rs = np.random.RandomState(0)

    def data_iter():
        while True:
            x = rs.randn(*shape).astype(np.float32)
            yield x, {cond_key: cond_fill(rs)}

    init_params = jax.device_put(
        jax.tree_util.tree_map(
            lambda s: (np.random.RandomState(1).standard_normal(s.shape) * 0.02).astype(s.dtype),
            jax.eval_shape(
                lambda: model.init(
                    jax.random.key(0), jnp.zeros(shape), jnp.zeros((B,)),
                    **(
                        {"clip_feat": jnp.zeros((B, 512))}
                        if cond_key == "clip_feat"
                        else {"y": jnp.zeros((B,), jnp.int32)}
                    ),
                )
            ),
        )
    )["params"]

    opt_impl = os.environ.get("TSB_OPT_IMPL", "tree")
    loop = TrainLoop(
        model=model, diffusion=diffusion, data=data_iter(), batch_size=B,
        microbatch=micro, lr=1e-4, ema_rate=0.9999, log_interval=10**9,
        save_interval=10**9, init_params=init_params, opt_impl=opt_impl,
    )

    batch, cond = next(loop.data)
    t0 = time.time()
    loop.run_step(batch, cond)
    loop.flush_metrics()
    compile_s = time.time() - t0

    # Sustained rate over a window of steps: run_step defers the metrics
    # fetch one step (train_loop.py), so per-call wall time is just dispatch;
    # the honest number is N steps end-to-end with a final flush + sync.
    window = int(os.environ.get("TSB_WINDOW", 10))
    times = []
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(window):
            batch, cond = next(loop.data)
            loop.run_step(batch, cond)
            loop.step += 1
        loop.flush_metrics()
        jax.block_until_ready(jax.tree_util.tree_leaves(loop.params)[0])
        times.append((time.time() - t0) / window)
    best = min(times)
    import json

    desc = (
        f"{size}px fork recipe (ch64, clip_feat cond)"
        if config == "fork128"
        else f"{size}px ADM 192ch"
    )
    if conv_impl != "xla":
        desc += f" [conv_impl={conv_impl}]"
    if opt_impl != "tree":
        desc += f" [opt_impl={opt_impl}]"
    print(json.dumps({
        "config": f"{desc} train step, batch {B} (micro {micro}), bf16",
        "ms_per_step": round(best * 1000, 1),
        "samples_per_sec_per_chip": round(B / best, 2),
        "compile_sec": round(compile_s, 1),
        "window_steps": window,
    }))


if __name__ == "__main__":
    main()
