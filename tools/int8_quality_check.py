"""Quantify int8-vs-bf16 output deviation at the FULL ADM-G 256px scale.

Runs the headline UNet + classifier-guidance step under both conv impls on
identical inputs and reports relative error statistics of the eps/v output
and of the guidance gradient — the quantities that drive sample quality.
(True FID parity needs the released checkpoints + ImageNet eval batches,
neither of which exists in this offline environment; this bounds the
numerical deviation the quantization introduces per step.)

Usage: python tools/int8_quality_check.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()  # JAX_PLATFORMS env alone cannot override the axon hook


import jax
import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.diffusion.guidance import classifier_cond_fn
from guided_diffusion_clip_tpu.ops.config import set_conv_impl
from guided_diffusion_clip_tpu.utils.script_util import (
    create_classifier,
    create_upstream_model,
)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    size = int(os.environ.get("QC_IMAGE_SIZE", 256))
    model = create_upstream_model(
        image_size=size, num_channels=256, num_res_blocks=2, channel_mult="",
        learn_sigma=True, class_cond=True, use_checkpoint=False,
        attention_resolutions="32,16,8", num_heads=4, num_head_channels=64,
        num_heads_upsample=-1, use_scale_shift_norm=True, dropout=0.0,
        resblock_updown=True, use_fp16=True, use_new_attention_order=False,
    )
    classifier = create_classifier(
        image_size=size, classifier_use_fp16=True, classifier_width=128,
        classifier_depth=2, classifier_attention_resolutions="32,16,8",
        classifier_use_scale_shift_norm=True, classifier_resblock_updown=True,
        classifier_pool="attention",
    )
    shape = (B, size, size, 3)

    def random_fill(shapes, seed):
        rs = np.random.RandomState(seed)
        return jax.device_put(
            jax.tree_util.tree_map(
                lambda s: (rs.standard_normal(s.shape) * 0.02).astype(s.dtype),
                shapes,
            )
        )

    params = random_fill(
        jax.eval_shape(lambda: model.init(
            jax.random.key(0), jnp.zeros(shape), jnp.zeros((B,)),
            y=jnp.zeros((B,), jnp.int32))), 0)["params"]
    cparams = random_fill(
        jax.eval_shape(lambda: classifier.init(
            jax.random.key(1), jnp.zeros(shape), jnp.zeros((B,)))), 1)["params"]

    x = jax.device_put(np.random.RandomState(2).randn(*shape).astype(np.float32))
    t = jnp.full((B,), 128.0)
    y = jnp.zeros((B,), jnp.int32)

    def make_fns():
        @jax.jit
        def fwd(p, x, t, y):
            return model.apply({"params": p}, x, t, y=y)

        @jax.jit
        def guide(cp, x, t, y):
            cond = classifier_cond_fn(
                lambda xx, tt: classifier.apply({"params": cp}, xx, tt), 1.0
            )
            return cond(x, t, y=y)

        return fwd, guide

    results = {}
    outs = {}
    for impl in ("xla", "int8"):
        set_conv_impl(impl)
        fwd, guide = make_fns()
        eps = np.asarray(fwd(params, x, t, y), np.float32)
        grad = np.asarray(guide(cparams, x, t.astype(jnp.float32), y), np.float32)
        outs[impl] = (eps, grad)

    for name, idx in (("unet_out", 0), ("guidance_grad", 1)):
        a, b = outs["xla"][idx], outs["int8"][idx]
        scale = np.abs(a).max() + 1e-12
        rel_rmse = float(np.sqrt(np.mean((a - b) ** 2)) / (a.std() + 1e-12))
        results[name] = {
            "rel_rmse_vs_signal_std": round(rel_rmse, 5),
            "max_abs_rel": round(float(np.abs(a - b).max() / scale), 5),
            "corr": round(float(np.corrcoef(a.ravel(), b.ravel())[0, 1]), 6),
        }
    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
