"""Long-horizon optimizer-impl sanity: tree vs flat vs zero1 loss curves.

tests/test_opt_flat.py pins exact (2-step) equivalence; beyond that Adam's
sign-like normalization on zero-init leaves chaotically amplifies ULP-level
fusion-order noise, so longer horizons cannot be compared bitwise
(ROUND_NOTES r3). What CAN be checked — and what this tool does — is that
the three implementations produce STATISTICALLY indistinguishable training
trajectories over hundreds of steps (VERDICT r3 item 7): same data, same
seeds, same timestep draws; a drift-class bug (wrong bias correction, a
missed weight-decay term, state aliasing) would separate the curves far
beyond the float-noise envelope.

Criteria printed per pair (tree vs flat, tree vs zero1):
  - mean |delta loss| over the final third of training, relative to the
    tree curve's own step-to-step noise (sd of first differences) — float
    scheduling noise keeps this << 1; drift bugs push it >> 1,
  - final-third mean losses and their difference in units of the sem.

Run on CPU (deterministic, fast at the toy size) or on-chip.
Env: OLH_STEPS (300), OLH_IMAGE (16), OLH_BATCH (16), OLH_IMPLS
("tree,flat,zero1").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import numpy as np

from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel
from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion
from tools.int8_chain_quality import make_blob_batch


def run_impl(impl: str, steps: int, size: int, B: int) -> np.ndarray:
    logger.configure_dir(dir=f"/tmp/olh_{impl}", format_strs=[])
    cfg = UNetConfig(
        image_size=size, in_channels=3, model_channels=64, out_channels=3,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, use_scale_shift_norm=True,
    )
    model = UNetModel(config=cfg)
    diffusion = create_gaussian_diffusion(steps=100, noise_schedule="cosine")
    rs = np.random.RandomState(0)

    def gen():
        while True:
            yield make_blob_batch(rs, B, size), {}

    loop = TrainLoop(
        model=model, diffusion=diffusion, data=gen(), batch_size=B,
        microbatch=-1, lr=2e-3, ema_rate="0.99", log_interval=10**9,
        save_interval=10**9, seed=0, opt_impl=impl, weight_decay=0.01,
    )
    losses = []
    for i in range(steps):
        b, c = next(loop.data)
        loop.run_step(b, c)
        loop.step += 1
        # read the deferred metrics directly (flush_metrics logs, doesn't return)
        pending = getattr(loop, "_pending_log", None)
        losses.append(float(jax.device_get(pending[2]["loss"])) if pending else np.nan)
        loop.flush_metrics()
    return np.asarray(losses)


def main():
    t0 = time.time()
    steps = int(os.environ.get("OLH_STEPS", 300))
    size = int(os.environ.get("OLH_IMAGE", 16))
    B = int(os.environ.get("OLH_BATCH", 16))
    impls = os.environ.get("OLH_IMPLS", "tree,flat,zero1").split(",")

    curves = {}
    for impl in impls:
        print(f"[olh +{time.time()-t0:.0f}s] running {impl}", file=sys.stderr, flush=True)
        curves[impl] = run_impl(impl, steps, size, B)

    tail = slice(steps - steps // 3, steps)
    base = curves[impls[0]]
    base_noise = float(np.diff(base[tail]).std())
    base_tail = base[tail]
    result = {
        "config": f"{size}px ch64, {steps} steps, batch {B}, lr 2e-3 wd 0.01",
        "impls": impls,
        f"{impls[0]}_final_third_loss_mean": round(float(base_tail.mean()), 6),
        f"{impls[0]}_step_noise_sd": round(base_noise, 6),
    }
    for impl in impls[1:]:
        c = curves[impl]
        delta_tail = np.abs(c[tail] - base_tail)
        sem = base_tail.std() / np.sqrt(base_tail.size)
        result.update({
            f"{impl}_final_third_loss_mean": round(float(c[tail].mean()), 6),
            f"{impl}_mean_abs_delta_vs_{impls[0]}": round(float(delta_tail.mean()), 6),
            f"{impl}_delta_over_step_noise": round(float(delta_tail.mean() / (base_noise + 1e-12)), 3),
            f"{impl}_mean_diff_in_sems": round(
                float(abs(c[tail].mean() - base_tail.mean()) / (sem + 1e-12)), 3
            ),
        })
    print(json.dumps(result))


if __name__ == "__main__":
    main()
