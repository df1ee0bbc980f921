"""End-to-end learning check: loss decreases on a trivially learnable dataset."""

import numpy as np
import pytest

from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel
from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion


@pytest.mark.slow
def test_loss_decreases(tmp_path):
    logger.configure_dir(dir=str(tmp_path), format_strs=[])
    cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
        num_heads=1, use_scale_shift_norm=True,
    )
    model = UNetModel(config=cfg)
    diffusion = create_gaussian_diffusion(steps=10, noise_schedule="cosine")

    def data_gen():
        # constant mid-gray images: eps-prediction is easy to learn
        while True:
            yield np.zeros((8, 8, 8, 3), np.float32), {}

    loop = TrainLoop(
        model=model, diffusion=diffusion, data=data_gen(), batch_size=8,
        microbatch=-1, lr=3e-3, ema_rate="0.99", log_interval=10**9,
        save_interval=10**9, seed=0,
    )
    losses = []
    for _ in range(30):
        b, c = next(loop.data)
        t_np, w_np = loop.schedule_sampler.sample(loop.batch_size, loop.np_rng)
        import jax, jax.numpy as jnp
        from guided_diffusion_clip_tpu.parallel.mesh import shard_batch

        loop.rng, step_rng = jax.random.split(loop.rng)
        batch = shard_batch(loop.mesh, jnp.asarray(b))
        cond = {}
        t = shard_batch(loop.mesh, jnp.asarray(t_np))
        w = shard_batch(loop.mesh, jnp.asarray(w_np))
        loop.params, loop.opt_state, ema, metrics = loop._train_step(
            loop.params, loop.opt_state, tuple(loop.ema_params), batch, cond, t, w, step_rng
        )
        loop.ema_params = list(ema)
        losses.append(float(metrics["loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.7, f"loss did not decrease: {first:.4f} -> {last:.4f}"


@pytest.mark.slow
def test_loss_decreases_int8_forward(tmp_path):
    """Quantized training forward (--train_conv_impl int8): s8 convs in the
    loss pass, straight-through bf16 backward (ops/quant.py VJPs produce
    real dW/db). The model must still LEARN — loss decreases comparably to
    the bf16 run (QAT-style gradient noise is acceptable; divergence or
    NaNs are not)."""
    import jax
    import jax.numpy as jnp

    from guided_diffusion_clip_tpu.ops.config import set_conv_impl
    from guided_diffusion_clip_tpu.parallel.mesh import shard_batch

    logger.configure_dir(dir=str(tmp_path), format_strs=[])
    cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
        num_heads=1, use_scale_shift_norm=True,
    )
    model = UNetModel(config=cfg)
    diffusion = create_gaussian_diffusion(steps=10, noise_schedule="cosine")

    def data_gen():
        while True:
            yield np.zeros((8, 8, 8, 3), np.float32), {}

    set_conv_impl("int8")  # read at trace time by the conv layers
    try:
        loop = TrainLoop(
            model=model, diffusion=diffusion, data=data_gen(), batch_size=8,
            microbatch=-1, lr=3e-3, ema_rate="0.99", log_interval=10**9,
            save_interval=10**9, seed=0,
        )
        losses = []
        for _ in range(30):
            b, c = next(loop.data)
            t_np, w_np = loop.schedule_sampler.sample(loop.batch_size, loop.np_rng)
            loop.rng, step_rng = jax.random.split(loop.rng)
            batch = shard_batch(loop.mesh, jnp.asarray(b))
            t = shard_batch(loop.mesh, jnp.asarray(t_np))
            w = shard_batch(loop.mesh, jnp.asarray(w_np))
            loop.params, loop.opt_state, ema, metrics = loop._train_step(
                loop.params, loop.opt_state, tuple(loop.ema_params),
                batch, {}, t, w, step_rng,
            )
            loop.ema_params = list(ema)
            losses.append(float(metrics["loss"]))
    finally:
        set_conv_impl("auto")
    assert np.isfinite(losses).all(), losses[-5:]
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first * 0.8, (
        f"int8-fwd training failed to learn: {first:.4f} -> {last:.4f}"
    )


def test_min_snr_loss_weighting_table():
    """min_snr_G table: min(SNR,G)/SNR per original timestep — 1.0 where
    SNR <= G (high noise), G/SNR where SNR > G (low noise)."""
    logger.configure_dir(dir="/tmp/minsnr_test", format_strs=[])
    cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
        num_heads=1, use_scale_shift_norm=True,
    )
    model = UNetModel(config=cfg)
    diffusion = create_gaussian_diffusion(steps=50, noise_schedule="cosine")

    def data_gen():
        while True:
            yield np.zeros((4, 8, 8, 3), np.float32), {}

    loop = TrainLoop(
        model=model, diffusion=diffusion, data=data_gen(), batch_size=4,
        microbatch=-1, lr=1e-3, ema_rate="0.99", log_interval=10**9,
        save_interval=10**9, seed=0, loss_weighting="min_snr_5",
    )
    tbl = loop._loss_weight_table
    ab = np.asarray(diffusion.sched.alphas_cumprod, np.float64)
    snr = ab / (1 - ab)
    np.testing.assert_allclose(tbl, np.minimum(snr, 5.0) / snr, rtol=1e-6)
    assert (tbl <= 1.0 + 1e-6).all() and tbl.min() < 0.1  # low-noise steps damped
    # high-noise (low SNR) steps keep full weight
    assert abs(tbl[-1] - 1.0) < 1e-6

    import pytest as _pytest

    with _pytest.raises(ValueError):
        TrainLoop(
            model=model, diffusion=diffusion, data=data_gen(), batch_size=4,
            microbatch=-1, lr=1e-3, ema_rate="0.99", log_interval=10**9,
            save_interval=10**9, seed=0, loss_weighting="bogus",
        )
