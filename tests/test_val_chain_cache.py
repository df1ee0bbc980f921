"""val_sample must reuse its jitted sampling chain across save intervals
(round-1 weakness: jax.jit was rebuilt per call, recompiling every time)."""

import numpy as np
import pytest

from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel
from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion


def test_val_sample_compiles_once(tmp_path):
    logger.configure_dir(dir=str(tmp_path), format_strs=[])
    cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
        num_classes=None, num_heads=2,
    )
    model = UNetModel(config=cfg)
    diffusion = create_gaussian_diffusion(
        steps=4, noise_schedule="cosine", learn_sigma=False
    )
    batch_size = 4

    def gen():
        rs = np.random.RandomState(0)
        while True:
            yield rs.uniform(-1, 1, (batch_size, 8, 8, 3)).astype(np.float32), {}

    loop = TrainLoop(
        model=model, diffusion=diffusion, data=gen(), batch_size=batch_size,
        microbatch=batch_size, lr=1e-4, ema_rate="0.9999", log_interval=10,
        save_interval=10**9, val_datasets=[gen()], val_batch_size=2,
    )

    loop.val_sample()
    assert len(loop._val_chain_cache) == 1
    (chain,) = loop._val_chain_cache.values()
    n_compiles = chain._cache_size()
    assert n_compiles == 1

    loop.val_sample()  # same shapes -> the SAME executable, no new compile
    assert len(loop._val_chain_cache) == 1
    assert chain._cache_size() == n_compiles
