"""jax.profiler wiring (SURVEY §5.1): a train run with profile_dir set must
emit a TensorBoard trace artifact."""

import glob
import os

import numpy as np

from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel
from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion


def test_trace_artifact_written(tmp_path):
    logger.configure_dir(dir=str(tmp_path / "logs"), format_strs=[])
    cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
        num_classes=None, num_heads=2,
    )
    diffusion = create_gaussian_diffusion(
        steps=4, noise_schedule="cosine", learn_sigma=False
    )

    def gen():
        rs = np.random.RandomState(0)
        while True:
            yield rs.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32), {}

    profile_dir = str(tmp_path / "trace")
    loop = TrainLoop(
        model=UNetModel(config=cfg), diffusion=diffusion, data=gen(),
        batch_size=4, microbatch=4, lr=1e-4, ema_rate="0.9999",
        log_interval=1, save_interval=2, profile_dir=profile_dir,
        profile_steps=1,
    )
    os.environ["DIFFUSION_TRAINING_TEST"] = "1"
    try:
        loop.run_loop()
    finally:
        del os.environ["DIFFUSION_TRAINING_TEST"]

    traces = glob.glob(
        os.path.join(profile_dir, "**", "*.xplane.pb"), recursive=True
    ) + glob.glob(os.path.join(profile_dir, "**", "*.trace.json*"), recursive=True)
    assert traces, f"no trace artifacts under {profile_dir}"
