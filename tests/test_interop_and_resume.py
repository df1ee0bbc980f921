"""Cross-framework checkpoint interop + training resume behavior."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.models.unet import UNetConfig, UNetModel
from guided_diffusion_clip_tpu.utils import checkpoint as ckpt
from guided_diffusion_clip_tpu.utils import logger
from reference_oracle import has_reference

CFG = UNetConfig(
    image_size=16, in_channels=3, model_channels=32, out_channels=6,
    num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
    num_heads=2, use_scale_shift_norm=True,
)


class TestPtInterop:
    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_our_pt_loads_into_reference_torch_model(self, tmp_path):
        """save_pt_copy output must be consumable by the reference's UNetModel
        with strict loading AND produce the same forward values."""
        import sys

        sys.path.insert(0, "/root/reference")
        import torch
        from guided_diffusion.unet import UNetModel as RefUNet

        model = UNetModel(config=CFG)
        x = jnp.array(np.random.RandomState(0).randn(2, 16, 16, 3), dtype=jnp.float32)
        t = jnp.array([1.0, 9.0])
        params = model.init(jax.random.key(0), x, t)["params"]

        pt_path = str(tmp_path / "export.pt")
        ckpt.save_pt_copy(pt_path, params)

        ref = RefUNet(
            image_size=16, in_channels=3, model_channels=32, out_channels=6,
            num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
            num_heads=2, use_scale_shift_norm=True, dropout=0.0,
        )
        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
        ref.load_state_dict(sd, strict=True)
        ref.eval()

        ours = np.asarray(model.apply({"params": params}, x, t))
        with torch.no_grad():
            theirs = ref(
                torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy()),
                torch.from_numpy(np.asarray(t)),
            )
        np.testing.assert_allclose(
            ours, np.moveaxis(theirs.numpy(), 1, -1), rtol=1e-4, atol=1e-4
        )

    def test_flax_pt_load_roundtrip(self, tmp_path):
        model = UNetModel(config=CFG)
        x = jnp.zeros((1, 16, 16, 3))
        params = model.init(jax.random.key(1), x, jnp.zeros((1,)))["params"]
        pt_path = str(tmp_path / "rt.pt")
        ckpt.save_pt_copy(pt_path, params)
        back = ckpt.load_params(pt_path, params)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.slow
class TestResume:
    def test_resume_restores_step_params_ema_opt(self, tmp_path):
        from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
        from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion

        logger.configure_dir(dir=str(tmp_path), format_strs=[])
        os.environ["DIFFUSION_BLOB_LOGDIR"] = str(tmp_path)
        try:
            model = UNetModel(config=CFG)
            diffusion = create_gaussian_diffusion(
                steps=20, noise_schedule="cosine", learn_sigma=True,
                rescale_learned_sigmas=True,
            )

            def data_gen():
                rs = np.random.RandomState(0)
                while True:
                    yield rs.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32), {}

            loop = TrainLoop(
                model=model, diffusion=diffusion, data=data_gen(), batch_size=8,
                microbatch=-1, lr=1e-3, ema_rate="0.99", log_interval=10**9,
                save_interval=10**9,
            )
            for _ in range(3):
                b, c = next(loop.data)
                loop.run_step(b, c)
                loop.step += 1
            loop.save()

            resume_path = os.path.join(str(tmp_path), "model000003.flax")
            assert os.path.exists(resume_path)
            assert ckpt.parse_resume_step_from_filename(resume_path) == 3
            assert ckpt.find_ema_checkpoint(resume_path, 3, 0.99)

            loop2 = TrainLoop(
                model=model, diffusion=diffusion, data=data_gen(), batch_size=8,
                microbatch=-1, lr=1e-3, ema_rate="0.99", log_interval=10**9,
                save_interval=10**9, resume_checkpoint=resume_path,
            )
            assert loop2.resume_step == 3
            for a, b in zip(
                jax.tree_util.tree_leaves(jax.device_get(loop.params)),
                jax.tree_util.tree_leaves(jax.device_get(loop2.params)),
            ):
                np.testing.assert_allclose(a, b, rtol=1e-6)
            for a, b in zip(
                jax.tree_util.tree_leaves(jax.device_get(loop.ema_params[0])),
                jax.tree_util.tree_leaves(jax.device_get(loop2.ema_params[0])),
            ):
                np.testing.assert_allclose(a, b, rtol=1e-6)
            # optimizer state (adam moments) restored
            c1 = jax.tree_util.tree_leaves(jax.device_get(loop.opt_state))
            c2 = jax.tree_util.tree_leaves(jax.device_get(loop2.opt_state))
            assert any(np.asarray(x).size > 1 for x in c1)
            for a, b in zip(c1, c2):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        finally:
            os.environ.pop("DIFFUSION_BLOB_LOGDIR", None)

    def test_parse_resume_step(self):
        assert ckpt.parse_resume_step_from_filename("/a/b/model012345.flax") == 12345
        assert ckpt.parse_resume_step_from_filename("/a/b/model080000.pt") == 80000
        assert ckpt.parse_resume_step_from_filename("weird.pt") == 0


class TestFlagSurfaceParity:
    """Every flag the reference README commands use must exist on our scripts."""

    @pytest.mark.parametrize(
        "script,flags",
        [
            (
                "image_train.py",
                ["--data_dir", "--lr", "--batch_size", "--microbatch", "--ema_rate",
                 "--log_interval", "--save_interval", "--resume_checkpoint", "--use_fp16",
                 "--fp16_scale_growth", "--schedule_sampler", "--weight_decay",
                 "--lr_anneal_steps", "--image_size", "--num_channels", "--num_res_blocks",
                 "--channel_mult", "--learn_sigma", "--class_cond", "--use_checkpoint",
                 "--attention_resolutions", "--num_heads", "--num_head_channels",
                 "--num_heads_upsample", "--use_scale_shift_norm", "--dropout",
                 "--resblock_updown", "--use_new_attention_order", "--diffusion_steps",
                 "--noise_schedule", "--timestep_respacing", "--use_kl", "--predict_xstart",
                 "--rescale_timesteps", "--rescale_learned_sigmas"],
            ),
            (
                "image_sample.py",
                ["--clip_denoised", "--num_samples", "--batch_size", "--use_ddim",
                 "--model_path", "--timestep_respacing"],
            ),
            (
                "classifier_sample.py",
                ["--model_path", "--classifier_path", "--classifier_scale",
                 "--classifier_depth", "--classifier_width", "--classifier_pool",
                 "--classifier_resblock_updown", "--classifier_use_scale_shift_norm",
                 "--classifier_use_fp16", "--classifier_attention_resolutions"],
            ),
            (
                "super_res_sample.py",
                ["--base_samples", "--large_size", "--small_size", "--model_path"],
            ),
            ("classifier_train.py", ["--iterations", "--anneal_lr", "--noised", "--val_data_dir"]),
            ("image_nll.py", ["--data_dir", "--num_samples", "--model_path"]),
        ],
    )
    def test_reference_flags_exist(self, script, flags):
        import importlib.util
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        sys.path.insert(0, os.path.join(repo, "scripts"))
        spec = importlib.util.spec_from_file_location(
            f"script_{script[:-3]}", os.path.join(repo, "scripts", script)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        parser = mod.create_argparser()
        known = set()
        for action in parser._actions:
            known.update(action.option_strings)
        missing = [f for f in flags if f not in known]
        assert not missing, f"{script} missing reference flags: {missing}"


def test_find_resume_checkpoint_discovery(tmp_path, monkeypatch):
    """DIFFUSION_AUTO_RESUME=1 picks the newest model{step}.flax in the
    blob log dir; off by default (the reference ships a None stub,
    train_util.py:365-368 — discovery is the documented intent)."""
    from guided_diffusion_clip_tpu.training.train_loop import find_resume_checkpoint

    monkeypatch.setenv("DIFFUSION_BLOB_LOGDIR", str(tmp_path))
    # default: inactive
    monkeypatch.delenv("DIFFUSION_AUTO_RESUME", raising=False)
    assert find_resume_checkpoint() is None

    monkeypatch.setenv("DIFFUSION_AUTO_RESUME", "1")
    assert find_resume_checkpoint() is None  # empty dir
    for step in (5000, 10000, 7500):
        (tmp_path / f"model{step:06d}.flax").write_bytes(b"x")
    (tmp_path / "ema_0.9999_010000.flax").write_bytes(b"x")
    found = find_resume_checkpoint()
    assert found is not None and found.endswith("model010000.flax")
