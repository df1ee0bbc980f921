"""Execute the remaining CLI entry points end-to-end as subprocesses.

Round-1 coverage gap (VERDICT.md): super_res_train, super_res_sample,
super_res_unsup, super_res_depth_sweep_sample, image_nll, image_sample_repeat
and classifier_sample only had flag-parity tests. Each test here drives the
real script on tiny configs and asserts the reference-shaped artifacts
(npz keys, PNG grids, logged bpd terms).
"""

import glob
import os

import numpy as np
import pytest

from e2e_utils import make_image_dataset, run_script

pytestmark = pytest.mark.slow

TINY_FLAGS = [
    "--image_size", "16",
    "--num_channels", "32",
    "--num_res_blocks", "1",
    "--num_heads", "2",
    "--attention_resolutions", "8",
    "--channel_mult", "1,2",
    "--diffusion_steps", "40",
    "--noise_schedule", "cosine",
    "--learn_sigma", "True",
    "--rescale_learned_sigmas", "True",
]

# SR factories preset channel_mult by large_size; 64 is the smallest preset
# (script_util.py:356-365), same restriction as the reference.
SR_FLAGS = [
    "--large_size", "64",
    "--small_size", "16",
    "--num_channels", "32",
    "--num_res_blocks", "1",
    "--num_heads", "2",
    "--attention_resolutions", "16",
    "--diffusion_steps", "40",
    "--noise_schedule", "cosine",
    "--learn_sigma", "False",
]


@pytest.fixture(scope="module")
def dataset16(tmp_path_factory):
    root = tmp_path_factory.mktemp("data16")
    img_dir, clip_path = make_image_dataset(root, n=16, size=16)
    return img_dir, clip_path


@pytest.fixture(scope="module")
def dataset64(tmp_path_factory):
    root = tmp_path_factory.mktemp("data64")
    img_dir, clip_path = make_image_dataset(root, n=8, size=64)
    return img_dir, clip_path


@pytest.fixture(scope="module")
def tiny_ckpt16(tmp_path_factory):
    """Random-init .flax checkpoint for the 16px CLIP-conditioned UNet
    (the model image_sample/image_nll/depth-sweep build from TINY_FLAGS)."""
    import jax
    import jax.numpy as jnp

    from guided_diffusion_clip_tpu.utils.checkpoint import save_flax
    from guided_diffusion_clip_tpu.utils.script_util import create_model

    # use_scale_shift_norm=True matches the FLAG default (script_util.py:76),
    # which is what the scripts build from TINY_FLAGS
    model = create_model(
        image_size=16, num_channels=32, num_res_blocks=1, channel_mult="1,2",
        learn_sigma=True, attention_resolutions="8", num_heads=2, class_cond=True,
        use_scale_shift_norm=True,
    )
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)),
        clip_feat=jnp.zeros((1, 512)),
    )["params"]
    path = str(tmp_path_factory.mktemp("ckpt16") / "model000010.flax")
    save_flax(path, params)
    return path


class TestSuperResCascade:
    def test_super_res_train_then_sample(self, dataset64, tmp_path):
        """The 64->256 cascade semantics at test scale (16->64): train the
        upstream low_res SR model, then upsample a base-sample npz with it
        (reference scripts/super_res_sample.py:77-100 row sharding)."""
        img_dir, _ = dataset64
        run_dir = str(tmp_path / "sr_train")
        os.makedirs(run_dir)
        run_script(
            "super_res_train.py",
            [
                *SR_FLAGS,
                "--data_dir", img_dir,
                "--batch_size", "4",
                "--save_interval", "2",
                "--log_interval", "1",
            ],
            env_extra={
                "DIFFUSION_TRAINING_TEST": "1",
                "OPENAI_LOGDIR": run_dir,
                "OPENAI_LOG_FORMAT": "log",
            },
        )
        ckpts = sorted(glob.glob(os.path.join(run_dir, "model*.flax")))
        assert ckpts, os.listdir(run_dir)

        # base samples: what image_sample would emit at the small resolution
        base = str(tmp_path / "base_samples.npz")
        rs = np.random.RandomState(3)
        np.savez(base, rs.randint(0, 255, (4, 16, 16, 3), dtype=np.uint8))

        out_dir = str(tmp_path / "sr_samples")
        os.makedirs(out_dir)
        run_script(
            "super_res_sample.py",
            [
                *SR_FLAGS,
                "--timestep_respacing", "3",
                "--model_path", ckpts[-1],
                "--base_samples", base,
                "--batch_size", "4",
                "--num_samples", "4",
            ],
            env_extra={"OPENAI_LOGDIR": out_dir, "OPENAI_LOG_FORMAT": "log"},
        )
        npzs = glob.glob(os.path.join(out_dir, "samples_*.npz"))
        assert npzs, os.listdir(out_dir)
        arr = np.load(npzs[0])["arr_0"]
        assert arr.shape == (4, 64, 64, 3) and arr.dtype == np.uint8

    def test_super_res_unsup_train(self, dataset64, tmp_path):
        """The fork's unsupervised SR training (img2 + CLIP delta model)."""
        img_dir, clip_path = dataset64
        run_dir = str(tmp_path / "sr_unsup")
        os.makedirs(run_dir)
        run_script(
            "super_res_unsup.py",
            [
                *SR_FLAGS,
                "--class_cond", "True",
                "--data_dir", img_dir,
                "--clip_file_path", clip_path,
                "--batch_size", "4",
                "--val_batch_size", "2",
                "--save_interval", "2",
                "--log_interval", "1",
            ],
            env_extra={
                "DIFFUSION_TRAINING_TEST": "1",
                "OPENAI_LOGDIR": run_dir,
                "OPENAI_LOG_FORMAT": "log",
            },
        )
        assert glob.glob(os.path.join(run_dir, "model*.flax")), os.listdir(run_dir)
        assert glob.glob(os.path.join(run_dir, "ema_0.9999_*.flax"))

    def test_depth_sweep(self, dataset16, tiny_ckpt16, tmp_path):
        img_dir, clip_path = dataset16
        out_dir = str(tmp_path / "sweep")
        os.makedirs(out_dir)
        run_script(
            "super_res_depth_sweep_sample.py",
            [
                *TINY_FLAGS,
                "--class_cond", "True",
                "--timestep_respacing", "5",
                "--model_path", tiny_ckpt16,
                "--data_dir_test", img_dir,
                "--clip_file_path_test", clip_path,
                "--batch_size", "4",
                "--num_samples", "4",
            ],
            env_extra={"OPENAI_LOGDIR": out_dir, "OPENAI_LOG_FORMAT": "log"},
        )
        # one PNG per swept depth (reference :62 sweeps range(500, 1000, 199))
        depth_pngs = glob.glob(os.path.join(out_dir, "depth_*.png"))
        assert len(depth_pngs) == 3, os.listdir(out_dir)
        assert os.path.exists(os.path.join(out_dir, "target.png"))
        assert os.path.exists(os.path.join(out_dir, "start.png"))


class TestNLL:
    def test_image_nll(self, dataset16, tiny_ckpt16, tmp_path):
        img_dir, clip_path = dataset16
        out_dir = str(tmp_path / "nll")
        os.makedirs(out_dir)
        proc = run_script(
            "image_nll.py",
            [
                *TINY_FLAGS,
                "--class_cond", "True",
                "--model_path", tiny_ckpt16,
                "--data_dir", img_dir,
                "--clip_file_path", clip_path,
                "--batch_size", "2",
                "--num_samples", "2",
            ],
            env_extra={"OPENAI_LOGDIR": out_dir, "OPENAI_LOG_FORMAT": "log,stdout"},
        )
        # term npz artifacts (reference scripts/image_nll.py:70-77)
        for name in ("vb", "mse", "xstart_mse"):
            files = glob.glob(os.path.join(out_dir, f"{name}_terms.npz"))
            assert files, (name, os.listdir(out_dir))
            terms = np.load(files[0])["arr_0"]
            assert terms.ndim == 1 and np.isfinite(terms).all()
        assert "bpd=" in proc.stdout or "bpd=" in open(
            os.path.join(out_dir, "log.txt")
        ).read()


class TestSampleVariants:
    def test_image_sample_repeat(self, dataset16, tiny_ckpt16, tmp_path):
        main_path = str(tmp_path / "repeats")
        os.makedirs(main_path)
        img_dir, clip_path = dataset16
        run_script(
            "image_sample_repeat.py",
            [
                *TINY_FLAGS,
                "--class_cond", "True",
                "--timestep_respacing", "3",
                "--model_path", tiny_ckpt16,
                "--data_dir_test", img_dir,
                "--clip_file_path_test", clip_path,
                "--batch_size", "2",
                "--num_samples", "2",
                "--repeats", "2",
                "--main_path", main_path,
            ],
            env_extra={"OPENAI_LOG_FORMAT": "log"},
        )
        run_dirs = sorted(os.listdir(main_path))
        assert len(run_dirs) == 2, run_dirs  # distinct dirs per repeat
        for d in run_dirs:
            assert glob.glob(os.path.join(main_path, d, "samples_*.npz")), (
                d, os.listdir(os.path.join(main_path, d))
            )

    def test_denoise_start_point_with_respacing(self, dataset16, tiny_ckpt16, tmp_path):
        """The reference's sample_config.yaml pairs denoise_start_point 800
        with timestep_respacing 100 (original-T units); scaled down here:
        T=40, respacing 5, dsp 32 -> respaced step 4."""
        img_dir, clip_path = dataset16
        out_dir = str(tmp_path / "dsp")
        os.makedirs(out_dir)
        proc = run_script(
            "image_sample.py",
            [
                *TINY_FLAGS,
                "--class_cond", "True",
                "--timestep_respacing", "5",
                "--denoise_start_point", "32",
                "--model_path", tiny_ckpt16,
                "--data_dir_test", img_dir,
                "--clip_file_path_test", clip_path,
                "--batch_size", "2",
                "--num_samples", "2",
            ],
            env_extra={"OPENAI_LOGDIR": out_dir, "OPENAI_LOG_FORMAT": "log,stdout"},
        )
        log = proc.stdout + open(os.path.join(out_dir, "log.txt")).read()
        assert "denoise_start_point 32 -> respaced step 4" in log
        assert glob.glob(os.path.join(out_dir, "samples_*.npz"))

    def test_image_sample_dpm_solver(self, dataset16, tiny_ckpt16, tmp_path):
        """--sampler dpm++2m drives the 2nd-order ODE loop end-to-end."""
        img_dir, clip_path = dataset16
        out_dir = str(tmp_path / "dpm")
        os.makedirs(out_dir)
        run_script(
            "image_sample.py",
            [
                *TINY_FLAGS,
                "--class_cond", "True",
                "--timestep_respacing", "5",
                "--sampler", "dpm++2m",
                "--model_path", tiny_ckpt16,
                "--data_dir_test", img_dir,
                "--clip_file_path_test", clip_path,
                "--batch_size", "2",
                "--num_samples", "2",
            ],
            env_extra={"OPENAI_LOGDIR": out_dir, "OPENAI_LOG_FORMAT": "log"},
        )
        npz = glob.glob(os.path.join(out_dir, "samples_*.npz"))
        assert npz
        import numpy as np

        arr = np.load(npz[0])["arr_0"]
        assert arr.shape[0] == 2 and np.isfinite(arr).all()

    def test_image_sample_deep_cache(self, dataset16, tiny_ckpt16, tmp_path):
        """--deep_cache 2 runs the lax.cond cached chain through the CLI."""
        img_dir, clip_path = dataset16
        out_dir = str(tmp_path / "dc")
        os.makedirs(out_dir)
        run_script(
            "image_sample.py",
            [
                *TINY_FLAGS,
                "--class_cond", "True",
                "--timestep_respacing", "5",
                "--deep_cache", "2",
                "--model_path", tiny_ckpt16,
                "--data_dir_test", img_dir,
                "--clip_file_path_test", clip_path,
                "--batch_size", "2",
                "--num_samples", "2",
            ],
            env_extra={"OPENAI_LOGDIR": out_dir, "OPENAI_LOG_FORMAT": "log"},
        )
        npz = glob.glob(os.path.join(out_dir, "samples_*.npz"))
        assert npz
        import numpy as np

        arr = np.load(npz[0])["arr_0"]
        assert arr.shape[0] == 2 and np.isfinite(arr).all()

    @pytest.mark.parametrize(
        "deep_cache,cfg_cache", [("0", "0"), ("2", "0"), ("0", "2")]
    )
    def test_image_sample_cfg(self, dataset16, tiny_ckpt16, tmp_path, deep_cache, cfg_cache):
        """--cfg_scale runs the doubled-batch classifier-free-guidance
        chain through the CLI flag plumbing (clip_feat zero-null);
        deep_cache=2 drives the CFG x DeepCache composition; cfg_cache=2
        drives the cached-uncond-branch chain (cfg_cached_model_fn)."""
        img_dir, clip_path = dataset16
        out_dir = str(tmp_path / "cfg")
        os.makedirs(out_dir)
        run_script(
            "image_sample.py",
            [
                *TINY_FLAGS,
                "--class_cond", "True",
                "--timestep_respacing", "5",
                "--cfg_scale", "2.5",
                "--cfg_cache", cfg_cache,
                "--deep_cache", deep_cache,
                "--model_path", tiny_ckpt16,
                "--data_dir_test", img_dir,
                "--clip_file_path_test", clip_path,
                "--batch_size", "2",
                "--num_samples", "2",
            ],
            env_extra={"OPENAI_LOGDIR": out_dir, "OPENAI_LOG_FORMAT": "log"},
        )
        npz = glob.glob(os.path.join(out_dir, "samples_*.npz"))
        assert npz
        import numpy as np

        arr = np.load(npz[0])["arr_0"]
        assert arr.shape[0] == 2 and np.isfinite(arr).all()

    @pytest.mark.parametrize(
        "deep_cache,guidance_interval,guidance_cache",
        [("0", "", "0"), ("2", "", "0"), ("0", "5,30", "0"), ("2", "", "2")],
    )
    def test_classifier_sample(self, tmp_path, deep_cache, guidance_interval, guidance_cache):
        """Classifier-guided sampling (grad-in-the-scan) on a tiny 64px pair;
        deep_cache=2 additionally drives the cached-generator branch;
        guidance_interval drives the lax.cond guidance gate through the CLI;
        the last case composes generator DeepCache with guidance-gradient
        caching (both states in one scan carry)."""
        import jax
        import jax.numpy as jnp

        from guided_diffusion_clip_tpu.utils.checkpoint import save_flax
        from guided_diffusion_clip_tpu.utils.script_util import (
            create_classifier,
            create_upstream_model,
        )

        model_flags = [
            "--image_size", "64",
            "--num_channels", "32",
            "--num_res_blocks", "1",
            "--num_heads", "2",
            "--attention_resolutions", "32",
            "--channel_mult", "1,2",
            "--diffusion_steps", "40",
            "--noise_schedule", "cosine",
            "--learn_sigma", "True",
            "--rescale_learned_sigmas", "True",
            "--class_cond", "True",
        ]
        model = create_upstream_model(
            image_size=64, num_channels=32, num_res_blocks=1, channel_mult="1,2",
            learn_sigma=True, attention_resolutions="32", num_heads=2,
            class_cond=True, use_scale_shift_norm=True,
        )
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)),
            y=jnp.zeros((1,), jnp.int32),
        )["params"]
        ckpt = str(tmp_path / "model000010.flax")
        save_flax(ckpt, params)

        classifier = create_classifier(
            image_size=64, classifier_use_fp16=False, classifier_width=32,
            classifier_depth=1, classifier_attention_resolutions="32",
            classifier_use_scale_shift_norm=True, classifier_resblock_updown=False,
            classifier_pool="adaptive",
        )
        cparams = classifier.init(
            jax.random.key(1), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,))
        )["params"]
        cckpt = str(tmp_path / "classifier000010.flax")
        save_flax(cckpt, cparams)

        out_dir = str(tmp_path / "guided")
        os.makedirs(out_dir)
        run_script(
            "classifier_sample.py",
            [
                *model_flags,
                "--classifier_width", "32",
                "--classifier_depth", "1",
                "--classifier_attention_resolutions", "32",
                "--classifier_resblock_updown", "False",
                "--classifier_pool", "adaptive",
                "--timestep_respacing", "2",
                "--model_path", ckpt,
                "--classifier_path", cckpt,
                "--classifier_scale", "1.0",
                "--deep_cache", deep_cache,
                "--guidance_interval", guidance_interval,
                "--guidance_cache", guidance_cache,
                "--batch_size", "2",
                "--num_samples", "2",
            ],
            env_extra={"OPENAI_LOGDIR": out_dir, "OPENAI_LOG_FORMAT": "log"},
        )
        npzs = glob.glob(os.path.join(out_dir, "samples_*.npz"))
        assert npzs, os.listdir(out_dir)
        obj = np.load(npzs[0])
        arr, labels = obj["arr_0"], obj["arr_1"]
        assert arr.shape == (2, 64, 64, 3) and arr.dtype == np.uint8
        assert labels.shape == (2,) and (labels >= 0).all() and (labels < 1000).all()
