"""End-to-end CLI integration tests: train -> checkpoint -> sample.

The TPU analog of the reference's DIFFUSION_TRAINING_TEST escape hatch
(train_util.py:174-177) on tiny synthetic data, run through the real scripts
as subprocesses on the virtual CPU mesh.
"""

import csv
import glob
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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


def run_script(name, flags, env_extra=None, timeout=1500):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.update(env_extra or {})
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", name), *flags],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )
    assert proc.returncode == 0, f"{name} failed:\nSTDOUT:{proc.stdout[-3000:]}\nSTDERR:{proc.stderr[-3000:]}"
    return proc


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    img_dir = root / "imgs"
    img_dir.mkdir()
    rs = np.random.RandomState(0)
    clip = {}
    for i in range(16):
        name = f"img_{i:03d}.png"
        arr = rs.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / name)
        clip[name] = rs.randn(2, 512).astype(np.float32)  # flip-indexed
    clip_path = root / "clip_dict.npz"
    np.savez(clip_path, **clip)
    return str(img_dir), str(clip_path), str(root)


@pytest.mark.slow
class TestTrainSampleRoundTrip:
    def test_image_train_and_sample(self, dataset, tmp_path):
        img_dir, clip_path, _ = dataset
        run_dir = str(tmp_path / "run")
        os.makedirs(run_dir)
        run_script(
            "image_train.py",
            [
                *TINY_FLAGS,
                "--data_dir", img_dir,
                "--clip_file_path", clip_path,
                "--class_cond", "True",
                "--batch_size", "8",
                "--save_interval", "2",
                "--log_interval", "1",
                "--val_batch_size", "4",
            ],
            env_extra={
                "DIFFUSION_TRAINING_TEST": "1",
                "OPENAI_LOGDIR": run_dir,
                "OPENAI_LOG_FORMAT": "log,csv",
            },
        )
        ckpts = sorted(glob.glob(os.path.join(run_dir, "model*.flax")))
        assert ckpts, f"no checkpoints in {os.listdir(run_dir)}"
        assert glob.glob(os.path.join(run_dir, "ema_0.9999_*.flax"))
        assert glob.glob(os.path.join(run_dir, "opt*.flax"))
        # val sampling artifacts (train_util.py:269-341 parity)
        assert glob.glob(os.path.join(run_dir, "val_samples_0_*.png"))
        assert os.path.exists(os.path.join(run_dir, "progress.csv"))

        sample_dir = str(tmp_path / "samples")
        os.makedirs(sample_dir)
        run_script(
            "image_sample.py",
            [
                *TINY_FLAGS,
                "--timestep_respacing", "5",
                "--model_path", ckpts[-1],
                "--data_dir_test", img_dir,
                "--clip_file_path_test", clip_path,
                "--class_cond", "True",
                "--batch_size", "4",
                "--num_samples", "8",
            ],
            env_extra={"OPENAI_LOGDIR": sample_dir, "OPENAI_LOG_FORMAT": "log"},
        )
        pngs = glob.glob(os.path.join(sample_dir, "samples_test*.png"))
        npzs = glob.glob(os.path.join(sample_dir, "samples_*.npz"))
        assert pngs and npzs
        arr = np.load(npzs[0])["arr_0"]
        assert arr.shape == (8, 16, 16, 3) and arr.dtype == np.uint8

    def test_image_train_fsdp_smoke(self, dataset, tmp_path):
        """--param_sharding fsdp end to end: sharded train step + ckpt save
        (gathers sharded state) through the real CLI on the 8-device mesh."""
        img_dir, clip_path, _ = dataset
        run_dir = str(tmp_path / "fsdp_run")
        os.makedirs(run_dir)
        run_script(
            "image_train.py",
            [
                *TINY_FLAGS,
                "--data_dir", img_dir,
                "--clip_file_path", clip_path,
                "--class_cond", "True",
                "--batch_size", "8",
                "--microbatch", "4",
                "--save_interval", "2",
                "--log_interval", "1",
                "--val_batch_size", "4",
                "--param_sharding", "fsdp",
            ],
            env_extra={
                "DIFFUSION_TRAINING_TEST": "1",
                "OPENAI_LOGDIR": run_dir,
                "OPENAI_LOG_FORMAT": "log,csv",
            },
        )
        assert glob.glob(os.path.join(run_dir, "model*.flax"))
        assert glob.glob(os.path.join(run_dir, "opt*.flax"))
        # deferred metric logging reached the csv with real values
        with open(os.path.join(run_dir, "progress.csv")) as f:
            rows = list(csv.DictReader(f))
        assert rows and float(rows[0]["loss"]) > 0

    def test_image_train_opt_flat_smoke(self, dataset, tmp_path):
        """--opt_impl flat end to end: single-buffer fused AdamW/EMA through
        the real CLI, checkpoint triplet saved in tree format on disk."""
        img_dir, clip_path, _ = dataset
        run_dir = str(tmp_path / "flat_run")
        os.makedirs(run_dir)
        run_script(
            "image_train.py",
            [
                *TINY_FLAGS,
                "--data_dir", img_dir,
                "--clip_file_path", clip_path,
                "--class_cond", "True",
                "--batch_size", "8",
                "--save_interval", "2",
                "--log_interval", "1",
                "--opt_impl", "flat",
            ],
            env_extra={
                "DIFFUSION_TRAINING_TEST": "1",
                "OPENAI_LOGDIR": run_dir,
                "OPENAI_LOG_FORMAT": "log,csv",
            },
        )
        assert glob.glob(os.path.join(run_dir, "model*.flax"))
        assert glob.glob(os.path.join(run_dir, "ema_0.9999_*.flax"))
        assert glob.glob(os.path.join(run_dir, "opt*.flax"))
        with open(os.path.join(run_dir, "progress.csv")) as f:
            rows = list(csv.DictReader(f))
        assert rows and float(rows[0]["loss"]) > 0

    def test_image_train_opt_zero1_smoke(self, dataset, tmp_path):
        """--opt_impl zero1 end to end: ZeRO-1 sharded flat optimizer through
        the real CLI on the virtual 8-CPU mesh; checkpoints land in the same
        on-disk layout as flat (tree-format model/ema, flat opt vectors)."""
        img_dir, clip_path, _ = dataset
        run_dir = str(tmp_path / "zero1_run")
        os.makedirs(run_dir)
        run_script(
            "image_train.py",
            [
                *TINY_FLAGS,
                "--data_dir", img_dir,
                "--clip_file_path", clip_path,
                "--class_cond", "True",
                "--batch_size", "8",
                "--save_interval", "2",
                "--log_interval", "1",
                "--opt_impl", "zero1",
            ],
            env_extra={
                "DIFFUSION_TRAINING_TEST": "1",
                "OPENAI_LOGDIR": run_dir,
                "OPENAI_LOG_FORMAT": "log,csv",
            },
        )
        assert glob.glob(os.path.join(run_dir, "model*.flax"))
        assert glob.glob(os.path.join(run_dir, "ema_0.9999_*.flax"))
        assert glob.glob(os.path.join(run_dir, "opt*.flax"))
        with open(os.path.join(run_dir, "progress.csv")) as f:
            rows = list(csv.DictReader(f))
        assert rows and float(rows[0]["loss"]) > 0

    def test_image_train_sp_smoke(self, dataset, tmp_path):
        """--spatial_shard 2 end to end: DP(4) x SP(2) mesh through the real
        CLI — activation-H sharding (parallel/sp.py) composed with the full
        train loop + checkpoint save on the 8-device mesh."""
        img_dir, clip_path, _ = dataset
        run_dir = str(tmp_path / "sp_run")
        os.makedirs(run_dir)
        run_script(
            "image_train.py",
            [
                *TINY_FLAGS,
                "--data_dir", img_dir,
                "--clip_file_path", clip_path,
                "--class_cond", "True",
                "--batch_size", "8",
                "--save_interval", "2",
                "--log_interval", "1",
                "--spatial_shard", "2",
            ],
            env_extra={
                "DIFFUSION_TRAINING_TEST": "1",
                "OPENAI_LOGDIR": run_dir,
                "OPENAI_LOG_FORMAT": "log,csv",
            },
        )
        assert glob.glob(os.path.join(run_dir, "model*.flax"))
        with open(os.path.join(run_dir, "progress.csv")) as f:
            rows = list(csv.DictReader(f))
        assert rows and float(rows[0]["loss"]) > 0

    def test_image_train_tp_smoke(self, dataset, tmp_path):
        """--tensor_shard 2 end to end: DP(4) x TP(2) mesh through the real
        CLI — activation-C sharding (parallel/tp.py, VERDICT r3 item 6)
        composed with the full train loop + checkpoint save."""
        img_dir, clip_path, _ = dataset
        run_dir = str(tmp_path / "tp_run")
        os.makedirs(run_dir)
        run_script(
            "image_train.py",
            [
                *TINY_FLAGS,
                "--data_dir", img_dir,
                "--clip_file_path", clip_path,
                "--class_cond", "True",
                "--batch_size", "8",
                "--save_interval", "2",
                "--log_interval", "1",
                "--tensor_shard", "2",
            ],
            env_extra={
                "DIFFUSION_TRAINING_TEST": "1",
                "OPENAI_LOGDIR": run_dir,
                "OPENAI_LOG_FORMAT": "log,csv",
            },
        )
        assert glob.glob(os.path.join(run_dir, "model*.flax"))
        with open(os.path.join(run_dir, "progress.csv")) as f:
            rows = list(csv.DictReader(f))
        assert rows and float(rows[0]["loss"]) > 0

    def test_image_sample_tp_smoke(self, dataset, tmp_path):
        """--tensor_shard 4 end to end: ('data',2) x ('model',4) sampling mesh
        through the real CLI — channel sharding (parallel/tp.py) through the
        full respaced chain + npz/png write on the 8-device mesh."""
        img_dir, clip_path, _ = dataset
        run_dir = str(tmp_path / "tp_train")
        os.makedirs(run_dir)
        run_script(
            "image_train.py",
            [
                *TINY_FLAGS,
                "--data_dir", img_dir,
                "--clip_file_path", clip_path,
                "--class_cond", "True",
                "--batch_size", "8",
                "--save_interval", "2",
                "--log_interval", "1",
            ],
            env_extra={
                "DIFFUSION_TRAINING_TEST": "1",
                "OPENAI_LOGDIR": run_dir,
                "OPENAI_LOG_FORMAT": "log,csv",
            },
        )
        ckpts = sorted(glob.glob(os.path.join(run_dir, "model*.flax")))
        assert ckpts
        sample_dir = str(tmp_path / "tp_samples")
        os.makedirs(sample_dir)
        run_script(
            "image_sample.py",
            [
                *TINY_FLAGS,
                "--timestep_respacing", "5",
                "--model_path", ckpts[-1],
                "--data_dir_test", img_dir,
                "--clip_file_path_test", clip_path,
                "--class_cond", "True",
                "--batch_size", "4",
                "--num_samples", "4",
                "--tensor_shard", "4",
            ],
            env_extra={"OPENAI_LOGDIR": sample_dir, "OPENAI_LOG_FORMAT": "log"},
        )
        npzs = glob.glob(os.path.join(sample_dir, "samples_*.npz"))
        assert npzs
        arr = np.load(npzs[0])["arr_0"]
        assert arr.shape == (4, 16, 16, 3) and arr.dtype == np.uint8

    def test_classifier_train_smoke(self, dataset, tmp_path):
        img_dir, _, _ = dataset
        run_dir = str(tmp_path / "cls")
        os.makedirs(run_dir)
        run_script(
            "classifier_train.py",
            [
                # 64 is the smallest size with a channel_mult preset
                # (script_util.py:149-159) — same restriction as the reference.
                "--image_size", "64",
                "--classifier_width", "32",
                "--classifier_depth", "1",
                "--classifier_attention_resolutions", "8",
                "--classifier_pool", "adaptive",
                "--diffusion_steps", "40",
                "--noise_schedule", "cosine",
                "--data_dir", img_dir,
                "--batch_size", "2",
                "--iterations", "3",
                "--save_interval", "2",
                "--log_interval", "1",
            ],
            env_extra={
                "DIFFUSION_TRAINING_TEST": "1",
                "OPENAI_LOGDIR": run_dir,
                "OPENAI_LOG_FORMAT": "log",
            },
        )
        assert glob.glob(os.path.join(run_dir, "model*.flax"))


@pytest.mark.slow
class TestClipGuidedSample:
    def test_clip_guided_script(self, dataset, tmp_path):
        """Drive clip_guided_sample.py end-to-end with tiny random CLIP weights."""
        import torch

        img_dir, _, root = dataset
        # random tiny HF CLIPModel weights
        from test_clip_vit import TINY, make_hf_model

        hf = make_hf_model(TINY)
        clip_pt = str(tmp_path / "tiny_clip.pt")
        torch.save(hf.state_dict(), clip_pt)

        # random-init diffusion checkpoint
        import jax
        import jax.numpy as jnp

        from guided_diffusion_clip_tpu.utils.checkpoint import save_flax
        from guided_diffusion_clip_tpu.utils.script_util import create_model

        # use_scale_shift_norm=True matches the FLAG default the script builds
        model = create_model(
            image_size=16, num_channels=32, num_res_blocks=1, channel_mult="1,2",
            learn_sigma=True, attention_resolutions="8", num_heads=2,
            use_scale_shift_norm=True,
        )
        params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)))["params"]
        ckpt_path = str(tmp_path / "model000001.flax")
        save_flax(ckpt_path, params)

        target_embed = str(tmp_path / "target.npz")
        np.savez(target_embed, np.random.RandomState(0).randn(TINY.embed_dim).astype(np.float32))

        out_dir = str(tmp_path / "out")
        os.makedirs(out_dir)
        run_script(
            "clip_guided_sample.py",
            [
                "--image_size", "16", "--num_channels", "32", "--num_res_blocks", "1",
                "--channel_mult", "1,2", "--learn_sigma", "True",
                "--attention_resolutions", "8", "--num_heads", "2",
                "--diffusion_steps", "40", "--noise_schedule", "cosine",
                "--timestep_respacing", "2",
                "--model_path", ckpt_path,
                "--clip_model_path", clip_pt,
                "--target_embed", target_embed,
                "--clip_scale", "10",
                "--batch_size", "1",
                # noisy-x gradient pathway: differentiating the UNet inside
                # every step (pred-x0 pathway) is too heavy to compile on a
                # 1-CPU CI box; the pred-x0 path is covered on TPU
                "--grad_through_pred_xstart", "False",
            ],
            env_extra={
                "OPENAI_LOGDIR": out_dir,
                "OPENAI_LOG_FORMAT": "log",
                "GDC_CLIP_TINY": "1",
            },
        )
        pngs = glob.glob(os.path.join(out_dir, "clip_guided_scale*.png"))
        assert len(pngs) == 1, os.listdir(out_dir)

    def test_clip_guided_text_prompt(self, tmp_path):
        """--text with the vendored BPE vocab: offline text -> embedding ->
        guided samples, no precomputed target npz."""
        import dataclasses

        import torch

        from test_clip_vit import TINY, make_hf_model

        from guided_diffusion_clip_tpu.models.clip_tokenizer import SimpleTokenizer

        vocab = os.path.join(os.path.dirname(__file__), "assets", "tiny_bpe_vocab.txt.gz")
        tok = SimpleTokenizer(bpe_path=vocab, context_length=TINY.context_length)
        cfg = dataclasses.replace(TINY, vocab_size=len(tok.encoder))
        hf = make_hf_model(cfg)
        clip_pt = str(tmp_path / "tiny_clip_text.pt")
        torch.save(hf.state_dict(), clip_pt)

        import jax
        import jax.numpy as jnp

        from guided_diffusion_clip_tpu.utils.checkpoint import save_flax
        from guided_diffusion_clip_tpu.utils.script_util import create_model

        model = create_model(
            image_size=16, num_channels=32, num_res_blocks=1, channel_mult="1,2",
            learn_sigma=True, attention_resolutions="8", num_heads=2,
            use_scale_shift_norm=True,
        )
        params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)))["params"]
        ckpt_path = str(tmp_path / "model000001.flax")
        save_flax(ckpt_path, params)

        out_dir = str(tmp_path / "out_text")
        os.makedirs(out_dir)
        run_script(
            "clip_guided_sample.py",
            [
                "--image_size", "16", "--num_channels", "32", "--num_res_blocks", "1",
                "--channel_mult", "1,2", "--learn_sigma", "True",
                "--attention_resolutions", "8", "--num_heads", "2",
                "--diffusion_steps", "40", "--noise_schedule", "cosine",
                "--timestep_respacing", "2",
                "--model_path", ckpt_path,
                "--clip_model_path", clip_pt,
                "--text", "a photo of a cat",
                "--clip_vocab", vocab,
                "--clip_scale", "10",
                "--batch_size", "1",
                "--grad_through_pred_xstart", "False",
            ],
            env_extra={
                "OPENAI_LOGDIR": out_dir,
                "OPENAI_LOG_FORMAT": "log",
                "GDC_CLIP_TINY": "1",
            },
        )
        pngs = glob.glob(os.path.join(out_dir, "clip_guided_scale*.png"))
        assert len(pngs) == 1, os.listdir(out_dir)
