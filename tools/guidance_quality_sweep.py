"""QUALITY-side sweep of the guidance knobs shipped in deploy256_fast.yaml.

VERDICT r4 weak #5: --guidance_interval and --guidance_cache carried only
cost-side evidence (throughput + same-seed deviation), while the interval
paper's entire point is a QUALITY effect (Kynkaenniemi et al. 2024,
"Applying Guidance in a Limited Interval") — the shipped preset window
[200, 800] encoded an untested trade. This tool measures the quality axis
on a trained proxy, in-environment (real ImageNet FID stays gated on the
unavailable assets; protocol anchor /root/reference/evaluations/README.md).

Protocol (on-chip; 64px ADM-style proxy, the r4 at-scale recipe):
  1. train a generator on structured blobs + a NOISED classifier on the
     blobs' dominant-color label (3-way) — tools/int8_chain_quality.py's
     machinery, same configs;
  2. for each sweep point (guidance_interval x guidance_cache x scale),
     sample N classifier-guided chains with balanced target classes;
  3. score each set against REAL class-matched blob draws — Frechet on the
     trained latent-regression extractor (tools/fidelity.py), floor from
     disjoint real-vs-real pairs — i.e. an actual FID-like protocol where
     the reference is the TRUE distribution, not another sampled set;
  4. report the noised classifier's own accuracy on the samples at t=0
     (did the guidance actually land the target class?).

A config is better when its Frechet-to-real drops while class accuracy
holds. The preset window should be chosen from this table (ROUND_NOTES r5).

Env knobs: GQS_TRAIN_STEPS (600), GQS_SAMPLES (64), GQS_IMAGE (64),
GQS_DIFFUSION_STEPS (1000), GQS_RESPACING (250), GQS_BATCH (16),
GQS_GUIDE_SCALE (10), GQS_FEAT_STEPS (300), GQS_SWEEP (comma list of
"lo:hi:gcN" points; "off" = no interval, e.g. the default
"off:gc1,off:gc2,off:gc4,0:700:gc1,200:800:gc1,200:800:gc2").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.diffusion.guidance import (
    cached_cond_fn,
    classifier_cond_fn,
    interval_cond_fn,
)
from guided_diffusion_clip_tpu.models.unet import (
    EncoderUNetModel,
    UNetConfig,
    UNetModel,
)
from guided_diffusion_clip_tpu.ops.config import set_conv_impl
from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
from guided_diffusion_clip_tpu.utils.checkpoint import setup_compilation_cache
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion
from tools.fidelity import frechet, make_blob_batch, train_feature_extractor

N_CLASSES = 3


def blob_labels(batch: np.ndarray) -> np.ndarray:
    """Dominant-color label — same rule the classifier trains on."""
    return batch.mean(axis=(1, 2)).argmax(axis=-1).astype(np.int32)


def class_matched_real_set(seed: int, n: int, size: int) -> np.ndarray:
    """n real blobs whose labels cycle 0,1,2,... — the class balance the
    guided sets target. Rejection-samples from the generator distribution."""
    rs = np.random.RandomState(seed)
    want = np.arange(n) % N_CLASSES
    out = np.empty((n, size, size, 3), np.float32)
    have = np.zeros(n, bool)
    while not have.all():
        cand = make_blob_batch(rs, 4 * n, size)
        lab = blob_labels(cand)
        for img, lb in zip(cand, lab):
            idx = np.where((~have) & (want == lb))[0]
            if len(idx):
                out[idx[0]] = img
                have[idx[0]] = True
    return out


def parse_sweep(spec: str):
    pts = []
    for tok in spec.split(","):
        parts = tok.strip().split(":")
        gc = 1
        if parts and parts[-1].startswith("gc"):
            gc = int(parts[-1][2:])
            parts = parts[:-1]
        if parts == ["off"] or not parts or parts == [""]:
            interval = None
        else:
            interval = (float(parts[0]), float(parts[1]))
        pts.append((interval, gc))
    return pts


def main():
    t0 = time.time()
    train_steps = int(os.environ.get("GQS_TRAIN_STEPS", 600))
    n_samples = int(os.environ.get("GQS_SAMPLES", 64))
    size = int(os.environ.get("GQS_IMAGE", 64))
    T = int(os.environ.get("GQS_DIFFUSION_STEPS", 1000))
    B = int(os.environ.get("GQS_BATCH", 16))
    respacing = os.environ.get("GQS_RESPACING", "250")
    guide_scale = float(os.environ.get("GQS_GUIDE_SCALE", 10.0))
    sweep = parse_sweep(os.environ.get(
        "GQS_SWEEP", "off:gc1,off:gc2,off:gc4,0:700:gc1,200:800:gc1,200:800:gc2"
    ))

    def note(msg):
        print(f"[gqs +{time.time()-t0:.0f}s] {msg}", file=sys.stderr, flush=True)

    logger.configure_dir(dir="/tmp/guidance_quality_sweep", format_strs=[])
    set_conv_impl("xla")
    # persistent compile cache: relay compiles sporadically wedge >30 min
    # (observed r4/r5); a killed-and-retried run must not re-pay finished ones
    setup_compilation_cache()

    # generator: the r4 at-scale proxy (64px ADM topology at half width —
    # reference script_util.py presets); classifier: the gc-study encoder
    if size >= 64:
        cfg = UNetConfig(
            image_size=size, in_channels=3, model_channels=128, out_channels=3,
            num_res_blocks=2, attention_resolutions=(4, 8),
            channel_mult=(1, 2, 3, 4), num_heads=4, use_scale_shift_norm=True,
            resblock_updown=True,
        )
    else:
        cfg = UNetConfig(
            image_size=size, in_channels=3, model_channels=64, out_channels=3,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_heads=2, use_scale_shift_norm=True,
        )
    sample_dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    model = UNetModel(config=cfg, dtype=jnp.float32)
    model_sample = UNetModel(config=cfg, dtype=sample_dtype)
    diffusion = create_gaussian_diffusion(steps=T, noise_schedule="cosine")
    sample_diffusion = create_gaussian_diffusion(
        steps=T, noise_schedule="cosine", timestep_respacing=respacing
    )

    rs = np.random.RandomState(0)

    def data_gen():
        while True:
            yield make_blob_batch(rs, B, size), {}

    note("training generator")
    loop = TrainLoop(
        model=model, diffusion=diffusion, data=data_gen(), batch_size=B,
        microbatch=-1, lr=2e-3, ema_rate="0.99", log_interval=10**9,
        save_interval=10**9, seed=0,
    )
    for i in range(train_steps):
        b, c = next(loop.data)
        loop.run_step(b, c)
        loop.step += 1
        if i % 100 == 0:
            note(f"generator step {i}")
    loop.flush_metrics()
    ema = loop.ema_params[0]

    note("training noised classifier")
    import optax

    shape = (B, size, size, 3)
    ccfg = UNetConfig(
        image_size=size, in_channels=3,
        model_channels=64 if size >= 64 else 32,
        out_channels=N_CLASSES, num_res_blocks=1,
        attention_resolutions=(4,) if size >= 64 else (2,),
        channel_mult=(1, 2, 3) if size >= 64 else (1, 2),
        num_heads=2, use_scale_shift_norm=True,
    )
    clf = EncoderUNetModel(config=ccfg, pool="adaptive")
    cparams = clf.init(jax.random.key(2), jnp.zeros(shape), jnp.zeros((B,)))["params"]
    copt = optax.adamw(3e-4, weight_decay=0.05)
    copt_state = copt.init(cparams)

    @jax.jit
    def clf_step(cparams, copt_state, x, y, key):
        tkey, nkey = jax.random.split(key)
        t = jax.random.randint(tkey, (x.shape[0],), 0, T)
        xt = diffusion.q_sample(x, t, jax.random.normal(nkey, x.shape))

        def loss_fn(p):
            logits = clf.apply({"params": p}, xt, t.astype(jnp.float32))
            ll = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.take_along_axis(ll, y[:, None], axis=-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(cparams)
        updates, copt_state = copt.update(grads, copt_state, cparams)
        return optax.apply_updates(cparams, updates), copt_state, loss

    ckey = jax.random.key(3)
    for i in range(train_steps):
        xb = make_blob_batch(rs, B, size)
        yb = jnp.asarray(blob_labels(xb))
        ckey, skey = jax.random.split(ckey)
        cparams, copt_state, closs = clf_step(
            cparams, copt_state, jnp.asarray(xb), yb, skey
        )
        if i % 100 == 0:
            note(f"classifier step {i} loss {float(closs):.3f}")

    def clf_fn(x, t):
        return clf.apply({"params": cparams}, x, t)

    # classifier accuracy on CLEAN samples (t=0): guidance efficacy readout
    @jax.jit
    def clf_acc(x, y):
        logits = clf.apply({"params": cparams}, x, jnp.zeros((x.shape[0],)))
        return (logits.argmax(-1) == y).mean()

    guide_y = jnp.arange(B, dtype=jnp.int32) % N_CLASSES

    def make_chain(interval, gc):
        @jax.jit
        def chain(params, key):
            def model_fn(x, t, **kw):
                return model_sample.apply(
                    {"params": params}, x, t,
                    **{k: v for k, v in kw.items() if k != "y"},
                )

            cond = classifier_cond_fn(clf_fn, guide_scale)
            if interval is not None:
                cond = interval_cond_fn(cond, *interval)
            cond_state0 = None
            if gc > 1:
                cond, cond_state0 = cached_cond_fn(cond, gc, shape)
            return sample_diffusion.p_sample_loop(
                model_fn, shape, key, model_kwargs={"y": guide_y},
                cond_fn=cond, cond_state0=cond_state0,
            )

        return chain

    def sample_set(chain, seed0):
        outs = []
        for i in range(-(-n_samples // B)):
            outs.append(np.asarray(chain(ema, jax.random.key(seed0 + i))))
        return np.concatenate(outs)[:n_samples]

    note("training feature extractor")
    feat_steps = int(os.environ.get("GQS_FEAT_STEPS", 300))
    feats_fn, feat_loss = train_feature_extractor(size, steps=feat_steps, log=note)

    # real class-matched reference draws: floor = real-vs-real
    real = {s: class_matched_real_set(1000 + 97 * s, n_samples, size)
            for s in range(3)}
    f_real = {s: feats_fn(v) for s, v in real.items()}
    mu, sd = f_real[0].mean(0), f_real[0].std(0) + 1e-8

    def z(f):
        return (f - mu) / sd

    floor_vals = [
        frechet(z(f_real[0]), z(f_real[1])),
        frechet(z(f_real[0]), z(f_real[2])),
        frechet(z(f_real[1]), z(f_real[2])),
    ]
    result = {
        "config": f"{size}px ch{cfg.model_channels}, {respacing or T}-step "
                  f"ancestral (T={T}), scale {guide_scale}, {train_steps} "
                  f"train steps, {n_samples} samples/set",
        "feat_extractor_final_loss": feat_loss,
        "floor_real_vs_real": {
            "values": floor_vals,
            "mean": float(np.mean(floor_vals)),
            "max": float(np.max(floor_vals)),
        },
        "sweep": [],
    }
    note(f"floor real-vs-real: {floor_vals}")

    want_y = np.arange(n_samples) % N_CLASSES
    for interval, gc in sweep:
        tag = (f"{int(interval[0])}:{int(interval[1])}" if interval else "off") \
            + f":gc{gc}"
        chain = make_chain(interval, gc)
        samples = sample_set(chain, 100)
        fs = z(feats_fn(samples))
        d_real = [frechet(fs, z(f_real[s])) for s in range(3)]
        acc = float(clf_acc(jnp.asarray(samples), jnp.asarray(want_y)))
        row = {
            "point": tag,
            "frechet_to_real": d_real,
            "frechet_to_real_mean": float(np.mean(d_real)),
            "over_floor_max": float(np.mean(d_real) / max(max(floor_vals), 1e-12)),
            "classifier_acc_on_samples": acc,
        }
        result["sweep"].append(row)
        note(f"{tag}: frechet-to-real {np.mean(d_real):.3f} "
             f"(floor max {max(floor_vals):.3f}), acc {acc:.3f}")

    # unguided baseline for context
    @jax.jit
    def unguided(params, key):
        def model_fn(x, t, **kw):
            return model_sample.apply({"params": params}, x, t)
        return sample_diffusion.p_sample_loop(model_fn, shape, key)

    u = np.concatenate([
        np.asarray(unguided(ema, jax.random.key(700 + i)))
        for i in range(-(-n_samples // B))
    ])[:n_samples]
    fu = z(feats_fn(u))
    d_u = [frechet(fu, z(f_real[s])) for s in range(3)]
    result["unguided_frechet_to_real_mean"] = float(np.mean(d_u))
    result["unguided_classifier_acc"] = float(
        clf_acc(jnp.asarray(u), jnp.asarray(want_y))
    )
    result["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
