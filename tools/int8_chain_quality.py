"""Chain-level int8-vs-bf16 quality evidence on a TRAINED model.

The int8 deployment path was previously bounded only per-step at full 256px
scale (tools/int8_quality_check.py: UNet output corr 0.99975, guidance grad
corr 0.999972). A 250-step chain can amplify per-step deviation nonlinearly;
this tool closes that gap with a distribution-level, full-chain experiment
that needs no external weights (reference quality bar: the FID workflow in
evaluations/README.md:56-70):

  1. train a small ADM UNet to convergence-ish on a structured synthetic
     dataset (smooth colored blobs — learnable in a few hundred steps),
  2. sample N full ancestral chains from IDENTICAL seeds with bf16 convs
     and with int8 convs (the deployment fast path),
  3. compare per-sample (corr / rel-RMSE in pixel space) and per-set:
     Frechet distance on a TRAINED domain feature extractor
     (tools/fidelity.py — latent-regression CNN, 32-d standardized
     features), scored against INDEPENDENT base draws, with a multi-pair
     seed-resampling floor AND a positive control (a set sampled from the
     train_steps//8-undertrained EMA snapshot) that must clear the floor —
     the r4 random-Inception Frechet printed 0.0 for every arm in every
     study and is replaced (see fidelity.py's power analysis).

Run on CPU (JAX_PLATFORMS=cpu; int8 XLA convs are platform-independent
numerics) or on the chip. Prints one JSON line; numbers recorded in
ROUND_NOTES.md.

Env knobs: INT8Q_TRAIN_STEPS (400), INT8Q_SAMPLES (64), INT8Q_IMAGE (16;
>=64 switches to an ADM-style deep config: ch128, 2 res blocks, mult
(1,2,3,4), attention at ds 4/8 — the at-scale proxy VERDICT r3 asked for),
INT8Q_DIFFUSION_STEPS (100), INT8Q_BATCH (16), INT8Q_RESPACING ("" = no
respacing; "250"/"ddim25" etc. per diffusion/schedules.py),
INT8Q_SAMPLER ("ancestral" | "ddim"), INT8Q_VARIANT ("int8" = quantized
convs, the default; "dcN" e.g. "dc3" = DeepCache interval-N deep-feature
reuse — fidelity on a TRAINED model, which tools/deep_cache_bench.py's
random-init comparison cannot provide; "gcN" = guidance-gradient caching:
trains a small noised classifier on the blobs' dominant-color label too,
then compares the FULLY-guided chain against the 1-in-N cached-guidance
chain — real trained guidance, same-seed + set-Frechet metrics; "cfgcN" =
CFG uncond-branch caching: trains a clip_feat-conditioned model WITH
cond_dropout, then compares the doubled-batch CFG chain against the
--cfg_cache chain (INT8Q_CFG_SCALE, default 3); or any "+"-composition
such as "int8+dc5+gc2", which measures the DEPLOYMENT STACK as one chain —
int8 convs + DeepCache-5 generator + 1-in-2 cached guidance — against the
fresh fully-guided bf16 reference chain; INT8Q_GUIDE_SCALE, default 10). On a 1-core CPU box use ~150 train steps /
32 samples (hours otherwise); on a TPU chip the defaults run in minutes.
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

from guided_diffusion_clip_tpu.diffusion.deep_cache import (
    deep_cache_model_fn,
    zero_state,
)
from guided_diffusion_clip_tpu.diffusion.guidance import (
    cached_cond_fn,
    cfg_cached_model_fn,
    cfg_cached_state0,
    cfg_model_fn,
    classifier_cond_fn,
    model_fn_dropping_y,
)
from guided_diffusion_clip_tpu.models.unet import (
    EncoderUNetModel,
    UNetConfig,
    UNetModel,
)
from guided_diffusion_clip_tpu.ops.config import set_conv_impl
from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion


# blob generator shared with the fidelity metric (latents drive its
# extractor's regression targets)
from tools.fidelity import (  # noqa: E402
    make_blob_batch,
    score_sets,
    train_feature_extractor,
)


def main():
    t0 = time.time()
    train_steps = int(os.environ.get("INT8Q_TRAIN_STEPS", 400))
    n_samples = int(os.environ.get("INT8Q_SAMPLES", 64))  # 2 chain batches/set
    size = int(os.environ.get("INT8Q_IMAGE", 16))
    T = int(os.environ.get("INT8Q_DIFFUSION_STEPS", 100))
    B = int(os.environ.get("INT8Q_BATCH", 16))
    respacing = os.environ.get("INT8Q_RESPACING", "")
    sampler = os.environ.get("INT8Q_SAMPLER", "ancestral")
    variant = os.environ.get("INT8Q_VARIANT", "int8")
    # "int8" | "dcN" | "gcN" | "cfgcN" | any "+"-composition, e.g.
    # "int8+dc5+gc2" (the deployment stack measured as ONE chain vs the
    # fresh bf16 reference). "cfgcN" trains a clip_feat-conditioned model
    # WITH cond_dropout, then compares the doubled-batch CFG chain against
    # the --cfg_cache chain (uncond branch recomputed 1-in-N steps).
    parts = variant.split("+")
    dc_interval = next((int(p[2:]) for p in parts if p.startswith("dc")), 0)
    cfgc_interval = next((int(p[4:]) for p in parts if p.startswith("cfgc")), 0)
    gc_interval = next((int(p[2:]) for p in parts if p.startswith("gc")), 0)
    use_int8 = "int8" in parts
    assert not (cfgc_interval and dc_interval), "cfgc does not compose with dc"
    assert not (cfgc_interval and gc_interval), "cfgc does not compose with gc"
    guide_scale = float(os.environ.get("INT8Q_GUIDE_SCALE", 10.0))

    logger.configure_dir(dir="/tmp/int8_chain_quality", format_strs=[])
    set_conv_impl("xla")  # training is bf16
    # persistent compile cache: relay compiles sporadically wedge >30 min;
    # a killed-and-retried run must not re-pay the compiles that finished
    from guided_diffusion_clip_tpu.utils.checkpoint import setup_compilation_cache

    setup_compilation_cache()

    if size >= 128:
        # headline-class proxy (VERDICT r4 item 4): attention at ds 4/8/16 =
        # 32/16/8 px attended maps — the SAME attended token counts as the
        # 256px headline config (reference script_util.py presets put
        # attention at 32,16,8 px for both 128 and 256)
        cfg = UNetConfig(
            image_size=size, in_channels=3, model_channels=128, out_channels=3,
            num_res_blocks=2, attention_resolutions=(4, 8, 16),
            channel_mult=(1, 2, 3, 4), num_heads=4, use_scale_shift_norm=True,
            resblock_updown=True,
        )
    elif size >= 64:
        # ADM-style at-scale proxy: the 64px README config's depth/attention
        # topology at half width (reference script_util.py:149-159 presets)
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
    # f32 compute on CPU: XLA:CPU emulates bf16 ~30x slower, and the study
    # measures QUANTIZATION error (int8 vs unquantized), which dominates any
    # bf16-vs-f32 torso difference. On a real TPU backend the sampling model
    # uses the production bf16 torso over the same f32 params.
    import jax as _jax

    sample_dtype = (
        jnp.float32 if _jax.default_backend() == "cpu" else jnp.bfloat16
    )
    if cfgc_interval:
        # clip_feat-conditioned generator (the fork pathway) trained WITH
        # conditioning dropout so CFG has a real unconditional score
        import dataclasses as _dc

        from guided_diffusion_clip_tpu.models.clip_models import UNetModel_clip_feat

        cfg = _dc.replace(cfg, num_classes=16)
        model = UNetModel_clip_feat(cfg, dtype=jnp.float32)
        model_bf16 = UNetModel_clip_feat(cfg, dtype=sample_dtype)
    else:
        model = UNetModel(config=cfg, dtype=jnp.float32)
        model_bf16 = UNetModel(config=cfg, dtype=sample_dtype)
    diffusion = create_gaussian_diffusion(steps=T, noise_schedule="cosine")
    # sampling may respace the trained diffusion (e.g. T=1000 trained,
    # "250" ancestral / "ddim25" sampled — the reference's table configs)
    sample_diffusion = (
        create_gaussian_diffusion(
            steps=T, noise_schedule="cosine", timestep_respacing=respacing
        )
        if respacing
        else diffusion
    )

    rs = np.random.RandomState(0)

    # fixed random projection: blob dominant-color label {0,1,2} -> a 16-d
    # conditioning embedding (the cfgc study's clip_feat stand-in)
    feat_rows = np.random.RandomState(7).randn(3, 16).astype(np.float32)

    def feats_for(batch: np.ndarray) -> np.ndarray:
        labels = batch.mean(axis=(1, 2)).argmax(axis=-1)
        return feat_rows[labels]

    def data_gen():
        while True:
            batch = make_blob_batch(rs, B, size)
            cond = {"clip_feat": feats_for(batch)} if cfgc_interval else {}
            yield batch, cond

    print(f"[int8q +{time.time()-t0:.0f}s] building TrainLoop", file=sys.stderr, flush=True)
    loop = TrainLoop(
        model=model, diffusion=diffusion, data=data_gen(), batch_size=B,
        microbatch=-1, lr=2e-3, ema_rate="0.99", log_interval=10**9,
        save_interval=10**9, seed=0,
        cond_dropout=0.15 if cfgc_interval else 0.0,
    )
    undertrained_ema = None  # positive-control checkpoint (train_steps//8)
    snap_at = max(1, train_steps // 8)
    for i in range(train_steps):
        b, c = next(loop.data)
        loop.run_step(b, c)
        loop.step += 1
        if i + 1 == snap_at:
            undertrained_ema = jax.device_get(loop.ema_params[0])
        if i % 50 == 0:
            print(f"[int8q +{time.time()-t0:.0f}s] train step {i}", file=sys.stderr, flush=True)
    loop.flush_metrics()
    # quick learning check via one extra step's metrics
    print(
        f"[int8q +{time.time()-t0:.0f}s] trained {train_steps} steps",
        file=sys.stderr, flush=True,
    )
    ema = loop.ema_params[0]

    shape = (B, size, size, 3)

    cond_fresh = None
    if gc_interval:
        # ---- guided variant: train a small noised classifier on the blobs'
        # dominant-color label (argmax of per-image channel mean — balanced,
        # learnable), then both sets sample with REAL trained guidance.
        import optax

        n_classes = 3
        ccfg = UNetConfig(
            image_size=size, in_channels=3,
            model_channels=64 if size >= 64 else 32,
            out_channels=n_classes, num_res_blocks=1,
            attention_resolutions=(4,) if size >= 64 else (2,),
            channel_mult=(1, 2, 3) if size >= 64 else (1, 2),
            num_heads=2, use_scale_shift_norm=True,
        )
        clf = EncoderUNetModel(config=ccfg, pool="adaptive")
        cparams = clf.init(
            jax.random.key(2), jnp.zeros(shape), jnp.zeros((B,))
        )["params"]
        copt = optax.adamw(3e-4, weight_decay=0.05)
        copt_state = copt.init(cparams)

        def blob_labels(batch: np.ndarray) -> np.ndarray:
            return batch.mean(axis=(1, 2)).argmax(axis=-1).astype(np.int32)

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
            if i % 50 == 0:
                print(
                    f"[int8q +{time.time()-t0:.0f}s] classifier step {i} "
                    f"loss {float(closs):.3f}",
                    file=sys.stderr, flush=True,
                )

        def clf_fn(x, t):
            return clf.apply({"params": cparams}, x, t)

        cond_fresh = classifier_cond_fn(clf_fn, guide_scale)
        guide_y = jnp.arange(B, dtype=jnp.int32) % n_classes

    loop = (
        sample_diffusion.ddim_sample_loop
        if sampler == "ddim"
        else sample_diffusion.p_sample_loop
    )

    cfg_scale = float(os.environ.get("INT8Q_CFG_SCALE", 3.0))
    cfg_feats = jnp.asarray(feat_rows[np.arange(B) % 3]) if cfgc_interval else None

    def make_chain(use_dc: bool, use_gc: bool = False, use_cfgc: bool = False):
        """Fresh jit under the CURRENT conv impl (read at trace time).

        dc/gc compose: a guided study (gc_interval set) with use_dc runs the
        deep-cached generator under (possibly cached) classifier guidance —
        the classifier_sample.py --deep_cache --guidance_cache stack.
        cfgc: both sets sample the cond_dropout-trained model through CFG;
        the variant caches the uncond branch 1-in-N (--cfg_cache).
        """

        @jax.jit
        def chain(params, key):
            if cfgc_interval:
                def base_fn(x, t, **kw):
                    return model_bf16.apply({"params": params}, x, t, **kw)

                if use_cfgc:
                    sfn = cfg_cached_model_fn(
                        base_fn, cfg_scale, {"clip_feat": 0.0}, cfgc_interval
                    )
                    state0 = cfg_cached_state0(
                        base_fn, jnp.zeros(shape), jnp.zeros((B,), jnp.int32),
                        clip_feat=cfg_feats,
                    )
                    return loop(
                        sfn, shape, key, model_kwargs={"clip_feat": cfg_feats},
                        model_state0=state0,
                    )
                return loop(
                    cfg_model_fn(base_fn, cfg_scale, {"clip_feat": 0.0}),
                    shape, key, model_kwargs={"clip_feat": cfg_feats},
                )
            # generator model_fn: plain or interval-N deep-feature reuse
            # (diffusion/deep_cache.py; same wiring as the CLIs' --deep_cache).
            # The generator is unconditional — strip the guided study's y.
            model_state0 = None
            if use_dc:
                def apply_full(x, t, **kw):
                    return model_bf16.apply(
                        {"params": params}, x, t, cache_mode="full",
                        **{k: v for k, v in kw.items() if k != "y"},
                    )

                def apply_shallow(x, t, deep, **kw):
                    return model_bf16.apply(
                        {"params": params}, x, t, deep_cache=deep,
                        cache_mode="shallow",
                        **{k: v for k, v in kw.items() if k != "y"},
                    )

                model_fn = deep_cache_model_fn(apply_full, apply_shallow, dc_interval)
                model_state0 = zero_state(
                    apply_full, jnp.zeros(shape), jnp.zeros((B,), jnp.int32)
                )
            else:
                def model_fn(x, t, **kw):
                    return model_bf16.apply(
                        {"params": params}, x, t,
                        **{k: v for k, v in kw.items() if k != "y"},
                    )

            if gc_interval:
                # guided study: both sets run trained classifier guidance on
                # the (unconditional) generator; the variant caches the
                # gradient 1-in-N steps
                cond_fn, cond_state0 = cond_fresh, None
                if use_gc:
                    cond_fn, cond_state0 = cached_cond_fn(
                        cond_fresh, gc_interval, shape
                    )
                return loop(
                    model_fn, shape, key, model_kwargs={"y": guide_y},
                    cond_fn=cond_fn, cond_state0=cond_state0,
                    model_state0=model_state0,
                )
            return loop(model_fn, shape, key, model_state0=model_state0)

        return chain

    chains = {}

    def sample_set(name: str, seed0: int, params=None) -> np.ndarray:
        # name: "base" = bf16/xla uncached (fully guided when gcN);
        # "variant" = int8 convs, DeepCache, and/or cached guidance per parts
        set_conv_impl("int8" if (name == "variant" and use_int8) else "xla")
        if name not in chains:
            chains[name] = make_chain(
                use_dc=(name == "variant" and dc_interval > 0),
                use_gc=(name == "variant" and gc_interval > 0),
                use_cfgc=(name == "variant" and cfgc_interval > 0),
            )  # one compile per mode
        chain = chains[name]
        outs = []
        for i in range(-(-n_samples // B)):
            outs.append(
                np.asarray(chain(params if params is not None else ema,
                                 jax.random.key(seed0 + i)))
            )
        return np.concatenate(outs)[:n_samples]

    bf16_a = sample_set("base", 100)
    print(f"[int8q +{time.time()-t0:.0f}s] base set A sampled", file=sys.stderr, flush=True)
    int8_a = sample_set("variant", 100)  # SAME seeds as bf16_a
    print(f"[int8q +{time.time()-t0:.0f}s] variant ({variant}) set sampled", file=sys.stderr, flush=True)
    bf16_b = sample_set("base", 500)  # disjoint seeds: the noise floor
    print(f"[int8q +{time.time()-t0:.0f}s] base set B sampled", file=sys.stderr, flush=True)
    bf16_c = sample_set("base", 900)  # third draw: multi-pair floor spread
    print(f"[int8q +{time.time()-t0:.0f}s] base set C sampled", file=sys.stderr, flush=True)
    # positive control: the base chain from the undertrained EMA snapshot —
    # a genuine distribution shift the set metric MUST detect, else its
    # "variant within floor" verdict carries no information
    posctrl = sample_set("base", 100, params=undertrained_ema)
    print(f"[int8q +{time.time()-t0:.0f}s] positive-control set sampled "
          f"(EMA @ step {snap_at})", file=sys.stderr, flush=True)

    # ---- per-sample, same-seed chain deviation
    flat_b = bf16_a.reshape(n_samples, -1)
    flat_i = int8_a.reshape(n_samples, -1)
    corr = np.array(
        [np.corrcoef(flat_b[i], flat_i[i])[0, 1] for i in range(n_samples)]
    )
    rel_rmse = np.sqrt(((flat_b - flat_i) ** 2).mean(1)) / (flat_b.std(1) + 1e-12)

    # ---- per-set Frechet on the TRAINED domain extractor (tools/fidelity.py)
    # — candidates scored vs INDEPENDENT base draws, multi-pair floor,
    # undertrained positive control. All values unrounded.
    set_conv_impl("xla")
    feat_steps = int(os.environ.get("INT8Q_FEAT_STEPS", 300))
    feats_fn, feat_loss = train_feature_extractor(
        size, steps=feat_steps,
        log=lambda m: print(f"[int8q +{time.time()-t0:.0f}s] {m}",
                            file=sys.stderr, flush=True),
    )
    set_scores = score_sets(feats_fn, {
        "base_a": bf16_a, "base_b": bf16_b, "base_c": bf16_c,
        "variant": int8_a, "undertrained_posctrl": posctrl,
    })
    floor_max = set_scores["floor"]["max"]
    posctrl_sep = set_scores["undertrained_posctrl"]["mean"] > floor_max
    variant_within = set_scores["variant"]["mean"] <= floor_max

    chain_desc = respacing or str(T)
    result = {
        "config": f"{size}px ch{cfg.model_channels} ADM UNet, "
                  f"{chain_desc}-step {sampler} chain (T={T}), "
                  f"{train_steps} train steps, {n_samples} samples/set",
        "variant": variant,
        "same_seed_pixel_corr_mean": round(float(corr.mean()), 6),
        "same_seed_pixel_corr_min": round(float(corr.min()), 6),
        "same_seed_rel_rmse_mean": round(float(rel_rmse.mean()), 5),
        "same_seed_rel_rmse_max": round(float(rel_rmse.max()), 5),
        "set_frechet": set_scores,
        "feat_extractor_final_loss": feat_loss,
        # the set-level verdict is only meaningful if the positive control
        # separates: an undertrained-EMA set the metric MUST flag
        "posctrl_separated": bool(posctrl_sep),
        "variant_within_floor": bool(variant_within),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
