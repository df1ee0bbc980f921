"""Warm-compiled HTTP sampling server — the production-serving entry point.

The reference has no serving story (generation is batch CLIs only); on TPU
the expensive part of "sample on demand" is the first XLA compile of the
chain (minutes through remote toolchains), after which a request is one
device dispatch. This server pays the compile ONCE at startup (a warmup
chain at the fixed serving batch size), then answers requests from the
cached executable:

    python scripts/serve.py --model_path run/model010000.flax \
        --image_size 64 --num_channels 192 ... --timestep_respacing ddim25 \
        --batch_size 8 --port 8080

    GET  /healthz            -> {"ok": true, "compiled": true, ...}
    POST /sample             <- {"num_samples": 4, "seed": 7,
                                 "clip_feat": [[...512 floats...], ...]
                                 (optional on conditioned models),
                                 "format": "npz" | "png_base64"}
                             -> .npz bytes {"arr_0": uint8 [n,H,W,3]}
                                or JSON {"png_base64": ..., "n": n}

Requests are padded to the compiled batch and sliced back — or, when larger
than the batch, chunked across dispatches of the same executable (capped by
--max_request, default 8x the batch) — so every request reuses the one
compiled program regardless of its size. A lock
serializes device use; decode/encode runs outside it. Sampler selection,
int8 inference, DeepCache, and classifier-free guidance (--cfg_scale, a
server-level knob — the CFG chain is a different program) compose exactly
like scripts/image_sample.py.

RNG is PER-SAMPLE (the chain is vmapped over per-sample fold_in keys), so a
request's bytes depend only on its own (seed, cond) — not on padding or on
whatever it was co-batched with. That makes request COALESCING safe:
with --coalesce_ms W > 0, requests that arrive while the device is busy (or
within a W-ms window) are packed into ONE dispatch of the compiled batch and
the slices distributed back — concurrent small requests share a chain
instead of queuing serially behind the device lock.
"""

import argparse
import base64
import collections
import io
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_diffusion_clip_tpu.utils.platform import honor_env_platform

honor_env_platform()

from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from guided_diffusion_clip_tpu.diffusion.deep_cache import (
    deep_cache_model_fn,
    zero_state,
)
from guided_diffusion_clip_tpu.diffusion.guidance import (
    cfg_cached_model_fn,
    cfg_cached_state0,
    cfg_model_fn,
    parse_guidance_interval,
)
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.checkpoint import (
    init_template,
    load_params,
    setup_compilation_cache,
)
from guided_diffusion_clip_tpu.utils.saving_imgs import tensor2img
from guided_diffusion_clip_tpu.utils.script_util import (
    add_dict_to_argparser,
    args_to_dict,
    create_model_and_diffusion,
    model_and_diffusion_defaults,
    parse_yaml,
    resolve_sampler,
)


class Sampler:
    """Owns the model, the one compiled chain, and the device lock."""

    def __init__(self, args):
        from guided_diffusion_clip_tpu.ops.config import int8_emit, set_conv_impl

        set_conv_impl(getattr(args, "conv_impl", "auto"))
        self.args = args
        self.batch = args.batch_size
        self.shape = (self.batch, args.image_size, args.image_size, 3)
        model, diffusion = create_model_and_diffusion(
            **args_to_dict(args, model_and_diffusion_defaults().keys())
        )
        self.steps = diffusion.num_timesteps
        setup_compilation_cache()
        template = init_template(
            model, jnp.zeros(self.shape), jnp.zeros((self.batch,)),
            clip_feat=jnp.zeros((self.batch, 512)) if args.class_cond else None,
        )
        self.params = jax.device_put(load_params(args.model_path, template))
        # the fork's conditioning is the 512-d CLIP embedding (class_cond
        # repurposes NUM_CLASSES=512, reference script_util.py:9)
        self.cond_key = "clip_feat" if args.class_cond else None
        loop = resolve_sampler(diffusion, args)
        cfg_scale = float(getattr(args, "cfg_scale", 0.0))
        cfg_cache_n = int(getattr(args, "cfg_cache", 0))
        deep_cache_n = int(getattr(args, "deep_cache", 0))
        g_interval = parse_guidance_interval(getattr(args, "guidance_interval", ""))
        if cfg_scale and self.cond_key is None:
            raise SystemExit("--cfg_scale needs a conditioned model (--class_cond)")
        if g_interval is not None and not cfg_scale:
            raise SystemExit("serve.py: --guidance_interval gates CFG; it needs --cfg_scale")
        if cfg_cache_n > 1 and not cfg_scale:
            raise SystemExit("serve.py: --cfg_cache caches the CFG uncond branch; it needs --cfg_scale")
        if cfg_scale and deep_cache_n > 1:
            raise SystemExit(
                "serve.py: use --deep_cache or --cfg_scale, not both "
                "(image_sample.py composes them if you need that)"
            )

        def run_chain(params, seeds, subidx, feats):
            # batch-polymorphic: every shape derives from seeds.shape[0], so
            # jit retraces per BUCKET size (see --batch_buckets) and each
            # bucket gets its own cached executable
            B = seeds.shape[0]
            shape = (B, args.image_size, args.image_size, 3)
            # PER-SAMPLE RNG on the merged batch: the loops accept a [B] key
            # vector and vmap only the noise draws over it (sampling.py
            # _keys_batched), so sample i's bytes depend only on
            # (seeds[i], subidx[i], feats[i]) — padding slots and co-batched
            # requests are semantically invisible, which is what makes
            # coalescing safe. (vmapping the whole chain instead measured
            # 44% slower on v5e — the model itself stays batch-level.)
            keys = jax.vmap(
                lambda s, i: jax.random.fold_in(jax.random.key(s), i)
            )(seeds, subidx)
            model_kwargs = {"clip_feat": feats} if self.cond_key else {}

            def model_fn(x, t, **kw):
                with int8_emit("s8"):
                    return model.apply({"params": params}, x, t, **kw)

            mf, state0 = model_fn, None
            if cfg_scale:
                if cfg_cache_n > 1:
                    # cached uncond branch: (1 + 1/N)x model cost per step
                    mf = cfg_cached_model_fn(
                        model_fn, cfg_scale, {"clip_feat": 0.0},
                        cfg_cache_n, interval=g_interval,
                    )
                    state0 = cfg_cached_state0(
                        model_fn, jnp.zeros(shape),
                        jnp.zeros((B,), jnp.int32), **model_kwargs,
                    )
                else:
                    mf = cfg_model_fn(
                        model_fn, cfg_scale, {"clip_feat": 0.0}, interval=g_interval
                    )
            if deep_cache_n > 1:
                def apply_full(x, t, **kw):
                    with int8_emit("s8"):
                        return model.apply({"params": params}, x, t,
                                           cache_mode="full", **kw)

                def apply_shallow(x, t, deep, **kw):
                    with int8_emit("s8"):
                        return model.apply({"params": params}, x, t,
                                           deep_cache=deep,
                                           cache_mode="shallow", **kw)

                mf = deep_cache_model_fn(
                    apply_full, apply_shallow, deep_cache_n
                )
                state0 = zero_state(
                    apply_full, jnp.zeros(shape),
                    jnp.zeros((B,), jnp.int32),
                )
            out = loop(
                mf, shape, keys, clip_denoised=True,
                model_kwargs=model_kwargs, model_state0=state0,
            )
            return ((out + 1) * 127.5).clip(0, 255).astype(jnp.uint8)

        self._chain = jax.jit(run_chain)
        self._lock = threading.Lock()
        self.compiled = False
        # --batch_buckets: extra SMALLER compiled batch shapes. A request (or
        # coalesced group) pads only to the smallest bucket that fits instead
        # of the full batch, so small requests stop paying full-batch chain
        # latency. Each bucket is one more executable (compiled at warmup);
        # per-sample RNG keeps bytes identical across bucket choices.
        raw = str(getattr(args, "batch_buckets", "") or "")
        extra = sorted({int(b) for b in raw.split(",") if b.strip()})
        if any(b < 1 or b > self.batch for b in extra):
            raise SystemExit(
                f"--batch_buckets entries must be in [1, batch_size="
                f"{self.batch}], got {extra}"
            )
        self.buckets = sorted(set(extra) | {self.batch})
        self.bucket_latency: dict = {}  # bucket -> measured warm s (warmup)
        # request coalescing (see module docstring); 0 = off
        self.max_request = int(getattr(args, "max_request", 0)) or 8 * self.batch
        if self.max_request < 1:
            raise SystemExit(
                f"--max_request must be >= 1 (got {self.max_request}); note a "
                f"request above batch_size ({self.batch}) is served by several "
                f"serial chain dispatches behind one HTTP response, so large "
                f"values trade client latency for fewer round-trips"
            )
        self.coalesce_ms = float(getattr(args, "coalesce_ms", 0.0))
        self.dispatches = 0
        self.coalesced_requests = 0
        if self.coalesce_ms > 0:
            self._queue: "collections.deque" = collections.deque()
            self._queue_cv = threading.Condition()
            threading.Thread(target=self._dispatcher, daemon=True).start()

    def warmup(self):
        for b in self.buckets:
            logger.log(f"serve: compiling the chain (batch {b}, "
                       f"{self.steps} steps)...")
            out = self.sample(b, seed=0, cond=None)
            assert out.shape == (b,) + self.shape[1:], out.shape
            # time one WARM chain per bucket: on TPU, smaller is not faster —
            # XLA hits per-shape cliffs (measured on v5e at 256px ddim25:
            # batch 4 runs 4.0s vs batch 8's 2.5s — 1.6x SLOWER in absolute
            # time; tools/batch_sweep_probe.py, ROUND_NOTES r5). Routing
            # picks the measured-fastest bucket that fits, so a pathological
            # shape is automatically bypassed.
            t0 = time.time()
            self.sample(b, seed=0, cond=None)
            self.bucket_latency[b] = time.time() - t0
        self.compiled = True
        lat = {b: round(self.bucket_latency[b], 3) for b in self.buckets}
        routed = sorted({self._bucket_for(n) for n in range(1, self.batch + 1)})
        logger.log(
            f"serve: chain compiled for buckets {self.buckets}; measured "
            f"warm latency {lat}; effective buckets after latency routing "
            f"{routed}; serving"
        )

    def _validate(self, n, cond):
        """-> per-sample feat array [n, 512] (zeros when unconditioned)."""
        if not 1 <= n <= self.max_request:
            raise ValueError(
                f"num_samples must be in [1, {self.max_request}] (requests "
                f"larger than the compiled batch of {self.batch} are chunked "
                f"across dispatches, capped at --max_request)"
            )
        feats = np.zeros((n, 512), np.float32)
        if cond is not None and self.cond_key is not None:
            arr = np.asarray(cond, np.float32)
            if arr.shape != (n, 512):
                raise ValueError(
                    f"clip_feat must be [{n}, 512], got {list(arr.shape)}"
                )
            feats = arr
        return feats

    def _bucket_for(self, n: int) -> int:
        """Fastest compiled batch shape that fits n samples.

        By measured warm latency when available (post-warmup), else by size.
        Size is only a proxy: XLA per-shape cliffs can make a smaller batch
        SLOWER in absolute time (see warmup note), so the measured map wins;
        ties break toward the smaller shape."""
        fits = [b for b in self.buckets if b >= n]
        measured = [b for b in fits if b in self.bucket_latency]
        if measured:
            return min(measured, key=lambda b: (self.bucket_latency[b], b))
        return min(fits)

    def _run_batch(self, seeds, subidx, feats):
        """Pad per-sample arrays to the smallest fitting bucket and dispatch
        ONCE (the bucket's executable is cached per shape by jit)."""
        n = len(seeds)
        pad = self._bucket_for(n) - n
        seeds = np.pad(np.asarray(seeds, np.int32), (0, pad))
        subidx = np.pad(np.asarray(subidx, np.int32), (0, pad))
        feats = np.pad(np.asarray(feats, np.float32), ((0, pad), (0, 0)))
        with self._lock:
            self.dispatches += 1
            out = np.asarray(jax.block_until_ready(self._chain(
                self.params, jnp.asarray(seeds), jnp.asarray(subidx),
                jnp.asarray(feats),
            )))
        return out[:n]

    def sample(self, n, seed, cond):
        feats = self._validate(n, cond)
        seeds = np.full((n,), int(seed), np.int32)
        subidx = np.arange(n, dtype=np.int32)
        # Requests larger than the compiled batch are CHUNKED across
        # dispatches of the one executable. Per-sample RNG (bytes depend only
        # on (seed, subidx, feat)) makes the chunked result bit-identical to
        # any other packing of the same samples.
        chunks = [
            slice(i, min(i + self.batch, n)) for i in range(0, n, self.batch)
        ]
        if self.coalesce_ms <= 0 or not self.compiled:
            return np.concatenate(
                [self._run_batch(seeds[s], subidx[s], feats[s]) for s in chunks]
            )
        pendings = [
            _Pending(s.stop - s.start, seeds[s], subidx[s], feats[s])
            for s in chunks
        ]
        with self._queue_cv:
            self._queue.extend(pendings)
            self._queue_cv.notify()
        for pending in pendings:
            pending.event.wait()
            if pending.error is not None:
                raise pending.error
        return np.concatenate([p.result for p in pendings])

    def _dispatcher(self):
        """Coalescing loop: the first queued request opens a --coalesce_ms
        window; whatever else fits in the compiled batch by the deadline
        rides the same dispatch. Per-sample RNG keeps every request's bytes
        identical to a solo run."""
        while True:
            with self._queue_cv:
                while not self._queue:
                    self._queue_cv.wait()
                items = [self._queue.popleft()]
                used = items[0].n
                deadline = time.monotonic() + self.coalesce_ms / 1000.0
                while used < self.batch:
                    if self._queue and self._queue[0].n <= self.batch - used:
                        items.append(self._queue.popleft())
                        used += items[-1].n
                        continue
                    remaining = deadline - time.monotonic()
                    if remaining <= 0 or self._queue:
                        break  # window over, or the head doesn't fit
                    self._queue_cv.wait(timeout=remaining)
            if len(items) > 1:
                self.coalesced_requests += len(items)
            try:
                out = self._run_batch(
                    np.concatenate([i.seeds for i in items]),
                    np.concatenate([i.subidx for i in items]),
                    np.concatenate([i.feats for i in items]),
                )
                off = 0
                for i in items:
                    i.result = out[off:off + i.n]
                    off += i.n
            except Exception as e:  # deliver failures to the waiters
                for i in items:
                    i.error = e
            for i in items:
                i.event.set()


class _Pending:
    """One queued request awaiting a coalesced dispatch."""

    def __init__(self, n, seeds, subidx, feats):
        self.n, self.seeds, self.subidx, self.feats = n, seeds, subidx, feats
        self.event = threading.Event()
        self.result = None
        self.error: Exception | None = None


def _make_handler(sampler: Sampler):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # route access logs through ours
            logger.log(f"serve: {self.address_string()} {fmt % a}")

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._json(404, {"error": "unknown path"})
            a = sampler.args
            self._json(200, {
                "ok": True,
                "compiled": sampler.compiled,
                "image_size": a.image_size,
                "batch_size": sampler.batch,
                "steps": sampler.steps,
                "cond": sampler.cond_key,
                "sampler": getattr(a, "sampler", "") or
                           ("ddim" if a.use_ddim else "ancestral"),
                "coalesce_ms": sampler.coalesce_ms,
                "batch_buckets": sampler.buckets,
                "bucket_latency_s": {
                    str(b): round(s, 3)
                    for b, s in sorted(sampler.bucket_latency.items())
                },
                "max_request": sampler.max_request,
                "dispatches": sampler.dispatches,
                "coalesced_requests": sampler.coalesced_requests,
            })

        def do_POST(self):
            if self.path != "/sample":
                return self._json(404, {"error": "unknown path"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                n = int(req.get("num_samples", 1))
                seed = int(req.get("seed", 0))
                cond = req.get(sampler.cond_key) if sampler.cond_key else None
                fmt = req.get("format", "npz")
                imgs = sampler.sample(n, seed, cond)
            except (ValueError, KeyError, TypeError, json.JSONDecodeError) as e:
                return self._json(400, {"error": str(e)})
            if fmt == "png_base64":
                import cv2

                grid = tensor2img(imgs.astype(np.float32) / 127.5 - 1.0)
                ok, buf = cv2.imencode(".png", grid[..., ::-1])
                assert ok
                return self._json(200, {
                    "n": int(n),
                    "png_base64": base64.b64encode(buf.tobytes()).decode(),
                })
            bio = io.BytesIO()
            np.savez(bio, imgs)
            body = bio.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main():
    args = create_argparser().parse_args()
    args = parse_yaml(args)
    if int(getattr(args, "max_request", 0)) < 0:
        raise SystemExit(
            f"--max_request must be >= 1 (got {args.max_request}); 0 means "
            f"the default 8x batch_size"
        )
    logger.configure(args=args)
    sampler = Sampler(args)
    sampler.warmup()
    server = ThreadingHTTPServer(
        (args.host, args.port), _make_handler(sampler)
    )
    logger.log(f"serve: listening on {args.host}:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


def create_argparser():
    defaults = dict(
        model_path="",
        host="127.0.0.1",
        port=8080,
        batch_size=8,
        seed=0,
        use_ddim=False,
        sampler="",        # "", ancestral, ddim, dpm++2m
        conv_impl="auto",  # int8 for the measured fast path
        cfg_scale=0.0,     # classifier-free guidance (server-level knob)
        cfg_cache=0,       # N>1: recompute the CFG uncond branch 1-in-N steps
        guidance_interval="",  # "lo,hi": CFG only for t in [lo,hi] (orig units)
        deep_cache=0,      # deep-feature reuse interval
        coalesce_ms=0.0,   # >0: batch concurrent requests into one dispatch
        batch_buckets="",  # e.g. "1,2,4": extra smaller compiled batch shapes;
                           # small requests route to the smallest fitting
                           # bucket instead of paying full-batch latency
                           # (one warmup compile per bucket)
        max_request=0,     # per-request sample cap; 0 = 8x batch_size. Requests
                           # above batch_size run several serial chain dispatches
                           # behind ONE response — large caps can exceed client
                           # timeouts on long chains.
        main_path="",
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)  # also adds --config-file / -d
    return parser


if __name__ == "__main__":
    main()
