"""On-chip serve.py latency datapoint (VERDICT r3 item 9).

Launches scripts/serve.py with the ADM 256px config (random-init checkpoint —
serving latency is weight-independent), batch 8, ddim25, int8 fast path, then
measures warm single-request latency and sustained requests/min from a client
loop. Prints one JSON line.

Env: SB_BATCH (8), SB_IMAGE_SIZE (256), SB_RESPACING (ddim25),
SB_CONV_IMPL (int8), SB_REQUESTS (6), SB_NUM_SAMPLES (= batch).

Concurrency/coalescing mode: SB_COALESCE_MS > 0 starts the server with
--coalesce_ms and additionally measures SB_CONCURRENCY (default 4) parallel
clients each requesting SB_NUM_SAMPLES samples — with coalescing they pack
into ceil(concurrency*n/B) dispatches instead of queuing serially.
"""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_ckpt(path: str, size: int, ch: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from guided_diffusion_clip_tpu.utils.checkpoint import save_flax
    from guided_diffusion_clip_tpu.utils.script_util import (
        create_model_and_diffusion,
        model_and_diffusion_defaults,
    )

    kw = model_and_diffusion_defaults()
    kw.update(
        image_size=size, num_channels=ch, num_res_blocks=2,
        attention_resolutions="32,16,8", num_heads=4, num_head_channels=64,
        use_scale_shift_norm=True, resblock_updown=True, learn_sigma=True,
        class_cond=False, use_fp16=True, diffusion_steps=1000,
        noise_schedule="linear",
    )
    model, _ = create_model_and_diffusion(**kw)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)), jnp.zeros((1,)))
    )["params"]
    rs = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda s: (rs.standard_normal(s.shape) * 0.02).astype(s.dtype), shapes
    )
    save_flax(path, params)


def main() -> None:
    t0 = time.time()
    B = int(os.environ.get("SB_BATCH", 8))
    size = int(os.environ.get("SB_IMAGE_SIZE", 256))
    respacing = os.environ.get("SB_RESPACING", "ddim25")
    conv_impl = os.environ.get("SB_CONV_IMPL", "int8")
    n_req = int(os.environ.get("SB_REQUESTS", 6))
    n_samp = int(os.environ.get("SB_NUM_SAMPLES", B))
    ch = int(os.environ.get("SB_CH", 256 if size == 256 else 192))
    coalesce_ms = float(os.environ.get("SB_COALESCE_MS", 0))
    concurrency = int(os.environ.get("SB_CONCURRENCY", 4))
    buckets = os.environ.get("SB_BUCKETS", "")  # e.g. "1,2,4": also measures
    # per-bucket small-request latency (--batch_buckets routing)

    ckpt = f"/tmp/serve_bench_ckpt_{size}_{ch}.flax"  # config-keyed: a stale
    # smoke-config file must never be served to a different model shape
    if not os.path.exists(ckpt):
        print(f"[sb +{time.time()-t0:.0f}s] writing random-init ckpt", file=sys.stderr, flush=True)
        _make_ckpt(ckpt, size, ch)

    port = _free_port()
    proc = subprocess.Popen(
        [
            sys.executable, os.path.join(REPO, "scripts", "serve.py"),
            "--model_path", ckpt,
            "--image_size", str(size), "--num_channels", str(ch),
            "--num_res_blocks", "2", "--attention_resolutions", "32,16,8",
            "--num_heads", "4", "--num_head_channels", "64",
            "--use_scale_shift_norm", "True", "--resblock_updown", "True",
            "--learn_sigma", "True", "--class_cond", "False",
            "--use_fp16", "True", "--diffusion_steps", "1000",
            "--noise_schedule", "linear",
            "--timestep_respacing", respacing,
            "--conv_impl", conv_impl,
            "--batch_size", str(B),
            "--coalesce_ms", str(coalesce_ms),
            "--batch_buckets", buckets,
            "--port", str(port),
        ],
        cwd=REPO,
        env=dict(os.environ, OPENAI_LOGDIR="/tmp/serve_bench_log"),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        # health: the warm compile through the relay can take minutes
        budget = float(os.environ.get("SB_HEALTH_BUDGET", 900))
        compiled_at = None
        while time.time() - t0 < budget:
            if proc.poll() is not None:
                out = proc.stdout.read().decode(errors="replace")
                raise SystemExit(f"server died rc={proc.returncode}:\n{out[-3000:]}")
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5
                ) as r:
                    if json.loads(r.read()).get("compiled"):
                        compiled_at = time.time() - t0
                        break
            except (urllib.error.URLError, ConnectionError, OSError):
                pass
            time.sleep(2.0)
        if compiled_at is None:
            raise SystemExit("server never became healthy")
        print(f"[sb +{time.time()-t0:.0f}s] compiled", file=sys.stderr, flush=True)

        def request(seed: int, n: int = n_samp) -> float:
            payload = json.dumps(
                {"num_samples": n, "seed": seed, "format": "npz"}
            ).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/sample", data=payload,
                headers={"Content-Type": "application/json"}, method="POST",
            )
            t = time.time()
            with urllib.request.urlopen(req, timeout=600) as r:
                r.read()
            return time.time() - t

        warm_s = request(0)  # first request may still re-trace nothing; warm anyway
        lat = [request(1 + i) for i in range(n_req)]
        lat_best = min(lat)
        lat_med = sorted(lat)[len(lat) // 2]
        # sustained: back-to-back requests, one client
        t = time.time()
        for i in range(n_req):
            request(100 + i)
        sustained_s = (time.time() - t) / n_req

        extra = {}
        if buckets:
            # small-request latency per bucket (the --batch_buckets payoff):
            # without buckets an n=1 request pays the full-batch chain
            extra["batch_buckets"] = buckets
            for nb in sorted({int(b) for b in buckets.split(",") if b} | {B}):
                times = [request(2000 + nb * 10 + i, nb) for i in range(3)]
                extra[f"latency_n{nb}_best_s"] = round(min(times), 3)
        if coalesce_ms > 0:
            import concurrent.futures

            # N parallel clients, repeated n_req rounds: with coalescing the
            # server packs each round's requests into as few dispatches as
            # the compiled batch allows
            def healthz():
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5
                ) as r:
                    return json.loads(r.read())

            d0 = healthz()["dispatches"]
            t = time.time()
            with concurrent.futures.ThreadPoolExecutor(concurrency) as pool:
                for rnd in range(n_req):
                    list(pool.map(
                        request, [1000 + rnd * concurrency + i for i in range(concurrency)]
                    ))
            conc_s = (time.time() - t) / n_req
            h = healthz()
            extra.update({
                "coalesce_ms": coalesce_ms,
                "concurrency": concurrency,
                "concurrent_round_s": round(conc_s, 2),
                "concurrent_samples_per_min": round(
                    concurrency * n_samp * 60.0 / conc_s, 2
                ),
                "dispatches_for_concurrent_rounds": h["dispatches"] - d0,
                "coalesced_requests": h["coalesced_requests"],
            })

        print(json.dumps({
            "config": f"serve.py {size}px {respacing} {conv_impl}, batch {B}, "
                      f"{n_samp} samples/request, npz response",
            "compile_to_healthy_s": round(compiled_at, 1),
            "first_request_s": round(warm_s, 2),
            "warm_latency_best_s": round(lat_best, 2),
            "warm_latency_median_s": round(lat_med, 2),
            "sustained_sec_per_request": round(sustained_s, 2),
            "requests_per_min": round(60.0 / sustained_s, 2),
            "samples_per_min": round(n_samp * 60.0 / sustained_s, 2),
            **extra,
            "known_limit": (
                "requests coalesce into shared dispatches (--coalesce_ms)"
                if coalesce_ms > 0 else
                "single in-flight request (device lock); enable --coalesce_ms "
                "to pack concurrent requests into one dispatch"
            ),
        }))
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
