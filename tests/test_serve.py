"""HTTP sampling server (scripts/serve.py): warm compile, request padding,
npz/png responses, conditioning validation."""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


TINY = [
    "--image_size", "16", "--num_channels", "32", "--num_res_blocks", "1",
    "--channel_mult", "1,2", "--num_heads", "2", "--attention_resolutions", "4",
    "--diffusion_steps", "10", "--noise_schedule", "cosine",
    "--learn_sigma", "True", "--class_cond", "True",
]


def _make_ckpt(path):
    import jax
    import jax.numpy as jnp

    from guided_diffusion_clip_tpu.utils.checkpoint import save_flax
    from guided_diffusion_clip_tpu.utils.script_util import (
        create_model_and_diffusion,
        model_and_diffusion_defaults,
    )

    kw = model_and_diffusion_defaults()
    kw.update(
        image_size=16, num_channels=32, num_res_blocks=1, channel_mult="1,2",
        num_heads=2, attention_resolutions="4", diffusion_steps=10,
        noise_schedule="cosine", learn_sigma=True, class_cond=True,
    )
    model, _ = create_model_and_diffusion(**kw)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)),
        clip_feat=jnp.zeros((1, 512)),
    )["params"]
    save_flax(path, params)


def _wait_healthy(port, proc, budget=420):
    t0 = time.time()
    while time.time() - t0 < budget:
        if proc.poll() is not None:
            out = proc.stdout.read().decode(errors="replace")
            raise AssertionError(f"server died rc={proc.returncode}:\n{out[-4000:]}")
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=5
            ) as r:
                h = json.loads(r.read())
                if h.get("compiled"):
                    return h
        except (urllib.error.URLError, ConnectionError, OSError):
            pass
        time.sleep(1.0)
    raise AssertionError("server never became healthy")


def _post(port, payload, path="/sample"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=120)


@pytest.mark.slow
@pytest.mark.timeout(600)
def test_serve_end_to_end(tmp_path):
    ckpt = str(tmp_path / "model000001.flax")
    _make_ckpt(ckpt)
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", OPENAI_LOGDIR=str(tmp_path / "log"))
    proc = subprocess.Popen(
        [
            sys.executable, os.path.join(REPO, "scripts", "serve.py"),
            *TINY,
            "--model_path", ckpt,
            "--batch_size", "4",
            "--timestep_respacing", "5",
            # server-level CFG with the cached uncond branch: per-sample
            # determinism/chunking invariants must hold under it too
            "--cfg_scale", "1.5",
            "--cfg_cache", "2",
            "--port", str(port),
        ],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        h = _wait_healthy(port, proc)
        assert h["batch_size"] == 4 and h["image_size"] == 16
        assert h["cond"] == "clip_feat" and h["steps"] == 5

        # npz request smaller than the compiled batch (padding + slice)
        rs = np.random.RandomState(0)
        feat = rs.randn(2, 512).astype(np.float32)
        with _post(port, {
            "num_samples": 2, "seed": 3, "clip_feat": feat.tolist(),
        }) as r:
            assert r.status == 200
            import io

            arr = np.load(io.BytesIO(r.read()))["arr_0"]
        assert arr.shape == (2, 16, 16, 3) and arr.dtype == np.uint8

        # determinism: same seed+cond -> same bytes; different seed differs
        with _post(port, {"num_samples": 2, "seed": 3, "clip_feat": feat.tolist()}) as r:
            import io

            arr2 = np.load(io.BytesIO(r.read()))["arr_0"]
        np.testing.assert_array_equal(arr, arr2)
        with _post(port, {"num_samples": 2, "seed": 4, "clip_feat": feat.tolist()}) as r:
            import io

            arr3 = np.load(io.BytesIO(r.read()))["arr_0"]
        assert (arr3 != arr).any()

        # png_base64 format
        with _post(port, {"num_samples": 1, "format": "png_base64"}) as r:
            body = json.loads(r.read())
        assert body["n"] == 1 and len(body["png_base64"]) > 100

        # a request LARGER than the compiled batch is chunked across
        # dispatches; per-sample RNG makes the shared prefix bit-identical
        # to the solo 2-sample request above (same seed, same feat rows)
        feat6 = np.concatenate([feat, rs.randn(4, 512).astype(np.float32)])
        with _post(port, {
            "num_samples": 6, "seed": 3, "clip_feat": feat6.tolist(),
        }) as r:
            import io

            arr6 = np.load(io.BytesIO(r.read()))["arr_0"]
        assert arr6.shape == (6, 16, 16, 3)
        np.testing.assert_array_equal(arr6[:2], arr)

        # validation errors come back as 400, server stays up
        # (99 > max_request = 8 x batch 4 = 32, even with chunking)
        try:
            _post(port, {"num_samples": 99})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            _post(port, {"num_samples": 2, "clip_feat": [[1.0, 2.0]]})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=5
        ) as r:
            assert json.loads(r.read())["ok"]
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()


@pytest.mark.slow
@pytest.mark.timeout(600)
def test_serve_coalescing(tmp_path):
    """--coalesce_ms packs concurrent requests into one device dispatch, and
    per-sample RNG keeps each request's bytes identical to a solo run."""
    import concurrent.futures
    import io

    ckpt = str(tmp_path / "model000001.flax")
    _make_ckpt(ckpt)
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", OPENAI_LOGDIR=str(tmp_path / "log"))
    proc = subprocess.Popen(
        [
            sys.executable, os.path.join(REPO, "scripts", "serve.py"),
            *TINY,
            "--model_path", ckpt,
            "--batch_size", "4",
            "--timestep_respacing", "5",
            "--coalesce_ms", "400",
            "--port", str(port),
        ],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )

    def fetch(seed):
        with _post(port, {"num_samples": 2, "seed": seed}) as r:
            return np.load(io.BytesIO(r.read()))["arr_0"]

    try:
        h = _wait_healthy(port, proc)
        assert h["coalesce_ms"] == 400

        # solo baselines (sequential -> separate dispatches)
        solo3, solo9 = fetch(3), fetch(9)
        assert (solo3 != solo9).any()
        d0 = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=5).read())["dispatches"]

        # two concurrent 2-sample requests (batch 4) -> ONE coalesced dispatch
        with concurrent.futures.ThreadPoolExecutor(2) as pool:
            f3 = pool.submit(fetch, 3)
            f9 = pool.submit(fetch, 9)
            co3, co9 = f3.result(), f9.result()
        h2 = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=5).read())
        assert h2["dispatches"] == d0 + 1, (d0, h2)
        assert h2["coalesced_requests"] >= 2

        # coalesced bytes == solo bytes: co-batching is invisible
        np.testing.assert_array_equal(co3, solo3)
        np.testing.assert_array_equal(co9, solo9)

        # a CHUNKED request (6 > batch 4) through the coalescing queue:
        # chunks ride separate dispatches, prefix bytes still equal solo
        with _post(port, {"num_samples": 6, "seed": 3}) as r:
            arr6 = np.load(io.BytesIO(r.read()))["arr_0"]
        assert arr6.shape[0] == 6
        np.testing.assert_array_equal(arr6[:2], solo3)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()


@pytest.mark.slow
@pytest.mark.timeout(600)
def test_serve_batch_buckets(tmp_path):
    """--batch_buckets compiles extra smaller batch shapes; a small request
    routes to the smallest fitting bucket, and per-sample RNG keeps its
    bytes identical regardless of which bucket served it."""
    import io

    ckpt = str(tmp_path / "model000001.flax")
    _make_ckpt(ckpt)
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", OPENAI_LOGDIR=str(tmp_path / "log"))
    proc = subprocess.Popen(
        [
            sys.executable, os.path.join(REPO, "scripts", "serve.py"),
            *TINY,
            "--model_path", ckpt,
            "--batch_size", "4",
            "--batch_buckets", "1,2",
            "--timestep_respacing", "5",
            "--port", str(port),
        ],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )

    def fetch(n, seed):
        with _post(port, {"num_samples": n, "seed": seed}) as r:
            return np.load(io.BytesIO(r.read()))["arr_0"]

    try:
        h = _wait_healthy(port, proc, budget=560)
        assert h["batch_buckets"] == [1, 2, 4]

        # n=1 rides bucket 1, n=2 bucket 2, n=3 bucket 4; per-sample RNG
        # (key = fold_in(seed, subidx)) makes the shared prefixes identical
        # across bucket choices
        a1 = fetch(1, 7)
        a2 = fetch(2, 7)
        a3 = fetch(3, 7)
        assert a1.shape[0] == 1 and a2.shape[0] == 2 and a3.shape[0] == 3
        np.testing.assert_array_equal(a2[:1], a1)
        np.testing.assert_array_equal(a3[:2], a2)

        # a chunked request (6 = 4 + 2) routes the tail chunk to bucket 2 —
        # result identical to the separate 2-sample fetch with the same
        # seeds/subidx? (subidx differs across chunks: 4,5) — just check
        # shape and the full-batch prefix equality vs a fresh 4-sample run
        a6 = fetch(6, 7)
        a4 = fetch(4, 7)
        assert a6.shape[0] == 6
        np.testing.assert_array_equal(a6[:4], a4)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_bucket_latency_routing():
    """_bucket_for picks the measured-fastest fitting bucket, not the
    smallest: on TPU XLA hits per-shape cliffs (v5e 256px ddim25 measured
    batch 4 at 4.0s vs batch 8 at 2.5s — tools/batch_sweep_probe.py), so
    size is only the pre-warmup fallback; ties break toward smaller."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from serve import Sampler

    s = object.__new__(Sampler)
    s.buckets = [1, 2, 4, 8]
    s.bucket_latency = {}
    # pre-warmup (no measurements): size routing
    assert Sampler._bucket_for(s, 1) == 1
    assert Sampler._bucket_for(s, 3) == 4

    # the measured v5e cliff: 2/4 slower than 8 in absolute time
    s.bucket_latency = {1: 1.9, 2: 2.7, 4: 4.0, 8: 2.5}
    assert Sampler._bucket_for(s, 1) == 1   # 1 is genuinely fastest
    assert Sampler._bucket_for(s, 2) == 8   # bypasses the 2.7s/4.0s shapes
    assert Sampler._bucket_for(s, 4) == 8
    assert Sampler._bucket_for(s, 8) == 8

    # monotonic latencies: behaves like size routing; ties -> smaller
    s.bucket_latency = {1: 0.5, 2: 0.5, 4: 0.8, 8: 1.0}
    assert Sampler._bucket_for(s, 1) == 1
    assert Sampler._bucket_for(s, 2) == 2
    assert Sampler._bucket_for(s, 3) == 4

    # partial measurements (mid-warmup): only measured fitting buckets used
    s.bucket_latency = {1: 9.9}
    assert Sampler._bucket_for(s, 2) == 2   # no measured bucket fits n=2
    assert Sampler._bucket_for(s, 1) == 1   # 1 measured, it fits
