"""Set-level fidelity metric WITH demonstrated discriminating power.

Round-4 verdict: the chain-quality studies scored distribution-level
fidelity with a Frechet distance over a RANDOM-INIT InceptionV3
(evaluations/inception_flax.random_params) — its pool features come out at
~1e-5 magnitude after ~48 decaying ReLU convs, every study printed 0.0 vs
0.0 at 6 decimals, and a probe showed a 2%-pixel-noise corruption scoring
BELOW the seed floor: zero power. This module replaces it for the synthetic
blob domain the studies run on (real-FID parity stays gated on the
unavailable Inception pb — evaluations/evaluator.py mirrors the reference
protocol, /root/reference/evaluations/evaluator.py:72-115).

Design (validated empirically, ROUND_NOTES r5):
  - a SMALL CNN trained by LATENT REGRESSION on the blob generator's own
    parameters (positions/sizes/colors of both blobs, canonically ordered):
    richer supervision than a K-way label, so the 32-d feature space encodes
    geometry + color, not just class identity;
  - Frechet distance on base-set-standardized 32-d features: 64 samples vs a
    32-dim covariance is well-conditioned, unlike 2048-dim Inception pools
    where sqrtm operates on a rank-63 matrix;
  - every candidate set is scored against an INDEPENDENT base draw — the
    previous harness scored variant-vs-base on SAME-SEED (paired) sets,
    where tiny per-sample perturbations legitimately score below the
    seed-resampling floor, making "at the floor" unfalsifiable;
  - the floor is measured over MULTIPLE disjoint base pairs (mean/max), and
    studies must include a positive control (an undertrained checkpoint's
    samples) shown to clear it.

Power check (32px blobs, n=64/set, 5-draw floor): floor 3.95 +/- 0.73
(max 4.94); paired 2%-pixel-noise 4.23 (within floor, correctly — it IS a
tiny distributional shift); a genuine distribution shift (blob size range
moved from U[0.08,0.25] to U[0.15,0.35]) scores 23.6 — ~27 sigma above the
floor. tests/test_fidelity_metric.py re-runs a scaled-down version of this
check.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_blob_batch(rs, n, size, s_lo=0.08, s_hi=0.25, return_latents=False):
    """Smooth colored 2-blob images in [-1, 1] — structured and learnable.

    With return_latents=True also returns the [n, 12] generator parameters
    (cx, cy, s, r, g, b per blob, blobs ordered by cx) — the latent-
    regression targets for the feature extractor.
    """
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    out = np.empty((n, size, size, 3), np.float32)
    lat = np.empty((n, 2, 6), np.float32)
    for i in range(n):
        img = np.zeros((size, size, 3), np.float32)
        blobs = []
        for _ in range(2):
            cx, cy = rs.uniform(0.2, 0.8, 2)
            s = rs.uniform(s_lo, s_hi)
            color = rs.uniform(-1, 1, 3)
            g = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
            img += g[..., None] * color[None, None, :]
            blobs.append([cx, cy, s, *color])
        blobs.sort(key=lambda r: r[0])
        lat[i] = np.array(blobs, np.float32)
        out[i] = np.clip(img, -1, 1)
    if return_latents:
        return out, lat.reshape(n, -1)
    return out


def _feat_net(feat_dim: int = 32):
    import flax.linen as fnn

    class BlobFeatureNet(fnn.Module):
        """3x stride-2 conv trunk + GAP -> feat_dim features; a small MLP
        head regresses the 12 blob latents during training only."""

        @fnn.compact
        def __call__(self, x):
            for ch in (32, 64, 128):
                x = fnn.Conv(ch, (3, 3), strides=(2, 2))(x)
                x = fnn.gelu(x)
            x = x.mean(axis=(1, 2))
            f = fnn.Dense(feat_dim)(x)
            pred = fnn.Dense(12)(fnn.gelu(fnn.Dense(64)(fnn.gelu(f))))
            return f, pred

    return BlobFeatureNet()


def train_feature_extractor(size: int, steps: int = 300, batch: int = 64,
                            seed: int = 5, log=None):
    """Train the latent-regression extractor on fresh blob draws.

    Returns (feats_fn, final_loss): feats_fn maps a [n, size, size, 3]
    float array in [-1, 1] to [n, 32] float features (jitted, batched
    internally at `batch`).
    """
    import jax
    import jax.numpy as jnp
    import optax

    net = _feat_net()
    params = net.init(jax.random.key(0), jnp.zeros((1, size, size, 3)))["params"]
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            _, pred = net.apply({"params": p}, x)
            return ((pred - y) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rs = np.random.RandomState(seed)
    loss = None
    for i in range(steps):
        xb, yb = make_blob_batch(rs, batch, size, return_latents=True)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(xb), jnp.asarray(yb)
        )
        if log and i % 100 == 0:
            log(f"feature extractor step {i} loss {float(loss):.4f}")

    @jax.jit
    def _feats(x):
        return net.apply({"params": params}, x)[0]

    def feats_fn(x: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(x), batch):
            outs.append(np.asarray(_feats(jnp.asarray(x[i:i + batch]))))
        return np.concatenate(outs)

    return feats_fn, float(loss)


def frechet(fx: np.ndarray, fy: np.ndarray) -> float:
    """Unrounded Frechet distance via the evaluator's statistics (the same
    math the reference FID pipeline uses, on these features)."""
    from evaluations.evaluator import statistics_from_activations

    return float(
        statistics_from_activations(fx).frechet_distance(
            statistics_from_activations(fy)
        )
    )


def score_sets(feats_fn, sets: dict) -> dict:
    """Score candidate sets against independent base draws.

    `sets` must contain 'base_a', 'base_b', 'base_c' (three disjoint-seed
    base draws; 'base_a' may share seeds with candidates — candidates are
    only ever scored against b and c). Every OTHER key is a candidate,
    scored as mean(d(x, base_b), d(x, base_c)). Features are standardized
    by base_b's per-dim stats so the 32-d Frechet operates on O(1) values.

    Returns {'floor': {values, mean, max}, '<candidate>': {vs_b, vs_c,
    mean, over_floor_max}} — all unrounded.
    """
    feats = {k: feats_fn(v) for k, v in sets.items()}
    mu = feats["base_b"].mean(0)
    sd = feats["base_b"].std(0) + 1e-8
    z = {k: (v - mu) / sd for k, v in feats.items()}

    floor_vals = [
        frechet(z["base_a"], z["base_b"]),
        frechet(z["base_a"], z["base_c"]),
        frechet(z["base_b"], z["base_c"]),
    ]
    out = {
        "floor": {
            "values": floor_vals,
            "mean": float(np.mean(floor_vals)),
            "max": float(np.max(floor_vals)),
        }
    }
    for k in sets:
        if k in ("base_a", "base_b", "base_c"):
            continue
        vb = frechet(z[k], z["base_b"])
        vc = frechet(z[k], z["base_c"])
        out[k] = {
            "vs_b": vb,
            "vs_c": vc,
            "mean": float((vb + vc) / 2),
            "over_floor_max": float((vb + vc) / 2 / max(out["floor"]["max"], 1e-12)),
        }
    return out
