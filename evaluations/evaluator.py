"""FID / sFID / Inception Score / Precision / Recall evaluator.

Reference behavior: evaluations/evaluator.py (npz-in / metrics-out, TF1
InceptionV3 pool_3 + spatial mixed_6/conv features, TTUR Frechet distance
with eps retry, softmax-KL Inception Score, improved precision/recall with
k=3 manifold radii). Usage is identical:

    python evaluations/evaluator.py ref_batch.npz sample_batch.npz

Design differences (TPU-native rebuild):
  - the metric MATH is pure numpy/JAX and extractor-agnostic;
  - the feature extractor is pluggable:
      * "inception": the original frozen InceptionV3 graph
        (classify_image_graph_def.pb) run through tf.compat.v1 — bit-exact
        with the reference when the pb is available locally (set
        INCEPTION_PB=/path/to/classify_image_graph_def.pb; the reference
        downloads it from openaipublic, evaluator.py:573-583 — this
        environment has no egress, so the file must be provided);
      * "pixel": a weights-free debug extractor (downsampled pixel stats) so
        the full pipeline is exercisable/testable offline. NOT comparable to
        published FID numbers — clearly labeled in the output.
  - pairwise-distance blocks for P&R run as one jitted JAX matmul per block
    (f32; replaces the reference's fp16-with-f32-fallback TF graph,
    evaluator.py:376-384).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import warnings
import zipfile
from typing import Iterator

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INCEPTION_PB_ENV = "INCEPTION_PB"
DEFAULT_PB_NAMES = (
    "classify_image_graph_def.pb",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "classify_image_graph_def.pb"),
)
INCEPTION_NPZ_ENV = "INCEPTION_NPZ"
DEFAULT_NPZ_NAMES = (
    "inception_v3_fid.npz",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "inception_v3_fid.npz"),
)


def main():
    # honor JAX_PLATFORMS even though sitecustomize may have pre-imported jax
    # with a stale config snapshot
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    parser = argparse.ArgumentParser()
    parser.add_argument("ref_batch", help="path to reference batch npz file")
    parser.add_argument("sample_batch", help="path to sample batch npz file")
    parser.add_argument(
        "--extractor", default="auto",
        choices=["auto", "inception", "flax-inception", "pixel"],
        help="feature extractor; 'auto' prefers the converted JAX Inception "
             "npz, then the TF pb, then the pixel debug extractor",
    )
    args = parser.parse_args()

    extractor = make_extractor(args.extractor)
    print(f"feature extractor: {extractor.name}")

    print("computing reference batch activations...")
    ref_acts = extractor.read_activations(args.ref_batch)
    print("computing/reading reference batch statistics...")
    ref_stats, ref_stats_spatial = extractor.read_statistics(args.ref_batch, ref_acts)

    print("computing sample batch activations...")
    sample_acts = extractor.read_activations(args.sample_batch)
    print("computing/reading sample batch statistics...")
    sample_stats, sample_stats_spatial = extractor.read_statistics(args.sample_batch, sample_acts)

    print("Computing evaluations...")
    # Metric lines carry the extractor tag so debug-extractor numbers can
    # never be quoted as real FID (empty tag for the genuine Inception path).
    tag = extractor.tag
    is_score = extractor.compute_inception_score(sample_acts[0])
    print(f"Inception Score{tag}:", is_score)
    fid = sample_stats.frechet_distance(ref_stats)
    print(f"FID{tag}:", fid)
    sfid = sample_stats_spatial.frechet_distance(ref_stats_spatial)
    print(f"sFID{tag}:", sfid)
    prec, recall = compute_prec_recall(ref_acts[0], sample_acts[0])
    print(f"Precision{tag}:", prec)
    print(f"Recall{tag}:", recall)


# ---------------------------------------------------------------------------
# Metric math (extractor-agnostic)
# ---------------------------------------------------------------------------


class FIDStatistics:
    """mu/sigma of a feature distribution + Frechet distance
    (reference evaluator.py:62-115)."""

    def __init__(self, mu: np.ndarray, sigma: np.ndarray):
        self.mu = mu
        self.sigma = sigma

    def frechet_distance(self, other: "FIDStatistics", eps: float = 1e-6) -> float:
        import scipy.linalg

        mu1, sigma1 = self.mu, self.sigma
        mu2, sigma2 = other.mu, other.sigma
        mu1 = np.atleast_1d(mu1)
        mu2 = np.atleast_1d(mu2)
        sigma1 = np.atleast_2d(sigma1)
        sigma2 = np.atleast_2d(sigma2)
        diff = mu1 - mu2

        covmean, _ = scipy.linalg.sqrtm(sigma1.dot(sigma2), disp=False)
        if not np.isfinite(covmean).all():
            warnings.warn(
                f"fid calculation produces singular product; adding {eps} to diagonal of cov estimates"
            )
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = scipy.linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))

        if np.iscomplexobj(covmean):
            if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
                m = np.max(np.abs(covmean.imag))
                raise ValueError(f"Imaginary component {m}")
            covmean = covmean.real

        tr_covmean = np.trace(covmean)
        return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean)


def statistics_from_activations(acts: np.ndarray) -> FIDStatistics:
    mu = np.mean(acts, axis=0)
    sigma = np.cov(acts, rowvar=False)
    return FIDStatistics(mu, sigma)


def inception_score_from_preds(preds: np.ndarray, split_size: int = 5000) -> float:
    """Softmax-KL IS over splits (reference evaluator.py:179-192)."""
    scores = []
    for i in range(0, len(preds), split_size):
        part = preds[i : i + split_size]
        kl = part * (np.log(part) - np.log(np.expand_dims(np.mean(part, 0), 0)))
        kl = np.mean(np.sum(kl, 1))
        scores.append(np.exp(kl))
    return float(np.mean(scores))


_PAIRWISE_JIT = None


def _pairwise_l2_sq(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Squared L2 distances via one jitted matmul block (runs on TPU if there)."""
    import jax
    import jax.numpy as jnp

    global _PAIRWISE_JIT
    if _PAIRWISE_JIT is None:

        @jax.jit
        def block(a_, b_):
            a2 = jnp.sum(a_**2, axis=1, keepdims=True)
            b2 = jnp.sum(b_**2, axis=1, keepdims=True)
            d = a2 - 2.0 * (a_ @ b_.T) + b2.T
            return jnp.maximum(d, 0.0)

        _PAIRWISE_JIT = block
    return np.asarray(_PAIRWISE_JIT(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))


class ManifoldEstimator:
    """k-NN manifold radii + membership (reference evaluator.py:217-323, k=3)."""

    def __init__(self, features: np.ndarray, nhood_size: int = 3, row_batch: int = 10000, col_batch: int = 10000):
        self.features = np.asarray(features, np.float32)
        self.nhood_size = nhood_size
        self.row_batch = row_batch
        self.col_batch = col_batch
        self.radii = self._compute_radii()

    def _compute_radii(self) -> np.ndarray:
        n = len(self.features)
        radii = np.zeros(n, np.float32)
        for i in range(0, n, self.row_batch):
            rows = self.features[i : i + self.row_batch]
            dists = []
            for j in range(0, n, self.col_batch):
                dists.append(_pairwise_l2_sq(rows, self.features[j : j + self.col_batch]))
            d = np.concatenate(dists, axis=1)
            # kth-NN excluding self: self-distance 0 occupies slot 0
            part = np.partition(d, self.nhood_size, axis=1)
            radii[i : i + len(rows)] = part[:, self.nhood_size]
        return radii

    def evaluate_membership(self, points: np.ndarray) -> np.ndarray:
        """For each point: does it fall inside ANY manifold ball?"""
        points = np.asarray(points, np.float32)
        out = np.zeros(len(points), bool)
        for i in range(0, len(points), self.row_batch):
            rows = points[i : i + self.row_batch]
            inside = np.zeros(len(rows), bool)
            for j in range(0, len(self.features), self.col_batch):
                d = _pairwise_l2_sq(rows, self.features[j : j + self.col_batch])
                inside |= (d <= self.radii[j : j + self.col_batch][None, :]).any(axis=1)
            out[i : i + len(rows)] = inside
        return out


def compute_prec_recall(ref_features: np.ndarray, sample_features: np.ndarray, nhood_size: int = 3):
    """Improved precision & recall (reference evaluate_pr, evaluator.py:325-359)."""
    ref_manifold = ManifoldEstimator(ref_features, nhood_size)
    sample_manifold = ManifoldEstimator(sample_features, nhood_size)
    precision = float(ref_manifold.evaluate_membership(sample_features).mean())
    recall = float(sample_manifold.evaluate_membership(ref_features).mean())
    return precision, recall


# ---------------------------------------------------------------------------
# npz streaming (reference evaluator.py:433-531)
# ---------------------------------------------------------------------------


def iter_npz_batches(npz_path: str, batch_size: int = 256) -> Iterator[np.ndarray]:
    """Stream `arr_0` out of an npz in row batches without materializing it.

    A 50k-sample 256px uint8 batch is ~9.8 GB; the reference reads the zip
    member incrementally for exactly this reason (evaluator.py:433-531). An
    npz is a zip archive whose members are .npy files — read the npy header
    for shape/dtype, then stream whole rows from the (possibly deflated) zip
    stream. Works for both np.savez (stored) and np.savez_compressed.
    """
    with zipfile.ZipFile(npz_path, "r") as zf:
        name = "arr_0.npy" if "arr_0.npy" in zf.namelist() else zf.namelist()[0]
        with zf.open(name, "r") as member:
            version = np.lib.format.read_magic(member)
            if version == (1, 0):
                shape, fortran, dtype = np.lib.format.read_array_header_1_0(member)
            elif version == (2, 0):
                shape, fortran, dtype = np.lib.format.read_array_header_2_0(member)
            else:
                shape, fortran, dtype = np.lib.format._read_array_header(member, version)
            if fortran or dtype.hasobject:
                # rare layouts: fall back to full load
                arr = np.load(io.BytesIO(zf.read(name)), allow_pickle=False)
                for i in range(0, len(arr), batch_size):
                    yield arr[i : i + batch_size]
                return
            n = shape[0] if shape else 0
            row_shape = shape[1:]
            row_nbytes = int(np.prod(row_shape, dtype=np.int64)) * dtype.itemsize
            for i in range(0, n, batch_size):
                rows = min(batch_size, n - i)
                buf = member.read(rows * row_nbytes)
                if len(buf) != rows * row_nbytes:
                    raise IOError(f"truncated npz member {name} at row {i}")
                yield np.frombuffer(buf, dtype=dtype).reshape((rows,) + row_shape)


def npz_has_statistics(npz_path: str) -> bool:
    with open(npz_path, "rb") as f:
        obj = np.load(f)
        return "mu" in obj.files


# ---------------------------------------------------------------------------
# Extractors
# ---------------------------------------------------------------------------


class Extractor:
    name = "base"
    tag = ""  # appended to metric labels; non-empty for debug extractors

    def extract(self, batch_uint8: np.ndarray):
        """-> (pool_features [B, D], spatial_features [B, D2], preds [B, K])."""
        raise NotImplementedError

    def read_activations(self, npz_path: str):
        pools, spatials, preds = [], [], []
        for batch in iter_npz_batches(npz_path):
            p, s, pr = self.extract(batch)
            pools.append(p)
            spatials.append(s)
            preds.append(pr)
        # first element of the tuple doubles as (pool, preds) carrier like the
        # reference's (pool_3, spatial) pair + softmax reuse
        self._last_preds = np.concatenate(preds, 0)
        return np.concatenate(pools, 0), np.concatenate(spatials, 0)

    def read_statistics(self, npz_path: str, acts):
        """Use cached mu/sigma from the npz when present (reference :164-177)."""
        with open(npz_path, "rb") as f:
            obj = np.load(f)
            if "mu" in obj.files:
                return (
                    FIDStatistics(obj["mu"], obj["sigma"]),
                    FIDStatistics(obj["mu_s"], obj["sigma_s"]),
                )
        return statistics_from_activations(acts[0]), statistics_from_activations(acts[1])

    def compute_inception_score(self, pool_acts: np.ndarray) -> float:
        return inception_score_from_preds(self._last_preds)


class TFInceptionExtractor(Extractor):
    """The original frozen InceptionV3 graph via tf.compat.v1 — bit-exact with
    the reference evaluator when classify_image_graph_def.pb is on disk."""

    name = "inception (frozen TF graph)"

    def __init__(self, pb_path: str):
        import tensorflow.compat.v1 as tf

        tf.disable_eager_execution()
        self.tf = tf
        config = tf.ConfigProto(allow_soft_placement=True)
        self.sess = tf.Session(config=config)
        with open(pb_path, "rb") as f:
            graph_def = tf.GraphDef()
            graph_def.ParseFromString(f.read())
        self.image_input = tf.placeholder(tf.uint8, [None, None, None, 3], name="image_input")
        # pool_3 + spatial mixed_6/conv features (reference evaluator.py:20-24, 586-600)
        pool3, spatial = tf.import_graph_def(
            graph_def,
            input_map={"ExpandDims:0": self.image_input},
            return_elements=["pool_3:0", "mixed_6/conv:0"],
            name="inception",
        )
        pool3 = tf.squeeze(tf.squeeze(pool3, 2), 1)
        spatial = spatial[..., :7]
        spatial = tf.reshape(spatial, [tf.shape(spatial)[0], -1])
        # softmax over the retrained logits (reference :602-620)
        w = self.sess.graph.get_operation_by_name("inception/softmax/logits/MatMul").inputs[1]
        logits = tf.matmul(pool3, w)
        self.pool3, self.spatial, self.softmax = pool3, spatial, tf.nn.softmax(logits)

    def extract(self, batch_uint8: np.ndarray):
        p, s, sm = self.sess.run(
            [self.pool3, self.spatial, self.softmax], {self.image_input: batch_uint8}
        )
        return p, s, sm


class FlaxInceptionExtractor(Extractor):
    """TPU-native InceptionV3: the frozen FID graph reimplemented in JAX
    (evaluations/inception_flax.py), running from one-time-converted weights.
    Needs neither TensorFlow nor network access at eval time; runs on the TPU
    when one is attached."""

    name = "inception (JAX port of the frozen FID graph)"

    def __init__(self, npz_path: str, batch: int = 64):
        import jax

        from evaluations import inception_flax as inc

        params, pre_act = inc.load_params(npz_path)
        self._params = params
        self._batch = batch

        @jax.jit
        def feats(p, x):
            pool3, spatial = inc.inception_features(
                p, x, spatial_pre_activation=pre_act
            )
            preds = inc.inception_softmax(p, pool3)
            b = spatial.shape[0]
            return pool3, spatial.reshape(b, -1), preds

        self._feats = feats

    def extract(self, batch_uint8: np.ndarray):
        import jax.numpy as jnp

        outs = [[], [], []]
        # fixed sub-batch so jit compiles once; pad the ragged tail
        for i in range(0, len(batch_uint8), self._batch):
            chunk = batch_uint8[i : i + self._batch].astype(np.float32)
            n = len(chunk)
            if n < self._batch:
                pad = np.zeros((self._batch - n,) + chunk.shape[1:], np.float32)
                chunk = np.concatenate([chunk, pad], 0)
            p, s, pr = self._feats(self._params, jnp.asarray(chunk))
            outs[0].append(np.asarray(p)[:n])
            outs[1].append(np.asarray(s)[:n])
            outs[2].append(np.asarray(pr)[:n])
        return tuple(np.concatenate(o, 0) for o in outs)


class PixelExtractor(Extractor):
    """Weights-free debug extractor: downsampled pixels + channel stats.

    Lets the full evaluator pipeline run without the Inception weights.
    Relative comparisons only — NOT comparable to published FID numbers.
    """

    name = "pixel (debug; NOT comparable to published FID)"
    tag = "[pixel-debug]"

    def __init__(self, side: int = 8):
        self.side = side
        self._jit = None

    def extract(self, batch_uint8: np.ndarray):
        import jax
        import jax.numpy as jnp

        x = batch_uint8.astype(np.float32) / 127.5 - 1.0
        B, H, W, C = x.shape
        if self._jit is None:
            side = self.side

            @jax.jit
            def feats(x_):
                b = x_.shape[0]
                small = jax.image.resize(x_, (b, side, side, C), method="linear")
                spatial = jax.image.resize(x_, (b, side * 2, side * 2, C), method="linear")
                return small.reshape(b, -1), spatial.reshape(b, -1)

            self._jit = feats
        small, spatial = self._jit(jnp.asarray(x))
        pool = np.asarray(small)
        spatial = np.asarray(spatial)
        # fake "preds": softmax over pooled-pixel bins
        logits = pool[:, :64]
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        preds = e / e.sum(axis=1, keepdims=True)
        return pool, spatial, preds


def find_inception_pb() -> str | None:
    cand = os.environ.get(INCEPTION_PB_ENV)
    if cand and os.path.exists(cand):
        return cand
    for name in DEFAULT_PB_NAMES:
        if os.path.exists(name):
            return name
    return None


def find_inception_npz() -> str | None:
    cand = os.environ.get(INCEPTION_NPZ_ENV)
    if cand and os.path.exists(cand):
        return cand
    for name in DEFAULT_NPZ_NAMES:
        if os.path.exists(name):
            return name
    return None


def make_extractor(kind: str) -> Extractor:
    if kind in ("auto", "inception", "flax-inception"):
        # prefer the one-time-converted JAX port (no TF1 dependency, runs on
        # the TPU); the TF pb path remains for byte-exact comparisons
        npz = find_inception_npz()
        if npz is not None and kind != "inception":
            return FlaxInceptionExtractor(npz)
        if kind == "flax-inception":
            raise SystemExit(
                "converted Inception weights not found. Run "
                "`python evaluations/inception_flax.py convert <pb> "
                f"evaluations/inception_v3_fid.npz` or set {INCEPTION_NPZ_ENV}."
            )
        pb = find_inception_pb()
        if pb is not None:
            return TFInceptionExtractor(pb)
        if kind == "inception":
            raise SystemExit(
                "InceptionV3 graph not found. Place classify_image_graph_def.pb "
                f"locally and set {INCEPTION_PB_ENV} (no-egress environment: the "
                "reference downloads it from openaipublic, evaluator.py:573-583)."
            )
        print(
            "WARNING: Inception pb not found; using the pixel debug extractor. "
            "Metrics are for relative comparison only.",
            file=sys.stderr,
        )
    return PixelExtractor()


if __name__ == "__main__":
    main()
