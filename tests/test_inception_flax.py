"""Tests for the JAX InceptionV3 FID extractor and streaming npz reader."""

import os
import resource
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from evaluations import inception_flax as inc
from evaluations.evaluator import FlaxInceptionExtractor, iter_npz_batches


class TestArchitecture:
    def test_channel_trace_reaches_2048(self):
        chans = inc._trace_in_channels()
        # every conv unit in the table gets an input width
        assert set(chans) == set(inc._expected_conv_units())

    def test_stage_channel_counts(self):
        """Stage widths of the 2015 FID graph (35x35: 256/288/288, then 768,
        1280, 2048)."""
        chans = inc._trace_in_channels()
        assert chans["mixed/conv"] == 192
        assert chans["mixed_1/conv"] == 256
        assert chans["mixed_2/conv"] == 288
        assert chans["mixed_3/conv"] == 288
        assert chans["mixed_4/conv"] == 768
        assert chans["mixed_8/tower/conv"] == 768
        assert chans["mixed_9/conv"] == 1280
        assert chans["mixed_10/conv"] == 2048

    def test_forward_shapes_and_finiteness(self):
        import jax

        params = inc.random_params()
        x = np.random.RandomState(0).uniform(0, 255, (2, 37, 41, 3)).astype(np.float32)
        pool3, spatial = jax.jit(lambda p, v: inc.inception_features(p, v))(params, x)
        assert pool3.shape == (2, 2048)
        assert spatial.shape == (2, 17, 17, 7)
        assert np.isfinite(np.asarray(pool3)).all()
        assert np.isfinite(np.asarray(spatial)).all()
        preds = inc.inception_softmax(params, pool3)
        assert preds.shape == (2, 1008)
        np.testing.assert_allclose(np.asarray(preds).sum(1), 1.0, rtol=1e-5)

    def test_legacy_resize_matches_tf_semantics(self):
        """Hand-checked legacy bilinear (no half-pixel centers): upsampling
        2x from [0, 1] puts src coords at dst*0.5 -> [0, .5, 1, 1]."""
        import jax

        x = np.array([0.0, 1.0], np.float32).reshape(1, 1, 2, 1)
        out = np.asarray(inc.legacy_resize_bilinear(x, 1, 4)).reshape(-1)
        np.testing.assert_allclose(out, [0.0, 0.5, 1.0, 1.0], atol=1e-6)

    def test_extractor_roundtrip(self, tmp_path):
        """Save random params as the converted-weights npz, run the evaluator
        extractor over an npz batch."""
        params = inc.random_params()
        flat = {}
        for k, v in params.items():
            if isinstance(v, dict):
                flat[f"{k}//w"] = v["w"]
                flat[f"{k}//b"] = v["b"]
            else:
                flat[k] = v
        flat["spatial_pre_activation"] = np.asarray(False)
        weights = str(tmp_path / "weights.npz")
        np.savez(weights, **flat)

        ex = FlaxInceptionExtractor(weights, batch=4)
        batch = np.random.RandomState(1).randint(0, 255, (6, 24, 24, 3), np.uint8)
        pool, spatial, preds = ex.extract(batch)
        assert pool.shape == (6, 2048)
        assert spatial.shape == (6, 17 * 17 * 7)
        assert preds.shape == (6, 1008)


@pytest.mark.skipif(
    not os.environ.get("INCEPTION_PB"),
    reason="parity vs the frozen TF graph needs classify_image_graph_def.pb "
    "(no egress here); set INCEPTION_PB=/path/to/pb",
)
class TestPbParity:
    def test_flax_matches_tf_graph(self, tmp_path):
        """Convert the pb and compare pool_3/spatial on random uint8 images."""
        from evaluations.evaluator import TFInceptionExtractor

        weights = str(tmp_path / "conv.npz")
        inc.convert_pb(os.environ["INCEPTION_PB"], weights)

        tf_ex = TFInceptionExtractor(os.environ["INCEPTION_PB"])
        jax_ex = FlaxInceptionExtractor(weights, batch=4)
        batch = np.random.RandomState(0).randint(0, 255, (4, 64, 64, 3), np.uint8)
        tp, ts, tpred = tf_ex.extract(batch)
        jp, js, jpred = jax_ex.extract(batch)
        np.testing.assert_allclose(jp, tp, atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(js.reshape(ts.shape), ts, atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(jpred, tpred, atol=1e-4, rtol=1e-4)


class TestStreamingNpz:
    def test_batches_match_full_load(self, tmp_path):
        rs = np.random.RandomState(0)
        arr = rs.randint(0, 255, (70, 9, 9, 3), np.uint8)
        p = str(tmp_path / "a.npz")
        np.savez(p, arr)
        got = np.concatenate(list(iter_npz_batches(p, batch_size=16)), 0)
        np.testing.assert_array_equal(got, arr)

    def test_compressed_npz(self, tmp_path):
        rs = np.random.RandomState(1)
        arr = rs.randint(0, 255, (33, 5, 5, 3), np.uint8)
        p = str(tmp_path / "c.npz")
        np.savez_compressed(p, arr)
        got = np.concatenate(list(iter_npz_batches(p, batch_size=10)), 0)
        np.testing.assert_array_equal(got, arr)

    def test_float_array(self, tmp_path):
        arr = np.random.RandomState(2).randn(17, 8).astype(np.float32)
        p = str(tmp_path / "f.npz")
        np.savez(p, arr)
        got = np.concatenate(list(iter_npz_batches(p, batch_size=5)), 0)
        np.testing.assert_array_equal(got, arr)

    def test_streaming_rss_stays_o_batch(self, tmp_path):
        """Reading a ~400MB npz in 64-row batches must not grow RSS by the
        full array size (the reference streams for exactly this reason,
        evaluator.py:433-531)."""
        n, side = 1600, 256
        row = side * side * 3  # 196608 B/row -> ~315 MB total
        p = str(tmp_path / "big.npz")
        arr = np.zeros((n, side, side, 3), np.uint8)  # compresses trivially? stored uncompressed by savez
        np.savez(p, arr)
        del arr
        before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on linux
        total = 0
        for batch in iter_npz_batches(p, batch_size=64):
            total += len(batch)
        after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        assert total == n
        grown_mb = (after - before) / 1024.0
        assert grown_mb < 150, f"streaming read grew RSS by {grown_mb:.0f} MB"
