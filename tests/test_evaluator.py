"""Metric-math tests for the evaluation suite (extractor-agnostic)."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from evaluations.evaluator import (
    FIDStatistics,
    compute_prec_recall,
    inception_score_from_preds,
    statistics_from_activations,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestFrechet:
    def test_identical_is_zero(self):
        rs = np.random.RandomState(0)
        acts = rs.randn(500, 16)
        s = statistics_from_activations(acts)
        assert s.frechet_distance(s) == pytest.approx(0.0, abs=1e-6)

    def test_mean_shift_analytic(self):
        # same covariance, mean shift d: FID = |d|^2
        rs = np.random.RandomState(1)
        cov = np.eye(4)
        s1 = FIDStatistics(np.zeros(4), cov)
        s2 = FIDStatistics(np.array([3.0, 0, 0, 0]), cov)
        assert s1.frechet_distance(s2) == pytest.approx(9.0, rel=1e-6)

    def test_covariance_scale_analytic(self):
        # N(0, I) vs N(0, 4I) in D dims: FID = D*(1 + 4 - 2*2) = D
        D = 5
        s1 = FIDStatistics(np.zeros(D), np.eye(D))
        s2 = FIDStatistics(np.zeros(D), 4 * np.eye(D))
        assert s1.frechet_distance(s2) == pytest.approx(D, rel=1e-6)

    def test_monotone_in_shift(self):
        rs = np.random.RandomState(2)
        base = rs.randn(2000, 8)
        s0 = statistics_from_activations(base)
        prev = 0.0
        for shift in [0.5, 1.0, 2.0]:
            s = statistics_from_activations(base + shift)
            d = s0.frechet_distance(s)
            assert d > prev
            prev = d

    @pytest.mark.skipif(
        not os.path.isdir("/root/reference/evaluations"), reason="reference not mounted"
    )
    def test_matches_reference_math(self):
        """Compare against the reference FIDStatistics implementation directly."""
        sys.path.insert(0, "/root/reference/evaluations")
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_evaluator", "/root/reference/evaluations/evaluator.py"
        )
        # reference imports tensorflow at module level; skip if that fails
        try:
            ref_mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(ref_mod)
        except Exception as e:
            pytest.skip(f"reference evaluator unimportable: {e}")
        rs = np.random.RandomState(3)
        a, b = rs.randn(400, 12), rs.randn(400, 12) * 1.3 + 0.2
        ours = statistics_from_activations(a).frechet_distance(
            statistics_from_activations(b)
        )
        ref_stats1 = ref_mod.FIDStatistics(a.mean(0), np.cov(a, rowvar=False))
        ref_stats2 = ref_mod.FIDStatistics(b.mean(0), np.cov(b, rowvar=False))
        theirs = ref_stats1.frechet_distance(ref_stats2)
        assert ours == pytest.approx(theirs, rel=1e-6)


class TestInceptionScore:
    def test_uniform_preds_score_one(self):
        preds = np.full((100, 10), 0.1)
        assert inception_score_from_preds(preds) == pytest.approx(1.0, rel=1e-6)

    def test_confident_diverse_high(self):
        # each sample fully confident, classes uniformly covered: IS = K
        K = 10
        preds = np.eye(K)[np.arange(1000) % K] * (1 - 1e-9) + 1e-10
        assert inception_score_from_preds(preds) == pytest.approx(K, rel=1e-3)


class TestPrecRecall:
    def test_identical_sets(self):
        rs = np.random.RandomState(4)
        feats = rs.randn(300, 8).astype(np.float32)
        p, r = compute_prec_recall(feats, feats.copy())
        assert p == pytest.approx(1.0)
        assert r == pytest.approx(1.0)

    def test_disjoint_sets(self):
        rs = np.random.RandomState(5)
        a = rs.randn(300, 8).astype(np.float32)
        b = rs.randn(300, 8).astype(np.float32) + 100.0
        p, r = compute_prec_recall(a, b)
        assert p == pytest.approx(0.0)
        assert r == pytest.approx(0.0)

    def test_subset_high_precision_low_recall(self):
        rs = np.random.RandomState(6)
        ref = rs.randn(1000, 8).astype(np.float32)
        sample = ref[:100] + rs.randn(100, 8).astype(np.float32) * 0.01
        p, r = compute_prec_recall(ref, sample)
        assert p > 0.9  # samples sit on the ref manifold
        assert r < p  # but cover less of it than it covers them


class TestCLI:
    def test_end_to_end_pixel_extractor(self, tmp_path):
        rs = np.random.RandomState(7)
        ref = rs.randint(0, 255, (64, 32, 32, 3), dtype=np.uint8)
        # sample = ref + slight noise: near-zero FID, high P/R
        sample = np.clip(ref.astype(int) + rs.randint(-2, 3, ref.shape), 0, 255).astype(np.uint8)
        ref_p, sample_p = str(tmp_path / "ref.npz"), str(tmp_path / "sample.npz")
        np.savez(ref_p, ref)
        np.savez(sample_p, sample)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "evaluations", "evaluator.py"),
             ref_p, sample_p, "--extractor", "pixel"],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        out = proc.stdout
        # pixel-extractor metric lines must be tagged so they can never be
        # quoted as real FID numbers
        tag = "[pixel-debug]"
        assert f"FID{tag}:" in out and f"Precision{tag}:" in out and f"Recall{tag}:" in out
        assert "\nFID:" not in out
        fid = float(
            [l for l in out.splitlines() if l.startswith(f"FID{tag}:")][0].split(":")[1]
        )
        assert fid < 5.0


class TestExtractorDiscovery:
    """make_extractor must prefer the converted JAX Inception npz (the
    TPU-native path) and honor explicit kinds (round-4 wiring: the
    FlaxInceptionExtractor previously existed but was never dispatched)."""

    def _write_npz(self, path):
        import numpy as np

        from evaluations.inception_flax import random_params

        flat = {}
        for k, v in random_params(0).items():
            if isinstance(v, dict):
                flat[f"{k}//w"], flat[f"{k}//b"] = v["w"], v["b"]
            else:
                flat[k] = v
        np.savez(path, **flat)

    def test_auto_prefers_flax_npz(self, tmp_path, monkeypatch):
        from evaluations import evaluator as ev

        npz = str(tmp_path / "inception_v3_fid.npz")
        self._write_npz(npz)
        monkeypatch.setenv(ev.INCEPTION_NPZ_ENV, npz)
        ex = ev.make_extractor("auto")
        assert isinstance(ex, ev.FlaxInceptionExtractor)
        ex2 = ev.make_extractor("flax-inception")
        assert isinstance(ex2, ev.FlaxInceptionExtractor)

    def test_auto_falls_back_to_pixel(self, tmp_path, monkeypatch):
        from evaluations import evaluator as ev

        monkeypatch.delenv(ev.INCEPTION_NPZ_ENV, raising=False)
        monkeypatch.delenv(ev.INCEPTION_PB_ENV, raising=False)
        monkeypatch.chdir(tmp_path)  # no default-named files in cwd
        assert isinstance(ev.make_extractor("auto"), ev.PixelExtractor)

    def test_explicit_flax_without_npz_raises(self, tmp_path, monkeypatch):
        import pytest as _pytest

        from evaluations import evaluator as ev

        monkeypatch.delenv(ev.INCEPTION_NPZ_ENV, raising=False)
        monkeypatch.chdir(tmp_path)
        with _pytest.raises(SystemExit, match="converted Inception"):
            ev.make_extractor("flax-inception")
