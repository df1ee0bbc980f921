"""Golden-value tests for beta schedules, coefficient tables, and respacing."""

import math

import numpy as np
import pytest

import jax
import pytest as _pytest

from guided_diffusion_clip_tpu.diffusion import schedules as S


@_pytest.fixture(autouse=True, scope="module")
def _x64():
    with jax.enable_x64(True):
        yield
from reference_oracle import has_reference, load_reference_gd, load_reference_respace


class TestNamedSchedules:
    def test_linear_endpoints_t1000(self):
        b = S.get_named_beta_schedule("linear", 1000)
        assert b.dtype == np.float64
        assert b[0] == pytest.approx(1e-4, abs=0)
        assert b[-1] == pytest.approx(0.02, abs=0)
        assert len(b) == 1000
        # linspace: uniform increments
        d = np.diff(b)
        np.testing.assert_allclose(d, d[0], rtol=1e-9)

    def test_linear_scales_with_T(self):
        # scaled-linear: T=500 behaves like T=1000 (scale = 1000/T)
        b = S.get_named_beta_schedule("linear", 500)
        assert b[0] == pytest.approx(2e-4)
        assert b[-1] == pytest.approx(0.04)

    def test_cosine_matches_alpha_bar(self):
        T = 100
        b = S.get_named_beta_schedule("cosine", T)
        ab = np.cumprod(1 - b)

        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        # wherever the 0.999 cap doesn't bind, cumprod tracks alpha_bar exactly
        for i in [0, 10, 50, 90]:
            expected = alpha_bar((i + 1) / T) / alpha_bar(0)
            if all(bb < 0.999 for bb in b[: i + 1]):
                assert ab[i] == pytest.approx(expected, rel=1e-10)

    def test_cosine_beta_cap(self):
        b = S.get_named_beta_schedule("cosine", 1000)
        assert b.max() <= 0.999 + 1e-12

    def test_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            S.get_named_beta_schedule("quadratic", 10)


class TestTables:
    def test_table_identities(self):
        betas = S.get_named_beta_schedule("linear", 50)
        t = S._tables_from_betas(betas)
        ab = np.cumprod(1 - betas)
        np.testing.assert_allclose(t["alphas_cumprod"], ab, rtol=1e-12)
        np.testing.assert_allclose(t["alphas_cumprod_prev"], np.append(1.0, ab[:-1]))
        np.testing.assert_allclose(t["alphas_cumprod_next"], np.append(ab[1:], 0.0))
        np.testing.assert_allclose(t["sqrt_recip_alphas_cumprod"], np.sqrt(1 / ab))
        np.testing.assert_allclose(t["sqrt_recipm1_alphas_cumprod"], np.sqrt(1 / ab - 1))
        pv = betas * (1 - np.append(1.0, ab[:-1])) / (1 - ab)
        np.testing.assert_allclose(t["posterior_variance"], pv, rtol=1e-12)
        # clipped log var: slot 0 patched with slot 1
        assert t["posterior_log_variance_clipped"][0] == pytest.approx(np.log(pv[1]))
        np.testing.assert_allclose(t["posterior_log_variance_clipped"][1:], np.log(pv[1:]))
        # FIXED_LARGE table: [pv[1], betas[1:]]
        np.testing.assert_allclose(
            np.exp(t["log_fixed_large_variance"]), np.append(pv[1], betas[1:]), rtol=1e-12
        )

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_tables_match_reference(self):
        gd = load_reference_gd()
        betas = S.get_named_beta_schedule("linear", 1000)
        ref = gd.GaussianDiffusion(
            betas=betas,
            model_mean_type=gd.ModelMeanType.EPSILON,
            model_var_type=gd.ModelVarType.LEARNED_RANGE,
            loss_type=gd.LossType.RESCALED_MSE,
        )
        ours = S._tables_from_betas(betas)
        np.testing.assert_allclose(ours["alphas_cumprod"], ref.alphas_cumprod, rtol=1e-14)
        np.testing.assert_allclose(ours["posterior_variance"], ref.posterior_variance, rtol=1e-14)
        np.testing.assert_allclose(
            ours["posterior_log_variance_clipped"], ref.posterior_log_variance_clipped, rtol=1e-14
        )
        np.testing.assert_allclose(ours["posterior_mean_coef1"], ref.posterior_mean_coef1, rtol=1e-14)
        np.testing.assert_allclose(ours["posterior_mean_coef2"], ref.posterior_mean_coef2, rtol=1e-14)
        np.testing.assert_allclose(
            ours["sqrt_one_minus_alphas_cumprod"], ref.sqrt_one_minus_alphas_cumprod, rtol=1e-14
        )


class TestSpaceTimesteps:
    def test_ddim_exact_stride(self):
        steps = S.space_timesteps(1000, "ddim25")
        assert len(steps) == 25
        assert steps == set(range(0, 1000, 40))

    def test_ddim_impossible(self):
        with pytest.raises(ValueError):
            S.space_timesteps(1000, "ddim999")

    def test_single_section(self):
        steps = sorted(S.space_timesteps(1000, "250"))
        assert len(steps) == 250
        assert steps[0] == 0 and steps[-1] == 999

    def test_full_identity(self):
        steps = sorted(S.space_timesteps(100, [100]))
        assert steps == list(range(100))

    def test_multi_section(self):
        steps = sorted(S.space_timesteps(100, "10,10,10"))
        assert len(steps) == 30

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    @pytest.mark.parametrize("spec", ["ddim25", "250", "100", "10,20,30", [7]])
    def test_matches_reference(self, spec):
        rs = load_reference_respace()
        assert S.space_timesteps(1000, spec) == rs.space_timesteps(1000, spec)


class TestRespacedSchedule:
    def test_preserves_alpha_bar(self):
        base = S.get_named_beta_schedule("linear", 1000)
        use = sorted(S.space_timesteps(1000, "ddim25"))
        sched = S.respaced_schedule(base, use, dtype=np.float64)
        base_ab = np.cumprod(1 - base)
        np.testing.assert_allclose(
            np.asarray(sched.alphas_cumprod), base_ab[use], rtol=1e-10
        )
        np.testing.assert_array_equal(np.asarray(sched.timestep_map), use)
        assert sched.num_timesteps == 25
        assert sched.original_num_steps == 1000

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_new_betas_match_reference(self):
        gd = load_reference_gd()
        rs = load_reference_respace()
        base = S.get_named_beta_schedule("linear", 1000)
        use = rs.space_timesteps(1000, "250")
        ref = rs.SpacedDiffusion(
            use_timesteps=use,
            betas=base,
            model_mean_type=gd.ModelMeanType.EPSILON,
            model_var_type=gd.ModelVarType.LEARNED_RANGE,
            loss_type=gd.LossType.RESCALED_MSE,
        )
        sched = S.respaced_schedule(base, use, dtype=np.float64)
        np.testing.assert_allclose(np.asarray(sched.betas), ref.betas, rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(sched.timestep_map), ref.timestep_map)

    def test_model_timesteps_rescale(self):
        import jax.numpy as jnp

        base = S.get_named_beta_schedule("linear", 1000)
        use = sorted(S.space_timesteps(1000, "ddim25"))
        sched = S.respaced_schedule(base, use, rescale_timesteps=True)
        t = jnp.array([0, 1, 24])
        mt = np.asarray(sched.model_timesteps(t))
        np.testing.assert_allclose(mt, np.array(use)[[0, 1, 24]] * (1000.0 / 1000.0))

    def test_build_schedule_empty_respacing(self):
        sched = S.build_schedule(steps=100, noise_schedule="linear", timestep_respacing="")
        assert sched.num_timesteps == 100
        np.testing.assert_array_equal(np.asarray(sched.timestep_map), np.arange(100))
