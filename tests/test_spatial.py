"""Spatial partitioning (SP) correctness on the virtual 8-device CPU mesh.

SP shards the image H axis over a 'space' mesh axis (parallel/sp.py): convs
get GSPMD halo exchange, GroupNorm reductions become cross-device AllReduces,
attention blocks gather. All of it must be value-preserving: every test
compares against the same computation with SP inactive.

Beyond-reference capability — the reference is DDP-only (dist_util.py,
train_util.py:98-105) and cannot split one image's activations across chips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guided_diffusion_clip_tpu.models.unet import (
    EncoderUNetModel,
    UNetConfig,
    UNetModel,
)
from guided_diffusion_clip_tpu.parallel import sp
from guided_diffusion_clip_tpu.parallel.mesh import create_mesh
from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
from guided_diffusion_clip_tpu.utils import logger
from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion


@pytest.fixture(autouse=True)
def _sp_off_after():
    yield
    sp.clear_spatial_sharding()


def tiny_cfg(**kw):
    base = dict(
        image_size=16, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, use_scale_shift_norm=True,
    )
    base.update(kw)
    return UNetConfig(**base)


def sp_mesh(data=2, space=4):
    return create_mesh(axes=(("data", data), ("space", space)))


def init_unet(model, B=4, size=16):
    x = jnp.zeros((B, size, size, 3), jnp.float32)
    t = jnp.zeros((B,), jnp.float32)
    return model.init(jax.random.key(0), x, t)["params"]


class TestSPForward:
    def test_unet_forward_matches_unsharded(self):
        model = UNetModel(config=tiny_cfg())
        params = init_unet(model)
        rs = np.random.RandomState(0)
        x = rs.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
        t = np.array([0.0, 3.0, 9.0, 19.0], np.float32)

        ref = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)

        sp.set_spatial_sharding(sp_mesh())
        got = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        sharded_in = jax.device_put(jnp.asarray(x), sp.input_sharding())
        got2 = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(
            params, sharded_in, t
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def test_pure_space_mesh_no_data_axis(self):
        # latency-serving shape: ONE chain spread over all devices
        model = UNetModel(config=tiny_cfg())
        params = init_unet(model, B=2)
        rs = np.random.RandomState(1)
        x = rs.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
        t = np.array([5.0, 7.0], np.float32)

        ref = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        mesh = create_mesh(axes=(("space", 8),))
        sp.set_spatial_sharding(mesh, data_axis=None)
        got = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def test_encoder_classifier_matches_unsharded(self):
        cfg = tiny_cfg(out_channels=10, num_head_channels=16)
        model = EncoderUNetModel(config=cfg, pool="attention")
        x0 = jnp.zeros((4, 16, 16, 3), jnp.float32)
        t0 = jnp.zeros((4,), jnp.float32)
        params = model.init(jax.random.key(0), x0, t0)["params"]
        rs = np.random.RandomState(2)
        x = rs.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
        t = np.array([0.0, 1.0, 2.0, 3.0], np.float32)

        ref = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        sp.set_spatial_sharding(sp_mesh())
        got = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def test_int8_forward_matches_unsharded_int8(self):
        # the quantized fast path composes with SP: per-image scales come
        # from the GN stats reduction, which under SP is a cross-device
        # AllReduce — same values, so the s8 conv inputs are identical
        from guided_diffusion_clip_tpu.ops.config import set_conv_impl

        model = UNetModel(config=tiny_cfg())
        params = init_unet(model)
        rs = np.random.RandomState(3)
        x = rs.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
        t = np.array([0.0, 3.0, 9.0, 19.0], np.float32)
        try:
            set_conv_impl("int8")
            ref = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
            sp.set_spatial_sharding(sp_mesh())
            got = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        finally:
            set_conv_impl("auto")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def test_remat_forward_matches_unsharded(self):
        # use_checkpoint wraps blocks in nn.remat with the SP constraints
        # inside the rematerialized body
        model = UNetModel(config=tiny_cfg(use_checkpoint=True))
        params = init_unet(model)
        rs = np.random.RandomState(4)
        x = rs.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
        t = np.array([1.0, 2.0, 4.0, 8.0], np.float32)
        ref = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        sp.set_spatial_sharding(sp_mesh())
        got = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def test_classifier_guidance_grad_matches_unsharded(self):
        # jax.grad of the classifier log-prob THROUGH the SP constraints
        # (classifier guidance composes: with_sharding_constraint transposes
        # to itself, so cotangents stay H-sharded)
        cfg = tiny_cfg(out_channels=10, num_head_channels=16)
        model = EncoderUNetModel(config=cfg, pool="attention")
        x0 = jnp.zeros((4, 16, 16, 3), jnp.float32)
        t0 = jnp.zeros((4,), jnp.float32)
        params = model.init(jax.random.key(0), x0, t0)["params"]
        rs = np.random.RandomState(5)
        x = rs.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
        t = np.array([0.0, 1.0, 2.0, 3.0], np.float32)
        y = np.array([1, 4, 7, 2], np.int32)

        def log_prob_sum(p, x, t, y):
            logits = model.apply({"params": p}, x, t)
            lp = jax.nn.log_softmax(logits, axis=-1)
            return jnp.sum(jnp.take_along_axis(lp, y[:, None], axis=-1))

        g = jax.jit(jax.grad(log_prob_sum, argnums=1))
        ref = g(params, x, t, y)
        sp.set_spatial_sharding(sp_mesh())
        got = jax.jit(jax.grad(log_prob_sum, argnums=1))(params, x, t, y)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def test_hooks_are_identity_when_inactive(self):
        x = jnp.ones((2, 4, 4, 3))
        assert sp.constrain_spatial(x) is x
        assert sp.constrain_batch(x) is x
        assert sp.input_sharding() is None


@pytest.mark.slow
class TestSPChain:
    def test_ddim_chain_matches_unsharded(self):
        model = UNetModel(config=tiny_cfg())
        params = init_unet(model)
        diffusion = create_gaussian_diffusion(
            steps=20, noise_schedule="cosine", learn_sigma=True,
            rescale_learned_sigmas=True, timestep_respacing="ddim5",
        )
        shape = (4, 16, 16, 3)
        key = jax.random.key(3)

        def chain(params, key):
            def model_fn(x, t, **kw):
                return model.apply({"params": params}, x, t, **kw)

            return diffusion.ddim_sample_loop(
                model_fn, shape, key, clip_denoised=True, model_kwargs={}
            )

        ref = jax.jit(chain)(params, key)
        sp.set_spatial_sharding(sp_mesh())
        got = jax.jit(chain)(params, key)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-6)

    def test_cfg_chain_matches_unsharded(self):
        """CFG doubles the batch INSIDE the jitted chain (cfg_model_fn
        concatenates cond+uncond); under SP the doubled activations must
        still pin to P('data','space') and produce the unsharded values."""
        from guided_diffusion_clip_tpu.diffusion.guidance import cfg_model_fn
        from guided_diffusion_clip_tpu.models.clip_models import UNetModel_clip_feat

        model = UNetModel_clip_feat(tiny_cfg(num_classes=8))
        feat = jnp.asarray(np.random.RandomState(5).randn(4, 8), jnp.float32)
        x = jnp.zeros((4, 16, 16, 3), jnp.float32)
        params = model.init(
            jax.random.key(0), x, jnp.zeros((4,)), clip_feat=feat
        )["params"]
        diffusion = create_gaussian_diffusion(
            steps=20, noise_schedule="cosine", learn_sigma=True,
            rescale_learned_sigmas=True, timestep_respacing="ddim5",
        )
        key = jax.random.key(7)

        def chain(params, key):
            def base_fn(x, t, **kw):
                return model.apply({"params": params}, x, t, **kw)

            fn = cfg_model_fn(base_fn, 2.5, {"clip_feat": 0.0})
            return diffusion.ddim_sample_loop(
                fn, (4, 16, 16, 3), key, clip_denoised=True,
                model_kwargs={"clip_feat": feat},
            )

        ref = jax.jit(chain)(params, key)
        sp.set_spatial_sharding(sp_mesh())
        got = jax.jit(chain)(params, key)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-6)


@pytest.mark.slow
class TestSPTrainStep:
    @staticmethod
    def _data_gen(batch_size, seed=0):
        rs = np.random.RandomState(seed)
        while True:
            yield rs.uniform(-1, 1, (batch_size, 16, 16, 3)).astype(np.float32), {}

    @classmethod
    def _make_loop(cls, mesh, init_params=None, param_sharding="replicated", **kw):
        import tempfile

        logger.configure_dir(dir=tempfile.mkdtemp(), format_strs=[])
        model = UNetModel(config=tiny_cfg())
        diffusion = create_gaussian_diffusion(
            steps=20, noise_schedule="cosine", learn_sigma=True,
            rescale_learned_sigmas=True,
        )
        was_sp = sp.active()
        loop = TrainLoop(
            model=model, diffusion=diffusion, data=cls._data_gen(8),
            batch_size=8, microbatch=-1, lr=1e-3, ema_rate="0.99",
            log_interval=10**9, save_interval=10**9, mesh=mesh, seed=7,
            init_params=init_params, param_sharding=param_sharding, **kw,
        )
        # guard against the loop silently DISABLING ambient SP (it clears
        # stale SP state, but an SP-capable mesh must keep it active —
        # otherwise these tests compare DP against DP and prove nothing)
        assert sp.active() == was_sp, "TrainLoop changed ambient SP state"
        return loop

    def _assert_params_match(self, loop_ref, loop_got):
        for (kd, vd), (ks, vs) in zip(
            jax.tree_util.tree_flatten_with_path(jax.device_get(loop_ref.params))[0],
            jax.tree_util.tree_flatten_with_path(jax.device_get(loop_got.params))[0],
        ):
            np.testing.assert_allclose(vs, vd, rtol=2e-5, atol=2e-6, err_msg=str(kd))

    def test_dp_sp_step_matches_dp_only(self):
        loop_dp = self._make_loop(create_mesh(axes=(("data", 8),)))
        init_params = jax.device_get(loop_dp.params)

        mesh = sp_mesh(data=2, space=4)
        sp.set_spatial_sharding(mesh)
        loop_sp = self._make_loop(mesh, init_params=init_params)

        b, c = next(self._data_gen(8, seed=42))
        loop_dp.run_step(b, c)
        loop_sp.run_step(b, c)
        self._assert_params_match(loop_dp, loop_sp)

    def test_zero1_sp_step_matches_dp_only(self):
        # ZeRO-1 composed with SP: the flat opt/EMA vectors shard over BOTH
        # mesh axes (('data','space')), activations still H-sharded
        loop_dp = self._make_loop(create_mesh(axes=(("data", 8),)))
        init_params = jax.device_get(loop_dp.params)

        mesh = sp_mesh(data=2, space=4)
        sp.set_spatial_sharding(mesh)
        loop_sp = self._make_loop(mesh, init_params=init_params, opt_impl="zero1")
        assert len(loop_sp.opt_state["m"].sharding.device_set) == 8
        shard = loop_sp.opt_state["m"].addressable_shards[0]
        assert shard.data.shape[0] * 8 >= loop_sp.opt_state["m"].shape[0] > shard.data.shape[0]

        b, c = next(self._data_gen(8, seed=42))
        loop_dp.run_step(b, c)
        loop_sp.run_step(b, c)
        # atol 1e-7: sharded grad-reduction order noise (see test_opt_flat)
        for (kd, vd), (ks, vs) in zip(
            jax.tree_util.tree_flatten_with_path(jax.device_get(loop_dp.params))[0],
            jax.tree_util.tree_flatten_with_path(jax.device_get(loop_sp.params))[0],
        ):
            np.testing.assert_allclose(vs, vd, rtol=2e-5, atol=2e-6, err_msg=str(kd))

    def test_fsdp_sp_step_matches_dp_only(self):
        # ZeRO-3 composed with SP: param shards spread over BOTH mesh axes
        # (('data','space') specs), compute all-gathers once per step
        loop_dp = self._make_loop(create_mesh(axes=(("data", 8),)))
        init_params = jax.device_get(loop_dp.params)

        mesh = sp_mesh(data=2, space=4)
        sp.set_spatial_sharding(mesh)
        loop_sp = self._make_loop(mesh, init_params=init_params, param_sharding="fsdp")
        # at least one big leaf must actually shard over both axes
        specs = [s.spec for s in jax.tree_util.tree_leaves(loop_sp._param_shd)]
        assert any(("data", "space") in s for s in specs), specs[:8]

        b, c = next(self._data_gen(8, seed=42))
        loop_dp.run_step(b, c)
        loop_sp.run_step(b, c)
        self._assert_params_match(loop_dp, loop_sp)
