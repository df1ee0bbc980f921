"""Tensor parallelism (TP) correctness on the virtual 8-device CPU mesh.

TP shards the channel axis over a 'model' mesh axis (parallel/tp.py): convs
become output-channel-parallel matmuls, GroupNorm group reductions stay
device-local when the axis divides the group count, attention re-pins on
block exit. All of it must be value-preserving: every test compares against
the same computation with TP inactive.

Beyond-reference capability — the reference is DDP-only (dist_util.py,
train_util.py:98-105) and cannot split one activation's channels across
chips. TP is the deep-trunk complement to SP (tests/test_spatial.py): at the
ADM-512 16px trunk C=1024 while H=16 stops dividing usefully.
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
from guided_diffusion_clip_tpu.parallel import sp, tp
from guided_diffusion_clip_tpu.parallel.mesh import create_mesh
from guided_diffusion_clip_tpu.utils.script_util import create_gaussian_diffusion


@pytest.fixture(autouse=True)
def _tp_off_after():
    yield
    tp.clear_tensor_sharding()


def tiny_cfg(**kw):
    base = dict(
        image_size=16, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, use_scale_shift_norm=True,
    )
    base.update(kw)
    return UNetConfig(**base)


def tp_mesh(data=2, model=4):
    return create_mesh(axes=(("data", data), ("model", model)))


def init_unet(model, B=4, size=16):
    x = jnp.zeros((B, size, size, 3), jnp.float32)
    t = jnp.zeros((B,), jnp.float32)
    return model.init(jax.random.key(0), x, t)["params"]


class TestTPForward:
    def test_unet_forward_matches_unsharded(self):
        model = UNetModel(config=tiny_cfg())
        params = init_unet(model)
        rs = np.random.RandomState(0)
        x = rs.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
        t = np.array([0.0, 3.0, 9.0, 19.0], np.float32)

        ref = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)

        tp.set_tensor_sharding(tp_mesh())
        got = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        sharded_in = jax.device_put(jnp.asarray(x), tp.input_sharding())
        got2 = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(
            params, sharded_in, t
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def test_pure_model_mesh_no_data_axis(self):
        # latency-serving shape: ONE chain's channels spread over all devices
        model = UNetModel(config=tiny_cfg())
        params = init_unet(model, B=2)
        rs = np.random.RandomState(1)
        x = rs.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
        t = np.array([5.0, 7.0], np.float32)

        ref = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        mesh = create_mesh(axes=(("model", 8),))
        tp.set_tensor_sharding(mesh, data_axis=None)
        got = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def test_indivisible_channels_fall_back_to_batch_sharding(self):
        # the RGB stem input (C=3) and the epsilon/sigma head (C=6) cannot
        # shard over 'model'; constrain_channels must pin them batch-only
        # instead of forcing GSPMD to pad a 3-wide axis over the mesh
        from jax.sharding import PartitionSpec as P

        tp.set_tensor_sharding(tp_mesh())
        rgb = jax.jit(tp.constrain_channels)(jnp.ones((4, 16, 16, 3)))
        assert rgb.sharding.spec == P("data"), rgb.sharding.spec
        wide = jax.jit(tp.constrain_channels)(jnp.ones((4, 16, 16, 32)))
        assert wide.sharding.spec == P("data", None, None, "model"), wide.sharding.spec

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
        tp.set_tensor_sharding(tp_mesh())
        got = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def test_int8_forward_matches_unsharded_int8(self):
        # the quantized fast path composes with TP: per-image scales come from
        # GN stats, which under channel sharding reduce within device-local
        # whole groups — same values, so the s8 conv inputs are identical
        from guided_diffusion_clip_tpu.ops.config import set_conv_impl

        model = UNetModel(config=tiny_cfg())
        params = init_unet(model)
        rs = np.random.RandomState(3)
        x = rs.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
        t = np.array([0.0, 3.0, 9.0, 19.0], np.float32)
        try:
            set_conv_impl("int8")
            ref = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
            tp.set_tensor_sharding(tp_mesh())
            got = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(params, x, t)
        finally:
            set_conv_impl("auto")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def test_classifier_guidance_grad_matches_unsharded(self):
        # jax.grad of the classifier log-prob THROUGH the TP constraints
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
        tp.set_tensor_sharding(tp_mesh())
        got = jax.jit(jax.grad(log_prob_sum, argnums=1))(params, x, t, y)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def test_hooks_are_identity_when_inactive(self):
        x = jnp.ones((2, 4, 4, 3))
        assert tp.constrain_channels(x) is x
        assert tp.input_sharding() is None

    def test_sp_and_tp_are_mutually_exclusive(self):
        mesh = create_mesh(axes=(("data", 2), ("space", 4)))
        sp.set_spatial_sharding(mesh)
        try:
            with pytest.raises(AssertionError):
                tp.set_tensor_sharding(tp_mesh())
        finally:
            sp.clear_spatial_sharding()

    def test_trainloop_clears_stale_tensor_state(self):
        # a sampling CLI's process-global TP left on must not poison a
        # subsequent TrainLoop trace over a plain data mesh
        import tempfile

        from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
        from guided_diffusion_clip_tpu.utils import logger

        tp.set_tensor_sharding(tp_mesh())
        logger.configure_dir(dir=tempfile.mkdtemp(), format_strs=[])
        model = UNetModel(config=tiny_cfg())
        diffusion = create_gaussian_diffusion(
            steps=20, noise_schedule="cosine", learn_sigma=True,
            rescale_learned_sigmas=True,
        )

        def gen():
            rs = np.random.RandomState(0)
            while True:
                yield rs.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32), {}

        TrainLoop(
            model=model, diffusion=diffusion, data=gen(), batch_size=8,
            microbatch=-1, lr=1e-3, ema_rate="0.99", log_interval=10**9,
            save_interval=10**9, seed=7,
        )
        assert not tp.active()


@pytest.mark.slow
class TestTPChain:
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
        tp.set_tensor_sharding(tp_mesh())
        got = jax.jit(chain)(params, key)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-6)


@pytest.mark.slow
class TestTPTrainStep:
    """Training-side TP (VERDICT r3 item 6): TrainLoop(tensor_shard=S) must
    produce the same parameter update as plain DP — GSPMD's channel-parallel
    convs and grad sync are value-preserving."""

    @staticmethod
    def _data_gen(batch_size, seed=0):
        rs = np.random.RandomState(seed)
        while True:
            yield rs.uniform(-1, 1, (batch_size, 16, 16, 3)).astype(np.float32), {}

    @classmethod
    def _make_loop(cls, init_params=None, **kw):
        import tempfile

        from guided_diffusion_clip_tpu.training.train_loop import TrainLoop
        from guided_diffusion_clip_tpu.utils import logger

        logger.configure_dir(dir=tempfile.mkdtemp(), format_strs=[])
        model = UNetModel(config=tiny_cfg())
        diffusion = create_gaussian_diffusion(
            steps=20, noise_schedule="cosine", learn_sigma=True,
            rescale_learned_sigmas=True,
        )
        return TrainLoop(
            model=model, diffusion=diffusion, data=cls._data_gen(8),
            batch_size=8, microbatch=-1, lr=1e-3, ema_rate="0.99",
            log_interval=10**9, save_interval=10**9, seed=7,
            init_params=init_params, **kw,
        )

    def _assert_params_match(self, loop_ref, loop_got, atol=2e-6):
        for (kd, vd), (ks, vs) in zip(
            jax.tree_util.tree_flatten_with_path(jax.device_get(loop_ref.params))[0],
            jax.tree_util.tree_flatten_with_path(jax.device_get(loop_got.params))[0],
        ):
            np.testing.assert_allclose(vs, vd, rtol=2e-5, atol=atol, err_msg=str(kd))

    def test_dp_tp_step_matches_dp_only(self):
        loop_dp = self._make_loop(mesh=create_mesh(axes=(("data", 8),)))
        init_params = jax.device_get(loop_dp.params)

        # tensor_shard plumbing builds the ('data',2) x ('model',4) mesh and
        # activates TP itself — the exact CLI path (--tensor_shard 4)
        loop_tp = self._make_loop(init_params=init_params, tensor_shard=4)
        assert tp.active()
        assert loop_tp.mesh.shape == {"data": 2, "model": 4}

        b, c = next(self._data_gen(8, seed=42))
        loop_dp.run_step(b, c)
        loop_tp.run_step(b, c)
        self._assert_params_match(loop_dp, loop_tp)

    def test_zero1_tp_step_matches_dp_only(self):
        # ZeRO-1 composed with TP: flat opt/EMA vectors shard over BOTH axes
        loop_dp = self._make_loop(mesh=create_mesh(axes=(("data", 8),)))
        init_params = jax.device_get(loop_dp.params)

        loop_tp = self._make_loop(
            init_params=init_params, tensor_shard=4, opt_impl="zero1"
        )
        assert len(loop_tp.opt_state["m"].sharding.device_set) == 8

        b, c = next(self._data_gen(8, seed=42))
        loop_dp.run_step(b, c)
        loop_tp.run_step(b, c)
        self._assert_params_match(loop_dp, loop_tp)

    def test_fsdp_tp_step_matches_dp_only(self):
        # ZeRO-3 composed with TP: param shards spread over ('data','model')
        loop_dp = self._make_loop(mesh=create_mesh(axes=(("data", 8),)))
        init_params = jax.device_get(loop_dp.params)

        loop_tp = self._make_loop(
            init_params=init_params, tensor_shard=4, param_sharding="fsdp"
        )
        specs = [s.spec for s in jax.tree_util.tree_leaves(loop_tp._param_shd)]
        assert any(("data", "model") in s for s in specs), specs[:8]

        b, c = next(self._data_gen(8, seed=42))
        loop_dp.run_step(b, c)
        loop_tp.run_step(b, c)
        self._assert_params_match(loop_dp, loop_tp)

    def test_trainloop_repins_ambient_tp_to_loop_mesh(self):
        # ADVICE r3: ambient TP pinned to a DIFFERENT mesh (e.g. a sampling
        # CLI's local latency mesh) must be re-activated on the loop's mesh,
        # not silently kept pointing at the stale device assignment
        stale = create_mesh(axes=(("model", 4),), devices=jax.devices()[:4])
        tp.set_tensor_sharding(stale, data_axis=None)
        loop_mesh = tp_mesh(data=2, model=4)
        self._make_loop(mesh=loop_mesh)
        assert tp.active()
        assert tp._STATE[0] is loop_mesh
        assert tp._STATE[1] == "data" and tp._STATE[2] == "model"

    def test_spatial_and_tensor_shard_flags_are_exclusive(self):
        with pytest.raises(AssertionError, match="mutually exclusive"):
            self._make_loop(tensor_shard=4, spatial_shard=2)
