"""Async orbax checkpoint backend round trip."""

import numpy as np

import jax.numpy as jnp

from guided_diffusion_clip_tpu.utils.checkpoint import OrbaxCheckpointer


def test_orbax_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones((4,))}}
    ck = OrbaxCheckpointer(str(tmp_path / "orbax"))
    ck.save(5, tree)
    ck.wait()
    assert ck.latest_step() == 5
    template = {"a": jnp.zeros((2, 3)), "b": {"c": jnp.zeros((4,))}}
    restored = ck.restore(5, template)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]), np.asarray(tree["b"]["c"]))
    ck.close()
