"""Ring attention (sequence-parallel over a mesh axis) vs the dense path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from inferflow_tpu.ops.attention import mha

needs4 = pytest.mark.skipif(len(jax.devices()) < 4,
                            reason="needs >= 4 devices")


@needs4
@pytest.mark.parametrize("g", [1, 2])
def test_ring_attention_matches_mha(g):
    from inferflow_tpu.parallel.ring_attention import ring_attention

    rng = np.random.default_rng(0)
    B, T, H, D = 2, 256, 2, 32
    HQ = H * g
    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev), ("sp",))

    q = jnp.asarray(rng.standard_normal((B, T, HQ, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.3, jnp.float32)
    kv_len = jnp.asarray([200, 256], jnp.int32)

    out = ring_attention(q, k, v, mesh=mesh, kv_len=kv_len, kq_scale=0.8)
    qpos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    ref = mha(q, k, v, q_positions=qpos, kv_len=kv_len, kq_scale=0.8)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2,
                               atol=2e-2)


@needs4
def test_ring_attention_sharding():
    """Output stays sequence-sharded; inputs larger than one device's
    share never gather."""
    from inferflow_tpu.parallel.ring_attention import ring_attention

    rng = np.random.default_rng(1)
    B, T, H, D = 1, 512, 2, 32
    n_dev = 8 if len(jax.devices()) >= 8 else 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev), ("sp",))
    q = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.3, jnp.float32)
    out = ring_attention(q, k, v, mesh=mesh)
    assert len(out.sharding.device_set) == n_dev
    assert out.shape == (B, T, H, D)
