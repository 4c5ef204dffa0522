"""Mesh construction + sharding recipe tests (reference: the device-group
machinery of inference_engine.cc:1738-1812 mapped onto jax Meshes)."""

import numpy as np
import pytest
import jax
from jax.sharding import PartitionSpec as P

from inferflow_tpu.parallel.mesh import (factor_mesh, balanced_factors,
                                         make_mesh, strategy_to_mesh)
from inferflow_tpu.parallel.sharding import (spec_for, shard_params,
                                             shard_quantized)
from inferflow_tpu.quant.codec_jax import QuantizedTensor, quantize


def test_factor_helpers():
    assert factor_mesh(1) == (1, 1, 1)
    for n in (2, 4, 8, 16):
        dp, pp, tp = factor_mesh(n)
        assert dp * pp * tp == n
        dp, pp, tp = balanced_factors(n)
        assert dp * pp * tp == n
    assert balanced_factors(8) == (2, 2, 2)
    assert strategy_to_mesh("by_tensor", 4) == (1, 1, 4)
    assert strategy_to_mesh("by_layer", 4) == (1, 4, 1)
    hy = strategy_to_mesh("hybrid", 4)
    assert hy[0] == 1 and hy[1] * hy[2] == 4 and hy[2] > 1


def test_spec_for_roles():
    assert spec_for("wq", 3, True) == P("pp", None, "tp")
    assert spec_for("qkv", 3, True) == P("pp", None, "tp")
    assert spec_for("w1n3", 3, True) == P("pp", None, "tp")
    assert spec_for("wo", 3, True) == P("pp", "tp", None)
    assert spec_for("w2", 3, True) == P("pp", "tp", None)
    assert spec_for("pre_norm", 2, True) == P("pp", None)


def test_shard_quantized_planes():
    """Every plane/metadata array of a quantized tensor must land on the
    mesh with a consistent spec."""
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = make_mesh(devs[:2], dp=1, pp=1, tp=2)
    import jax.numpy as jnp
    w = jnp.asarray(np.random.default_rng(0).standard_normal((64, 256)),
                    jnp.float32)
    qt = quantize(w, "Q8_B32T1")
    sq = shard_quantized(qt, mesh, P(None, "tp"))
    for plane in sq.planes.values():
        assert plane.sharding.spec == P(None, "tp")
    assert sq.scale.sharding.spec == P(None, "tp")
