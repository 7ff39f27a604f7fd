"""Pallas folded-conv kernel vs the XLA folded conv (ops/folding).

Runs the kernel in interpreter mode so parity holds on the CPU suite;
the real Mosaic lowering is exercised on TPU (scripts/exp_conv_mxu2.py
benchmarks it at network shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dycon_paper_replication_tpu.ops import folding
from dycon_paper_replication_tpu.ops.folded_conv_pallas import folded_conv3_pallas


@pytest.mark.parametrize("to_phase", [0, 1])
@pytest.mark.parametrize("c", [16, 32])
def test_matches_xla_folded_conv(rng, to_phase, c):
    b, g = 2, 5
    x = jnp.asarray(rng.normal(size=(b, g, g + 1, g, 8 * c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)) * 0.1, jnp.float32)
    ref = folding.folded_conv3(x, w, None, to_phase=to_phase)
    wf = folding.fold_conv3_weights(w)
    got = folded_conv3_pallas(x, wf, to_phase=to_phase, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("to_phase", [0, 1])
def test_grads_match_xla(rng, to_phase):
    from dycon_paper_replication_tpu.ops.folded_conv_pallas import (
        folded_conv3_via_pallas,
    )

    b, g, c = 1, 4, 16
    x = jnp.asarray(rng.normal(size=(b, g, g, g, 8 * c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    cot = None

    def loss(fn):
        def f(xx, ww, bb):
            y = fn(xx, ww, bb)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape) * 0.01))
        return f

    ref_fn = loss(lambda xx, ww, bb: folding.folded_conv3(xx, ww, bb, to_phase=to_phase))
    got_fn = loss(lambda xx, ww, bb: folded_conv3_via_pallas(
        xx, ww, bb, to_phase=to_phase, interpret=True))
    ref = jax.grad(ref_fn, argnums=(0, 1, 2))(x, w, bias)
    got = jax.grad(got_fn, argnums=(0, 1, 2))(x, w, bias)
    for r, g_ in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(r), atol=5e-4, rtol=1e-4)


def test_full_conv_equivalence_unfolded(rng):
    """Through fold/unfold, the kernel == a plain SAME 3^3 conv."""
    b, d, h, w_, c = 1, 8, 8, 8, 16
    x = jnp.asarray(rng.normal(size=(b, d, h, w_, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )
    wf = folding.fold_conv3_weights(w)
    y = folded_conv3_pallas(folding.fold2(x), wf, to_phase=1, interpret=True)
    # mask the phase-1 boundary garbage... the kernel zero-fills edges,
    # so unfold2_phase1 drops exactly the pad planes
    got = folding.unfold2_phase1(y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
