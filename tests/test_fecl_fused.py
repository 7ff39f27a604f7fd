"""fecl_loss_fused (analytic custom-VJP FeCL) vs the dense reference.

Value AND feat-gradient must match `ops.dycon.fecl_loss` for every
config combination the trainer uses. The teacher cotangent is zero by
design (mean-teacher: the trainer stop-gradients teacher embeddings), so
gradient comparisons wrap the dense path's teacher in stop_gradient.
Reference math: /root/reference/code/utils/dycon_losses.py:150-235.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dycon_paper_replication_tpu.ops import dycon
from dycon_paper_replication_tpu.ops.fecl_fused import fecl_loss_fused

KW = dict(temperature=0.6, gamma=2.0, use_focal=True, pos_thresh=1.4, neg_thresh=0.35)


def _inputs(rng, B=2, N=64, D=16):
    feat = rng.normal(size=(B, N, D)).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=-1, keepdims=True)
    tfeat = rng.normal(size=(B, N, D)).astype(np.float32)
    tfeat /= np.linalg.norm(tfeat, axis=-1, keepdims=True)
    mask = rng.integers(0, 2, size=(B, N)).astype(np.float32)
    return jnp.asarray(feat), jnp.asarray(mask), jnp.asarray(tfeat)


class TestFusedFeCL:
    @pytest.mark.parametrize("use_teacher", [False, True])
    @pytest.mark.parametrize("use_focal", [False, True])
    def test_value_matches_dense(self, rng, use_teacher, use_focal):
        f, m, t = _inputs(rng)
        kw = dict(KW, use_focal=use_focal)
        t = t if use_teacher else None
        dense = dycon.fecl_loss(f, m, t, **kw)
        fused = fecl_loss_fused(f, m, t, row_chunk=16, **kw)
        assert np.isclose(fused, dense, rtol=1e-5, atol=1e-5), (fused, dense)

    @pytest.mark.parametrize("use_teacher", [False, True])
    @pytest.mark.parametrize("use_focal", [False, True])
    def test_grads_match_dense(self, rng, use_teacher, use_focal):
        f, m, t = _inputs(rng, B=2, N=32, D=8)
        kw = dict(KW, use_focal=use_focal)
        t = t if use_teacher else None

        def dense(x):
            ts = None if t is None else jax.lax.stop_gradient(t)
            return dycon.fecl_loss(x, m, ts, **kw)

        g_dense = jax.grad(dense)(f)
        g_fused = jax.grad(lambda x: fecl_loss_fused(x, m, t, row_chunk=8, **kw))(f)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_dense),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("use_teacher", [False, True])
    def test_gambling_value_and_grads(self, rng, use_teacher):
        f, m, t = _inputs(rng)
        gamb = jnp.asarray(rng.uniform(0.1, 1.0, size=f.shape[:2]).astype(np.float32))
        t = t if use_teacher else None
        dense = dycon.fecl_loss(f, m, t, gamb, **KW)
        fused = fecl_loss_fused(f, m, t, gamb, row_chunk=16, **KW)
        assert np.isclose(fused, dense, rtol=1e-5, atol=1e-5), (fused, dense)

        def dense_fn(x, g):
            ts = None if t is None else jax.lax.stop_gradient(t)
            return dycon.fecl_loss(x, m, ts, g, **KW)

        gd_f, gd_g = jax.grad(dense_fn, argnums=(0, 1))(f, gamb)
        gf_f, gf_g = jax.grad(
            lambda x, g: fecl_loss_fused(x, m, t, g, row_chunk=16, **KW), argnums=(0, 1)
        )(f, gamb)
        np.testing.assert_allclose(np.asarray(gf_f), np.asarray(gd_f), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gf_g), np.asarray(gd_g), rtol=1e-4, atol=1e-6)

    def test_teacher_cotangent_is_zero(self, rng):
        f, m, t = _inputs(rng, B=1, N=32, D=8)
        g_t = jax.grad(lambda tt: fecl_loss_fused(f, m, tt, row_chunk=16, **KW))(t)
        np.testing.assert_array_equal(np.asarray(g_t), 0.0)

    @pytest.mark.parametrize("use_teacher,use_gamb", [(False, False), (True, False), (True, True)])
    def test_indivisible_pads_and_matches_dense(self, rng, use_teacher, use_gamb, monkeypatch):
        """N % row_chunk != 0 takes the PADDED fused path (masked pad
        rows, sentinel class, analytic VJP), not a chunked/dense
        fallback (VERDICT r4 #7): value and feat-grad match dense."""
        from dycon_paper_replication_tpu.ops import fecl_fused as ff
        f, m, t = _inputs(rng, B=2, N=10, D=8)
        t = t if use_teacher else None
        gamb = (jnp.asarray(rng.uniform(0.1, 1.0, size=f.shape[:2]).astype(np.float32))
                if use_gamb else None)
        dense = dycon.fecl_loss(f, m, t, gamb, **KW)
        # prove no fallback: the fused path must not call fecl_loss_chunked
        monkeypatch.setattr(ff, "fecl_loss_chunked", lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("fecl_loss_fused fell back to chunked")))
        fused = fecl_loss_fused(f, m, t, gamb, row_chunk=16, **KW)
        assert np.isclose(fused, dense, rtol=1e-5, atol=1e-5), (fused, dense)

        def dense_fn(x):
            ts = None if t is None else jax.lax.stop_gradient(t)
            return dycon.fecl_loss(x, m, ts, gamb, **KW)

        g_dense = jax.grad(dense_fn)(f)
        g_fused = jax.grad(lambda x: fecl_loss_fused(x, m, t, gamb, row_chunk=16, **KW))(f)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_dense),
                                   rtol=1e-4, atol=1e-5)

    def test_jit_and_value_grad_together(self, rng):
        """Trainer usage: value_and_grad under jit, teacher present."""
        f, m, t = _inputs(rng, B=2, N=32, D=8)

        @jax.jit
        def step(x):
            return jax.value_and_grad(
                lambda z: fecl_loss_fused(z, m, t, row_chunk=16, **KW)
            )(x)

        v, g = step(f)
        dense = dycon.fecl_loss(f, m, t, **KW)
        assert np.isclose(v, dense, rtol=1e-5)
        assert bool(jnp.isfinite(g).all())
