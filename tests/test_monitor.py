"""Similarity-histogram monitor (utils/monitor.py) vs a numpy reference.

Parity target: the reference's periodic embedding diagnostic
(/root/reference/code/utils/monitor.py:7-51) — histograms of positive-
vs negative-pair cosine similarities. The TPU version is chunked and
scatter-free; values must match the straightforward dense computation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dycon_paper_replication_tpu.utils.monitor import similarity_histograms


def _reference(feat, mask, tau=0.6):
    sim = np.einsum("bnd,bmd->bnm", feat, feat) / tau
    same = mask[:, :, None] == mask[:, None, :]
    lo, hi = sim.min(), sim.max()
    idx = np.clip(((sim - lo) / max(hi - lo, 1e-9) * 50).astype(np.int64), 0, 49)
    pos = np.bincount(idx[same], minlength=50)
    neg = np.bincount(idx[~same], minlength=50)
    edges = np.linspace(lo, hi, 51)
    return pos, neg, edges


@pytest.mark.parametrize("N", [64, 96])  # 64 hits the chunk==N fallback path
def test_histograms_match_dense_reference(rng, N):
    B, D = 2, 16
    feat = rng.normal(size=(B, N, D)).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=-1, keepdims=True)
    mask = rng.integers(0, 2, size=(B, N)).astype(np.float32)
    pos, neg, edges = similarity_histograms(jnp.asarray(feat), jnp.asarray(mask))
    w_pos, w_neg, w_edges = _reference(feat, mask)
    np.testing.assert_array_equal(np.asarray(pos), w_pos)
    np.testing.assert_array_equal(np.asarray(neg), w_neg)
    np.testing.assert_allclose(np.asarray(edges), w_edges, rtol=1e-5)
    assert int(pos.sum() + neg.sum()) == B * N * N


def test_chunked_matches_unchunked_shape(rng):
    """512-divisible N exercises the chunked scan path."""
    B, N, D = 1, 512, 8
    feat = rng.normal(size=(B, N, D)).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=-1, keepdims=True)
    mask = (rng.uniform(size=(B, N)) > 0.5).astype(np.float32)
    pos, neg, edges = similarity_histograms(jnp.asarray(feat), jnp.asarray(mask))
    w_pos, w_neg, _ = _reference(feat, mask)
    np.testing.assert_array_equal(np.asarray(pos), w_pos)
    np.testing.assert_array_equal(np.asarray(neg), w_neg)
