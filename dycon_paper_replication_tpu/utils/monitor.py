"""Embedding-similarity distribution monitor.

Mirrors the reference's periodic diagnostic (utils/monitor.py:7-51):
histograms of positive-pair vs negative-pair cosine similarities of the
projection embeddings, saved as PNGs. The pairwise similarity matrix is
computed ON DEVICE (one batched matmul + masked histograms via jnp);
only the 50-bin counts cross to the host, not the O(N^2) matrix.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def similarity_histograms(feat: jnp.ndarray, mask: jnp.ndarray, tau: float = 0.6):
    """feat: (B, N, D) L2-normalized embeddings; mask: (B, N) class ids.
    Returns (pos_hist, neg_hist, edges) with 50 bins over the observed
    similarity range scaled by 1/tau."""
    sim = jnp.einsum("bnd,bmd->bnm", feat, feat) / tau
    same = mask[:, :, None] == mask[:, None, :]
    lo, hi = jnp.min(sim), jnp.max(sim)
    edges = jnp.linspace(lo, hi, 51)
    idx = jnp.clip(((sim - lo) / jnp.maximum(hi - lo, 1e-9) * 50).astype(jnp.int32), 0, 49)
    one = jnp.ones_like(sim, jnp.int32)
    pos = jnp.zeros((50,), jnp.int32).at[idx.ravel()].add(jnp.where(same, one, 0).ravel())
    neg = jnp.zeros((50,), jnp.int32).at[idx.ravel()].add(jnp.where(~same, one, 0).ravel())
    return pos, neg, edges


def monitor_similarity_distributions(
    feat, mask, epoch: int, path_prefix: str = "./similarity_plots"
) -> str | None:
    """Save a positive/negative similarity histogram PNG; returns the path
    (None when matplotlib is unavailable)."""
    pos, neg, edges = similarity_histograms(jnp.asarray(feat), jnp.asarray(mask))
    pos, neg, edges = np.asarray(pos), np.asarray(neg), np.asarray(edges)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        return None
    os.makedirs(path_prefix, exist_ok=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    width = (edges[-1] - edges[0]) / 50
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].bar(centers, pos, width=width, alpha=0.7, color="green")
    axes[0].set_title("Positive Pair Similarities")
    axes[1].bar(centers, neg, width=width, alpha=0.7, color="red")
    axes[1].set_title("Negative Pair Similarities")
    for ax in axes:
        ax.set_xlabel("Similarity")
        ax.set_ylabel("Frequency")
    fig.tight_layout()
    out = os.path.join(path_prefix, f"epoch_{epoch}_similarity_distributions.png")
    fig.savefig(out)
    plt.close(fig)
    return out
