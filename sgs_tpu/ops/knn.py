"""3-nearest-neighbor mean squared distance — the simple-knn replacement.

The reference calls `simple_knn._C.distCUDA2(points)` (CUDA Morton-grid KNN)
only to set initial Gaussian scales (/root/reference/scene/gaussian_model.py:144,
SURVEY.md §2.10). Exactness is not required there; this is an exact
brute-force version expressed as chunked (Q, N) distance matrices so the
inner products ride the MXU. O(N^2) flops but only run once at scene init.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "chunk"))
def mean_sq_dist_knn(points: jnp.ndarray, k: int = 3, chunk: int = 4096) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest OTHER points.

    Args:
      points: (N, 3) float32.
    Returns: (N,) float32.
    """
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    sq = jnp.sum(pts * pts, axis=-1)  # (N,)

    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    q = jnp.pad(pts, ((0, pad), (0, 0)))
    q_sq = jnp.pad(sq, (0, pad))
    q_blocks = q.reshape(num_chunks, chunk, 3)
    q_sq_blocks = q_sq.reshape(num_chunks, chunk)

    def block_fn(args):
        qb, qsqb = args
        # d2[i, j] = |q_i|^2 + |p_j|^2 - 2 q_i . p_j  (MXU matmul).
        # Keys are the unpadded points; padded query rows are sliced off.
        dots = jnp.matmul(qb, pts.T, precision=jax.lax.Precision.HIGHEST)
        d2 = qsqb[:, None] + sq[None, :] - 2.0 * dots
        d2 = jnp.maximum(d2, 0.0)
        # top-(k+1) smallest d2 arrive ascending; entry 0 is the self-match.
        neg_topk, _ = jax.lax.top_k(-d2, k + 1)
        smallest = -neg_topk
        return jnp.mean(smallest[:, 1 : k + 1], axis=-1)

    out = jax.lax.map(block_fn, (q_blocks, q_sq_blocks))
    return out.reshape(num_chunks * chunk)[:n]


def mean_sq_dist_3nn(points: jnp.ndarray) -> jnp.ndarray:
    """The distCUDA2 contract: mean sq distance to the 3 nearest neighbors."""
    return mean_sq_dist_knn(points, k=3)
