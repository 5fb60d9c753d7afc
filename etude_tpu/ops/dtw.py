"""Dynamic time warping for audio-to-audio alignment.

Replacement for the reference's synctoolbox MrMsDTW call
(etude/data/aligner.py:113-122), with the same step set {(1,0), (0,1),
(1,1)} and step weights {1.5, 1.5, 2.0}; the raw optimal path is then made
strictly monotonic (reference post-processes with
make_path_strictly_monotonic).

TPU-first: the accumulation runs as an anti-diagonal wavefront `lax.scan` —
cells on diagonal d depend only on diagonals d-1 and d-2, so each scan step
is full-vector work with no sequential inner dependency. One jit program
emits a compact uint8 traceback; the path backtrace is a cheap host walk.
Cost: alpha · (1 − chroma similarity) + (1 − alpha) · (1 − onset similarity).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

W_H = 1.5   # (0,1) horizontal (advance j)
W_V = 1.5   # (1,0) vertical (advance i)
W_D = 2.0   # (1,1) diagonal
_NEG = jnp.float32(1e30)


@jax.jit
def _dtw_scan(cost: jnp.ndarray):
    """cost [N, M] → traceback codes [N+M-1, N] uint8 per anti-diagonal.

    Diagonal d holds cells (i, d-i); the row vector is indexed by i.
    Codes: 0 = from (i, j-1), 1 = from (i-1, j), 2 = from (i-1, j-1).
    """
    N, M = cost.shape

    def diag_cost(d):
        i = jnp.arange(N)
        j = d - i
        valid = (j >= 0) & (j < M)
        return jnp.where(valid, cost[i, jnp.clip(j, 0, M - 1)], _NEG), valid

    def step(carry, d):
        prev1, prev2 = carry  # D over diagonals d-1, d-2 (indexed by i)
        c_d, valid = diag_cost(d)

        from_h = prev1 + W_H * c_d                      # (0,1): same i
        shifted1 = jnp.concatenate([jnp.full((1,), _NEG), prev1[:-1]])
        from_v = shifted1 + W_V * c_d                   # (1,0): i-1 on d-1
        shifted2 = jnp.concatenate([jnp.full((1,), _NEG), prev2[:-1]])
        from_d = shifted2 + W_D * c_d                   # (1,1): i-1 on d-2

        stacked = jnp.stack([from_h, from_v, from_d])
        best = jnp.argmin(stacked, axis=0).astype(jnp.uint8)
        new = jnp.where(valid, jnp.min(stacked, axis=0), _NEG)
        return (new, prev1), (new, best)

    # Diagonal 0: only (0, 0).
    d0 = jnp.full((N,), _NEG).at[0].set(cost[0, 0])
    init = (d0, jnp.full((N,), _NEG))
    (_, _), (rows, codes) = jax.lax.scan(step, init, jnp.arange(1, N + M - 1))
    codes = jnp.concatenate([jnp.zeros((1, N), jnp.uint8), codes], axis=0)
    final = rows[-1]  # diagonal N+M-2 (corner at i = N-1)
    return final, codes


def make_path_strictly_monotonic(path: np.ndarray) -> np.ndarray:
    """Drop points so both coordinate rows strictly increase (keeps the last
    point of every horizontal/vertical run plus the endpoints)."""
    i, j = path
    keep = [0]
    for k in range(1, path.shape[1]):
        if i[k] > i[keep[-1]] and j[k] > j[keep[-1]]:
            keep.append(k)
        else:
            # Replace the previous anchor if this point strictly dominates the
            # one before it (end of a flat run).
            if len(keep) >= 2 and i[k] > i[keep[-2]] and j[k] > j[keep[-2]]:
                keep[-1] = k
    if keep[-1] != path.shape[1] - 1:
        keep.append(path.shape[1] - 1)
    return path[:, keep]


def dtw_path(
    feat_a_chroma: np.ndarray, feat_a_onset: np.ndarray,
    feat_b_chroma: np.ndarray, feat_b_onset: np.ndarray,
    alpha: float = 0.5,
) -> np.ndarray:
    """Returns the warping path wp [2, L] with wp[0] = indices into a,
    wp[1] = indices into b (both strictly increasing)."""
    a_c = jnp.asarray(feat_a_chroma, jnp.float32)
    b_c = jnp.asarray(feat_b_chroma, jnp.float32)
    a_o = jnp.asarray(feat_a_onset, jnp.float32)
    b_o = jnp.asarray(feat_b_onset, jnp.float32)

    chroma_cost = 1.0 - a_c @ b_c.T
    onset_cost = 1.0 - a_o @ b_o.T
    cost = alpha * chroma_cost + (1.0 - alpha) * onset_cost

    _, codes = _dtw_scan(cost)
    codes = np.asarray(codes)

    N, M = cost.shape
    i, j = N - 1, M - 1
    path = [(i, j)]
    while i > 0 or j > 0:
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            code = int(codes[i + j, i])
            if code == 0:
                j -= 1
            elif code == 1:
                i -= 1
            else:
                i -= 1
                j -= 1
        path.append((i, j))
    path.reverse()
    wp = np.asarray(path, dtype=np.int64).T
    return make_path_strictly_monotonic(wp)
