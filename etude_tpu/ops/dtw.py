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


# ===================================================== multi-resolution DTW
# MrMsDTW-style coarse-to-fine alignment (reference: synctoolbox
# sync_via_mrmsdtw, etude/data/aligner.py:113-121): a full DTW at a heavily
# downsampled resolution anchors the path; each finer level refines it inside
# a diagonal band around the projected coarse path. Memory is O(N · band)
# instead of O(N · M) — two 4-minute songs at 50 Hz are ~12k × 12k (≈576 MB
# f32 full matrix) but only ~12k × 129 (≈6 MB) banded.

def _smooth_downsample(
    chroma: np.ndarray, onset: np.ndarray, factor: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Average-pool features over time by `factor`; chroma re-ℓ2-normalized
    (synctoolbox smooths with a window then decimates — same effect)."""
    if factor == 1:
        return chroma, onset
    T = (chroma.shape[0] // factor) * factor
    c = chroma[:T].reshape(-1, factor, chroma.shape[1]).mean(axis=1)
    o = onset[:T].reshape(-1, factor, onset.shape[1]).mean(axis=1)
    c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-9)
    o = o / np.maximum(np.linalg.norm(o, axis=1, keepdims=True), 1e-9)
    return c.astype(np.float32), o.astype(np.float32)


def _band_centers_from_path(
    wp: np.ndarray, factor_prev: int, factor: int, n: int, m: int, w: int
) -> np.ndarray:
    """Project a coarse path onto the finer grid → monotone band centers."""
    scale = factor_prev / factor
    anchors_i = wp[0] * scale
    anchors_j = wp[1] * scale
    centers = np.interp(np.arange(n), anchors_i, anchors_j)
    centers = np.round(centers).astype(np.int64)
    centers = np.clip(centers, 0, m - 1)
    # The band must contain the matrix corners.
    centers[0] = min(centers[0], w)
    centers[-1] = max(centers[-1], m - 1 - w)
    return np.maximum.accumulate(centers)


def _banded_cost(
    a_chroma, a_onset, b_chroma, b_onset, centers, w, alpha
) -> np.ndarray:
    """[N, 2w+1] cost gathered along the band (O(N·w·d) work)."""
    N, M = a_chroma.shape[0], b_chroma.shape[0]
    offs = np.arange(-w, w + 1)
    cols = centers[:, None] + offs[None, :]          # [N, 2w+1]
    valid = (cols >= 0) & (cols < M)
    cols_c = np.clip(cols, 0, M - 1)
    bc = b_chroma[cols_c]                            # [N, 2w+1, d]
    bo = b_onset[cols_c]
    chroma_sim = np.einsum("nd,nkd->nk", a_chroma, bc)
    onset_sim = np.einsum("nd,nkd->nk", a_onset, bo)
    cost = alpha * (1.0 - chroma_sim) + (1.0 - alpha) * (1.0 - onset_sim)
    return np.where(valid, cost, 1e6).astype(np.float32)


def _dtw_band_numpy(cost_band, m, centers, weights=(W_H, W_V, W_D)):
    """Pure-numpy fallback for the native banded DP (same contract)."""
    n, bw = cost_band.shape
    w = (bw - 1) // 2
    INF = np.inf
    codes = np.full((n, bw), 255, np.uint8)
    prev = np.full(bw, INF)
    c0 = centers[0]
    for k in range(bw):
        j = c0 + k - w
        if j < 0 or j >= m:
            continue
        if j == 0:
            prev[k] = cost_band[0, k]
        elif k > 0 and prev[k - 1] < INF:
            prev[k] = prev[k - 1] + weights[0] * cost_band[0, k]
            codes[0, k] = 0
    for i in range(1, n):
        dc = int(centers[i] - centers[i - 1])
        curr = np.full(bw, INF)
        row = cost_band[i]
        for k in range(bw):
            j = centers[i] + k - w
            if j < 0 or j >= m:
                continue
            c = row[k]
            best, code = INF, 255
            kv = k + dc
            if 0 <= kv < bw and prev[kv] < INF:
                v = prev[kv] + weights[1] * c
                if v < best:
                    best, code = v, 1
            kd = k + dc - 1
            if 0 <= kd < bw and prev[kd] < INF:
                v = prev[kd] + weights[2] * c
                if v < best:
                    best, code = v, 2
            if k > 0 and curr[k - 1] < INF:
                v = curr[k - 1] + weights[0] * c
                if v < best:
                    best, code = v, 0
            curr[k] = best
            codes[i, k] = code
        prev = curr
    k_end = (m - 1) - int(centers[-1]) + w
    final = prev[k_end] if 0 <= k_end < bw else INF
    return codes, float(final)


def _walk_band_codes(codes, centers, w, n, m) -> np.ndarray:
    """Traceback through banded codes → path [2, L] from (0,0) to (n-1,m-1)."""
    i, j = n - 1, m - 1
    path = [(i, j)]
    while i > 0 or j > 0:
        k = j - int(centers[i]) + w
        code = int(codes[i, k]) if 0 <= k < codes.shape[1] else 255
        if code == 0:
            j -= 1
        elif code == 1:
            i -= 1
        elif code == 2:
            i -= 1
            j -= 1
        else:
            # Unreachable cell (should not happen with corner-anchored
            # centers); fall back to a diagonal step toward the origin.
            i, j = max(i - 1, 0), max(j - 1, 0)
        path.append((i, j))
    path.reverse()
    return np.asarray(path, np.int64).T


def dtw_path_banded(
    a_chroma, a_onset, b_chroma, b_onset,
    centers: np.ndarray, band: int, alpha: float = 0.5,
) -> np.ndarray:
    """Banded DTW around monotone `centers` (band half-width `band`)."""
    cost_band = _banded_cost(
        a_chroma, a_onset, b_chroma, b_onset, centers, band, alpha
    )
    M = b_chroma.shape[0]
    try:
        from ..native import dtw_band_native

        codes, final = dtw_band_native(cost_band, M, centers)
    except (RuntimeError, OSError):
        codes, final = _dtw_band_numpy(cost_band, M, centers)
    if not np.isfinite(final):
        raise RuntimeError("banded DTW found no path (band too narrow)")
    wp = _walk_band_codes(codes, centers, band, a_chroma.shape[0], M)
    return make_path_strictly_monotonic(wp)


def mrms_dtw_path(
    feat_a_chroma: np.ndarray, feat_a_onset: np.ndarray,
    feat_b_chroma: np.ndarray, feat_b_onset: np.ndarray,
    alpha: float = 0.5,
    levels: Tuple[int, ...] = (16, 4, 1),
    band: int = 64,
) -> np.ndarray:
    """Coarse-to-fine DTW: full wavefront DTW at 1/levels[0] resolution, then
    banded refinement at each finer level. Path semantics match dtw_path."""
    a_c = np.asarray(feat_a_chroma, np.float32)
    a_o = np.asarray(feat_a_onset, np.float32)
    b_c = np.asarray(feat_b_chroma, np.float32)
    b_o = np.asarray(feat_b_onset, np.float32)

    # Coarsest level: full DTW on the downsampled features.
    f0 = levels[0]
    ac, ao = _smooth_downsample(a_c, a_o, f0)
    bc, bo = _smooth_downsample(b_c, b_o, f0)
    wp = dtw_path(ac, ao, bc, bo, alpha=alpha)

    prev_factor = f0
    for f in levels[1:]:
        ac, ao = _smooth_downsample(a_c, a_o, f)
        bc, bo = _smooth_downsample(b_c, b_o, f)
        n, m = ac.shape[0], bc.shape[0]
        centers = _band_centers_from_path(wp, prev_factor, f, n, m, band)
        wp = dtw_path_banded(ac, ao, bc, bo, centers, band, alpha=alpha)
        prev_factor = f
    return wp
