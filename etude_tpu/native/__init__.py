"""Native (C++) runtime components, built on demand with g++ and bound via
ctypes. Each component has a pure JAX/numpy fallback; the native path is the
host-runtime fast lane (e.g. DBN Viterbi decoding, the one genuinely
algorithmic native dependency of the reference — madmom's Cython decoder)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils.logger import logger

_SRC_DIR = Path(__file__).parent
_LIB_CACHE: dict = {}


def _build_library(source_name: str) -> Optional[Path]:
    """Compile a .cc source into a cached shared library; None on failure."""
    src = _SRC_DIR / source_name
    if not src.exists():
        return None
    tag = hashlib.sha1(src.read_bytes()).hexdigest()[:12]
    build_dir = Path(
        os.environ.get("ETUDE_NATIVE_BUILD_DIR",
                       Path(tempfile.gettempdir()) / "etude_native")
    )
    build_dir.mkdir(parents=True, exist_ok=True)
    lib_path = build_dir / f"{src.stem}_{tag}.so"
    if lib_path.exists():
        return lib_path
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        str(src), "-o", str(lib_path),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        detail = getattr(exc, "stderr", "") or str(exc)
        logger.warn(f"native build of {source_name} failed: {detail[:300]}")
        return None
    return lib_path


def load_dbn_library() -> Optional[ctypes.CDLL]:
    """The DBN Viterbi shared library, or None when unavailable."""
    if "dbn" in _LIB_CACHE:
        return _LIB_CACHE["dbn"]
    lib_path = _build_library("dbn_viterbi.cc")
    lib = None
    if lib_path is not None:
        try:
            lib = ctypes.CDLL(str(lib_path))
            lib.dbn_viterbi.restype = ctypes.c_double
            lib.dbn_viterbi.argtypes = [
                ctypes.POINTER(ctypes.c_float),   # cols [T, n_cols]
                ctypes.c_int64,                   # n_cols
                ctypes.POINTER(ctypes.c_int8),    # ptr [S]
                ctypes.c_int64, ctypes.c_int64,   # T, S
                ctypes.POINTER(ctypes.c_int64),   # first_idx
                ctypes.POINTER(ctypes.c_int64),   # last_idx
                ctypes.c_int64, ctypes.c_int64,   # n_blocks, n_tempi
                ctypes.POINTER(ctypes.c_float),   # logT
                ctypes.POINTER(ctypes.c_int64),   # out_path
            ]
        except OSError as exc:
            logger.warn(f"failed to load native DBN library: {exc}")
            lib = None
    _LIB_CACHE["dbn"] = lib
    return lib


def native_dbn_available() -> bool:
    return load_dbn_library() is not None


def dbn_viterbi_native(
    cols: np.ndarray,       # [T, n_cols] f32 per-frame observation densities
    ptr: np.ndarray,        # [S] int8 column index each state emits
    first_idx: np.ndarray,  # [n_blocks, n_tempi] int64
    last_idx: np.ndarray,   # [n_blocks, n_tempi] int64
    logT: np.ndarray,       # [n_tempi, n_tempi] f32
):
    """Returns (path [T] int64, log_prob) via the native decoder."""
    lib = load_dbn_library()
    if lib is None:
        raise RuntimeError("native DBN library unavailable")
    cols = np.ascontiguousarray(cols, np.float32)
    ptr = np.ascontiguousarray(ptr, np.int8)
    first = np.ascontiguousarray(first_idx, np.int64)
    last = np.ascontiguousarray(last_idx, np.int64)
    logT = np.ascontiguousarray(logT, np.float32)
    T, n_cols = cols.shape
    S = ptr.shape[0]
    n_blocks, n_tempi = first.shape
    path = np.empty(T, np.int64)
    log_prob = lib.dbn_viterbi(
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_cols,
        ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        T, S,
        first.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        last.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_blocks, n_tempi,
        logT.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return path, float(log_prob)


def load_dtw_band_library() -> Optional[ctypes.CDLL]:
    """The banded-DTW shared library, or None when unavailable."""
    if "dtw_band" in _LIB_CACHE:
        return _LIB_CACHE["dtw_band"]
    lib_path = _build_library("dtw_band.cc")
    lib = None
    if lib_path is not None:
        try:
            lib = ctypes.CDLL(str(lib_path))
            lib.dtw_band.restype = ctypes.c_double
            lib.dtw_band.argtypes = [
                ctypes.POINTER(ctypes.c_float),   # cost_band [N, 2w+1]
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # N, M, w
                ctypes.POINTER(ctypes.c_int64),   # centers [N]
                ctypes.c_float, ctypes.c_float, ctypes.c_float,  # step weights
                ctypes.POINTER(ctypes.c_uint8),   # out codes [N, 2w+1]
            ]
        except OSError as exc:
            logger.warn(f"failed to load native banded-DTW library: {exc}")
            lib = None
    _LIB_CACHE["dtw_band"] = lib
    return lib


def dtw_band_native(
    cost_band: np.ndarray,   # [N, 2w+1] f32
    m: int,
    centers: np.ndarray,     # [N] int64
    weights=(1.5, 1.5, 2.0),
):
    """Returns (codes [N, 2w+1] uint8, final cost) via the native DP."""
    lib = load_dtw_band_library()
    if lib is None:
        raise RuntimeError("native banded-DTW library unavailable")
    cost_band = np.ascontiguousarray(cost_band, np.float32)
    centers = np.ascontiguousarray(centers, np.int64)
    n, bw = cost_band.shape
    w = (bw - 1) // 2
    codes = np.empty((n, bw), np.uint8)
    final = lib.dtw_band(
        cost_band.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, m, w,
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_float(weights[0]), ctypes.c_float(weights[1]),
        ctypes.c_float(weights[2]),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return codes, float(final)


def load_resample_library() -> Optional[ctypes.CDLL]:
    """The polyphase-resample shared library, or None when unavailable."""
    if "resample" in _LIB_CACHE:
        return _LIB_CACHE["resample"]
    lib_path = _build_library("resample_fir.cc")
    lib = None
    if lib_path is not None:
        try:
            lib = ctypes.CDLL(str(lib_path))
            lib.upfirdn_poly_f32.restype = None
            lib.upfirdn_poly_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),   # hp_rev [up, K]
                ctypes.c_int64, ctypes.c_int64,   # up, K
                ctypes.POINTER(ctypes.c_float),   # x [Lx]
                ctypes.c_int64, ctypes.c_int64,   # Lx, down
                ctypes.c_int64, ctypes.c_int64,   # n_start, n_out
                ctypes.POINTER(ctypes.c_float),   # y [n_out]
                ctypes.c_int64,                   # n_threads
            ]
        except OSError as exc:
            logger.warn(f"failed to load native resample library: {exc}")
            lib = None
    _LIB_CACHE["resample"] = lib
    return lib


def upfirdn_poly_native(
    hp_rev: np.ndarray,   # [up, K] f32 k-reversed polyphase filter
    x: np.ndarray,        # [Lx] f32 signal
    down: int,
    n_start: int,
    n_out: int,
    n_threads: int = 4,
) -> np.ndarray:
    """Polyphase upfirdn outputs n in [n_start, n_start + n_out)."""
    lib = load_resample_library()
    if lib is None:
        raise RuntimeError("native resample library unavailable")
    hp_rev = np.ascontiguousarray(hp_rev, np.float32)
    x = np.ascontiguousarray(x, np.float32)
    up, K = hp_rev.shape
    y = np.empty(n_out, np.float32)
    lib.upfirdn_poly_f32(
        hp_rev.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        up, K,
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.shape[0], down,
        n_start, n_out,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return y
