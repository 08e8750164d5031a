"""ctypes bindings for the native runtime library.

The reference's native layer is external processes (Kaldi binaries, sox,
joblib forks); here it is one in-process shared library
(``libmlvae_native.so``: Kaldi-compat fbank/deltas/CMVN, OpenMP MD Viterbi,
WAV decode + resample) built from ``src/*.cc``.

``load(build=True)`` compiles on first use (g++, ~2 s) and caches the .so
next to the sources; all callers degrade gracefully to the numpy/JAX paths
when no compiler is available.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libmlvae_native.so"
_lib: Optional[ctypes.CDLL] = None


def build() -> bool:
    """Build under an exclusive lock, compiling to a process-unique temp
    name and atomically renaming into place: concurrent first-use callers
    (forked loader workers, parallel pytest) must never dlopen a torn
    .so or race two g++ invocations onto one output path."""
    import fcntl

    lock_path = _DIR / ".build.lock"
    try:
        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            if _SO.exists():
                return True
            tmp = _DIR / f".{_SO.name}.{os.getpid()}.tmp"
            try:
                subprocess.run(
                    ["make", "-C", str(_DIR), f"OUT={tmp.name}"],
                    check=True, capture_output=True)
                os.replace(tmp, _SO)  # atomic on the same filesystem
                return True
            finally:
                tmp.unlink(missing_ok=True)
    except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
        logger.warning("native build failed: %s", e)
        return False


def load(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        if not build_if_missing or not build():
            return None
    lib = ctypes.CDLL(str(_SO))

    i32, i64, f32p, f64p, i32p = (
        ctypes.c_int32, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
    )
    lib.mlvae_kaldi_num_frames.restype = i32
    lib.mlvae_kaldi_num_frames.argtypes = [i32, i32]
    lib.mlvae_kaldi_fbank.restype = i32
    lib.mlvae_kaldi_fbank.argtypes = [f32p, i32, i32, i32, i32, i32, f32p]
    lib.mlvae_add_deltas.argtypes = [f32p, i32, i32, i32, i32, f32p]
    lib.mlvae_cmvn_accumulate.argtypes = [f32p, i32, i32, f64p, f64p, f64p]
    lib.mlvae_cmvn_apply.argtypes = [f32p, i32, i32, f64p, f64p,
                                     ctypes.c_double, i32]
    lib.mlvae_md_viterbi_batch.argtypes = [
        f32p, f32p, i32p, f32p, f32p, i32p, i32p,
        i32, i32, i32, i32, ctypes.c_float, i32p, i32p, i32p,
    ]
    lib.mlvae_num_threads.restype = i32
    lib.mlvae_read_wav.restype = i64
    lib.mlvae_read_wav.argtypes = [ctypes.c_char_p, f32p, i32p]
    lib.mlvae_resample.restype = i64
    lib.mlvae_resample.argtypes = [f32p, i64, i32, i32, f32p, i64]
    _lib = lib
    return lib


def _fp(a):  # float32 pointer
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


# ---------------------------------------------------------------------------
# high-level wrappers (numpy in / numpy out)
# ---------------------------------------------------------------------------

def kaldi_fbank(wave: np.ndarray, sample_rate=16000, shift=320, window=400,
                n_mels=40) -> np.ndarray:
    lib = _require()
    wave = np.ascontiguousarray(wave, np.float32)
    T = lib.mlvae_kaldi_num_frames(len(wave), shift)
    out = np.empty((T, n_mels), np.float32)
    lib.mlvae_kaldi_fbank(_fp(wave), len(wave), sample_rate, shift, window,
                          n_mels, _fp(out))
    return out


def _require() -> ctypes.CDLL:
    lib = load()
    if lib is None:
        raise RuntimeError(
            "native library unavailable (no C++ toolchain?); use the "
            "numpy/XLA fallbacks in ops.frontend_ref / ops.fbank / "
            "data.wav instead")
    return lib


def add_deltas(feats: np.ndarray, order=2, window=2) -> np.ndarray:
    lib = _require()
    feats = np.ascontiguousarray(feats, np.float32)
    T, C = feats.shape
    out = np.empty((T, C * (order + 1)), np.float32)
    lib.mlvae_add_deltas(_fp(feats), T, C, order, window, _fp(out))
    return out


def cmvn(utts, norm_vars=True):
    """Per-speaker CMVN over a list of (T, C) utterances; returns new list."""
    lib = _require()
    C = utts[0].shape[1]
    total = np.zeros(C, np.float64)
    sq = np.zeros(C, np.float64)
    count = np.zeros(1, np.float64)
    cont = [np.ascontiguousarray(u, np.float32) for u in utts]
    for u in cont:
        lib.mlvae_cmvn_accumulate(_fp(u), u.shape[0], C, _dp(total), _dp(sq),
                                  _dp(count))
    out = []
    for u in cont:
        v = u.copy()
        lib.mlvae_cmvn_apply(_fp(v), v.shape[0], C, _dp(total), _dp(sq),
                             float(count[0]), int(norm_vars))
        out.append(v)
    return out


def md_viterbi_batch(log_p_yx, log_p_y, y, log_p_b, log_p_pi, t_lens, l_lens,
                     weight=1.0):
    """OpenMP-batch MD Viterbi; same contract as ops.decode.md_viterbi_batch
    (returns padded int32 boundary/flvl/plvl arrays)."""
    lib = _require()
    log_p_yx = np.ascontiguousarray(log_p_yx, np.float32)
    log_p_y = np.ascontiguousarray(log_p_y, np.float32)
    y = np.ascontiguousarray(y, np.int32)
    log_p_b = np.ascontiguousarray(log_p_b, np.float32)
    log_p_pi = np.ascontiguousarray(log_p_pi, np.float32)
    t_lens = np.ascontiguousarray(t_lens, np.int32)
    l_lens = np.ascontiguousarray(l_lens, np.int32)
    B, T, N, _ = log_p_yx.shape
    L = y.shape[1]
    boundary = np.zeros((B, T), np.int32)
    flvl = np.zeros((B, T), np.int32)
    plvl = np.zeros((B, L), np.int32)
    lib.mlvae_md_viterbi_batch(
        _fp(log_p_yx), _fp(log_p_y), _ip(y), _fp(log_p_b), _fp(log_p_pi),
        _ip(t_lens), _ip(l_lens), B, T, L, N, float(weight),
        _ip(boundary), _ip(flvl), _ip(plvl),
    )
    return boundary, flvl, plvl


def read_wav(path):
    lib = _require()
    sr = np.zeros(1, np.int32)
    n = lib.mlvae_read_wav(str(path).encode(), None, _ip(sr))
    if n < 0:
        raise IOError(f"cannot read wav: {path}")
    out = np.empty(n, np.float32)
    # a truncated file yields fewer samples than the header promised; the
    # fill call's return is authoritative (the tail would be uninitialized)
    have = lib.mlvae_read_wav(str(path).encode(), _fp(out), _ip(sr))
    if have < 0:
        raise IOError(f"cannot read wav: {path}")
    return out[:have], int(sr[0])


def resample(wave, sr_in: int, sr_out: int):
    lib = _require()
    wave = np.ascontiguousarray(wave, np.float32)
    cap = int(np.ceil(len(wave) * sr_out / sr_in)) + 8
    out = np.empty(cap, np.float32)
    n = lib.mlvae_resample(_fp(wave), len(wave), sr_in, sr_out, _fp(out), cap)
    return out[:n]
