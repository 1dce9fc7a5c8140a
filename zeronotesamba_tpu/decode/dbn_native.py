"""ctypes bridge to the native C++ Viterbi core (csrc/dbn_viterbi.cpp).

Build with ``make -C csrc`` (done automatically on first use when a compiler
is available). Falls back cleanly when the shared library is missing; the
numpy recursion in decode/dbn.py remains the reference implementation and
the test oracle (tests/test_dbn_native.py asserts exact path equality).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libzns_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.dbn_viterbi.restype = None
    lib.dbn_viterbi.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # log_act
        ctypes.POINTER(ctypes.c_double),  # log_nact
        ctypes.c_int64,  # T
        ctypes.POINTER(ctypes.c_int32),  # intervals
        ctypes.c_int64,  # n_int
        ctypes.POINTER(ctypes.c_double),  # log_trans
        ctypes.POINTER(ctypes.c_uint8),  # is_beat
        ctypes.c_int64,  # n_states
        ctypes.POINTER(ctypes.c_int64),  # firsts
        ctypes.POINTER(ctypes.c_int64),  # lasts
        ctypes.POINTER(ctypes.c_int64),  # path out
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def viterbi_native(
    log_act: np.ndarray,
    log_nact: np.ndarray,
    intervals: np.ndarray,
    log_trans: np.ndarray,
    is_beat: np.ndarray,
    firsts: np.ndarray,
    lasts: np.ndarray,
) -> Optional[np.ndarray]:
    """Run the C++ Viterbi; returns the state path or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    la = np.ascontiguousarray(log_act, dtype=np.float64)
    lna = np.ascontiguousarray(log_nact, dtype=np.float64)
    iv = np.ascontiguousarray(intervals, dtype=np.int32)
    lt = np.ascontiguousarray(log_trans, dtype=np.float64)
    ib = np.ascontiguousarray(is_beat, dtype=np.uint8)
    fs = np.ascontiguousarray(firsts, dtype=np.int64)
    ls = np.ascontiguousarray(lasts, dtype=np.int64)
    t = la.size
    path = np.empty(t, dtype=np.int64)

    def p(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    lib.dbn_viterbi(
        p(la, ctypes.c_double), p(lna, ctypes.c_double), t,
        p(iv, ctypes.c_int32), len(iv),
        p(lt, ctypes.c_double), p(ib, ctypes.c_uint8), ib.size,
        p(fs, ctypes.c_int64), p(ls, ctypes.c_int64),
        p(path, ctypes.c_int64),
    )
    return path
