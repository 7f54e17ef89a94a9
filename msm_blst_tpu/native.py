"""ctypes bindings for the native host runtime (native/libmsm_host.so).

The native library accelerates the host-side init/query passes that the
reference also keeps native (scalar recoding carry chains, bucket-set and
digit-table construction — multi_scalar.c:748-775, auxiliaryfunc.h:257-288,
main_p1.cpp:139-153). Every entry point has a numpy fallback in
msm/recode.py and msm/params.py; `available()` reports whether the .so is
loaded. Build with `make -C native` (done automatically on first import if
a compiler is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libmsm_host.so")
_SRC_PATH = os.path.join(_REPO_ROOT, "native", "recode.cpp")

_lib: Optional[ctypes.CDLL] = None


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native")],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) or (
        os.path.exists(_SRC_PATH)
        and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
    ):
        if not _try_build():
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    lib.msm_qary_digits.argtypes = [u32p, i64, i32, i32, i32p]
    lib.msm_qary_digits.restype = None
    lib.msm_ches_recode.argtypes = [
        u32p, i64, i32, i32, i32p, i32p, i32p, i32p, i32p, u8p,
    ]
    lib.msm_ches_recode.restype = ctypes.c_int
    lib.msm_bgmw_recode.argtypes = [u32p, i64, i32, i32, i32, u32p, i32p, u8p]
    lib.msm_bgmw_recode.restype = ctypes.c_int
    lib.msm_construct_bucket_set.argtypes = [i64, i64, i32p]
    lib.msm_construct_bucket_set.restype = i64
    lib.msm_digit_conversion_table.argtypes = [i64, i32p, i64, i32p, i32p, i32p]
    lib.msm_digit_conversion_table.restype = i64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def qary_digits(scalars_u32: np.ndarray, c: int, h: int) -> np.ndarray:
    """uint32[8, n] -> int32[h, n] (native). Raises if library unavailable."""
    lib = _load()
    assert lib is not None
    scalars_u32 = np.ascontiguousarray(scalars_u32, dtype=np.uint32)
    n = scalars_u32.shape[1]
    out = np.empty((h, n), dtype=np.int32)
    lib.msm_qary_digits(scalars_u32, n, c, h, out)
    return out


def ches_recode(scalars_u32: np.ndarray, c: int, h: int, m_t, b_t, a_t):
    """Native integral MB-radix-q conversion. Returns (b, m, sign) [h, n]."""
    lib = _load()
    assert lib is not None
    scalars_u32 = np.ascontiguousarray(scalars_u32, dtype=np.uint32)
    n = scalars_u32.shape[1]
    b_out = np.empty((h, n), dtype=np.int32)
    m_out = np.empty((h, n), dtype=np.int32)
    s_out = np.empty((h, n), dtype=np.uint8)
    rc = lib.msm_ches_recode(
        scalars_u32, n, c, h,
        np.ascontiguousarray(m_t, dtype=np.int32),
        np.ascontiguousarray(b_t, dtype=np.int32),
        np.ascontiguousarray(a_t, dtype=np.int32),
        b_out, m_out, s_out,
    )
    if rc != 0:
        raise ValueError("CHES recode: leading-digit carry (invalid config)")
    return b_out, m_out, s_out.astype(bool)


def bgmw_recode(scalars_u32: np.ndarray, c: int, h: int, fold: bool):
    """Native BGMW95 signed q/2 recode (+ optional r-a fold)."""
    from .constants import R_ORDER

    lib = _load()
    assert lib is not None
    scalars_u32 = np.ascontiguousarray(scalars_u32, dtype=np.uint32)
    n = scalars_u32.shape[1]
    r_limbs = np.array(
        [(R_ORDER >> (32 * i)) & 0xFFFFFFFF for i in range(8)], dtype=np.uint32
    )
    absd = np.empty((h, n), dtype=np.int32)
    sign = np.empty((h, n), dtype=np.uint8)
    rc = lib.msm_bgmw_recode(
        scalars_u32, n, c, h, int(fold), r_limbs, absd, sign
    )
    if rc != 0:
        raise ValueError("BGMW recode: leading digit exceeds q/2")
    return absd, sign.astype(bool)


def construct_bucket_set(q: int, ah: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.empty(q // 2 + 2, dtype=np.int32)
    k = lib.msm_construct_bucket_set(q, ah, out)
    return out[:k].copy()


def digit_conversion_table(q: int, bucket_set: np.ndarray):
    """Returns (m_t, b_t, a_t, missing_count)."""
    lib = _load()
    assert lib is not None
    bucket_set = np.ascontiguousarray(bucket_set, dtype=np.int32)
    m_t = np.empty(q + 1, dtype=np.int32)
    b_t = np.empty(q + 1, dtype=np.int32)
    a_t = np.empty(q + 1, dtype=np.int32)
    missing = lib.msm_digit_conversion_table(
        q, bucket_set, len(bucket_set), m_t, b_t, a_t
    )
    return m_t, b_t, a_t, int(missing)
