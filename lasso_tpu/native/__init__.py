"""ctypes bindings for the native host crypto core (native/host_crypto.cpp).

Build: `make native` (or automatic on first import if g++ is available).
Everything degrades gracefully to the pure-Python oracles when the shared
library is absent; parity tests (tests/test_native.py) pin the two against
each other.  Disable with LASSO_TPU_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native", "host_crypto.cpp")
_SO = os.path.join(_HERE, "_libhostcrypto.so")

_lib = None


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", _SO],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _build_key() -> str:
    """Rebuild key: source content hash + host CPU tag.

    The library is built with -march=native and is NOT committed (git does
    not preserve mtimes, and a binary from another CPU could SIGILL), so the
    key must change when either the source or the host changes."""
    import hashlib
    import platform

    h = hashlib.sha256()
    try:
        with open(os.path.abspath(_SRC), "rb") as f:
            h.update(f.read())
    except OSError:
        return ""
    h.update(platform.machine().encode())
    h.update(platform.processor().encode())
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"model name") or line.startswith(b"flags"):
                    h.update(line)
                    break
    except OSError:
        pass
    return h.hexdigest()


def _load():
    global _lib
    if os.environ.get("LASSO_TPU_NATIVE", "1") in ("0", "off"):
        return None
    key = _build_key()
    key_path = _SO + ".key"
    have_key = ""
    try:
        with open(key_path) as f:
            have_key = f.read().strip()
    except OSError:
        pass
    if not os.path.exists(_SO) or not key or have_key != key:
        if not _build():
            return None
        try:
            with open(key_path, "w") as f:
                f.write(key)
        except OSError:
            pass
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    u64p = ctypes.POINTER(ctypes.c_uint64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.keccak_f1600.argtypes = [u8p]
    lib.chacha_block.argtypes = [u32p, ctypes.c_uint64, u32p, ctypes.c_int, u32p]
    lib.set_curve_ctx.argtypes = [u64p, ctypes.c_uint64, u64p, u64p, u64p]
    lib.point_add.argtypes = [u64p, u64p, u64p]
    lib.point_mul.argtypes = [u64p, u64p, u64p]
    lib.fold_points.argtypes = [u64p, ctypes.c_size_t, u64p, u64p, u64p]
    lib.msm.argtypes = [u64p, u64p, ctypes.c_size_t, u64p]
    return lib


def _u64arr(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _int_to_u64s(v: int, words: int = 4) -> np.ndarray:
    return np.array([(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(words)],
                    dtype=np.uint64)


def _u64s_to_int(a: np.ndarray) -> int:
    return sum(int(w) << (64 * i) for i, w in enumerate(a))


_CTX_SET = False


def _ensure_ctx() -> bool:
    """Load the library and install the curve25519 Fp / curve constants."""
    global _lib, _CTX_SET
    if _lib is None:
        _lib = _load()
        if _lib is None:
            return False
    if not _CTX_SET:
        from lasso_tpu.field import constants as K

        p = K.P
        n0 = (-pow(p, -1, 1 << 64)) % (1 << 64)
        r2 = pow(2, 512, p)
        _lib.set_curve_ctx(
            _u64arr(_int_to_u64s(p)), ctypes.c_uint64(n0),
            _u64arr(_int_to_u64s(r2)), _u64arr(_int_to_u64s(K.CURVE_A % p)),
            _u64arr(_int_to_u64s(K.CURVE_D % p)))
        _CTX_SET = True
    return True


def available() -> bool:
    return _ensure_ctx()


# -- keccak / chacha ---------------------------------------------------------

def keccak_f1600(state: bytearray) -> bool:
    """In-place permutation; returns False if the native lib is unavailable."""
    global _lib
    if _lib is None:
        _lib = _load()
        if _lib is None:
            return False
    buf = (ctypes.c_uint8 * 200).from_buffer(state)
    _lib.keccak_f1600(buf)
    return True


def chacha_block(key_words, counter: int, nonce_words, rounds: int):
    global _lib
    if _lib is None:
        _lib = _load()
        if _lib is None:
            return None
    key = np.asarray(key_words, dtype=np.uint32)
    nonce = np.asarray(list(nonce_words) + [0, 0], dtype=np.uint32)[:2]
    out = np.empty(16, dtype=np.uint32)
    _lib.chacha_block(
        key.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_uint64(counter),
        nonce.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int(rounds),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return [int(x) for x in out]


# -- curve -------------------------------------------------------------------

def _pack_points(points) -> np.ndarray:
    out = np.empty((len(points), 16), dtype=np.uint64)
    for i, pt in enumerate(points):
        out[i, 0:4] = _int_to_u64s(pt.x)
        out[i, 4:8] = _int_to_u64s(pt.y)
        out[i, 8:12] = _int_to_u64s(pt.z)
        out[i, 12:16] = _int_to_u64s(pt.t)
    return out


def _unpack_point(a: np.ndarray):
    from lasso_tpu.curve.host import Point

    return Point(_u64s_to_int(a[0:4]), _u64s_to_int(a[4:8]),
                 _u64s_to_int(a[8:12]), _u64s_to_int(a[12:16]))


def point_mul(pt, k: int):
    if not _ensure_ctx():
        return None
    p = _pack_points([pt])[0]
    kk = _int_to_u64s(k)
    out = np.empty(16, dtype=np.uint64)
    _lib.point_mul(_u64arr(p), _u64arr(kk), _u64arr(out))
    return _unpack_point(out)


def msm(points, scalars) -> "object | None":
    if not _ensure_ctx():
        return None
    pts = _pack_points(points)
    sc = np.empty((len(scalars), 4), dtype=np.uint64)
    for i, s in enumerate(scalars):
        sc[i] = _int_to_u64s(s)
    out = np.empty(16, dtype=np.uint64)
    _lib.msm(_u64arr(pts), _u64arr(sc), ctypes.c_size_t(len(points)),
             _u64arr(out))
    return _unpack_point(out)


def fold_points(g_points, u: int, u_inv: int):
    """[g_lo | g_hi] -> g_lo*u_inv + g_hi*u elementwise (bullet basis fold)."""
    if not _ensure_ctx():
        return None
    n_half = len(g_points) // 2
    pts = _pack_points(g_points)
    out = np.empty((n_half, 16), dtype=np.uint64)
    _lib.fold_points(_u64arr(pts), ctypes.c_size_t(n_half),
                     _u64arr(_int_to_u64s(u)), _u64arr(_int_to_u64s(u_inv)),
                     _u64arr(out))
    return [_unpack_point(out[i]) for i in range(n_half)]
