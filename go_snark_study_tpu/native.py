"""ctypes bridge to the C++ host runtime (native/gosnark_native.cpp).

Gracefully optional: if the shared library has not been built (``make -C
native``) every entry point reports unavailable and callers fall back to the
pure-python paths.  The library accelerates:

  * :func:`pack_ints` / :func:`unpack_ints` — python ints <-> (32, N) int32
    Montgomery limb arrays (the TPU host bridge);
  * :func:`sparse_matvec` — A·w mod p (fast-prover row evaluations);
  * :func:`witness_eval_field` — field-mode witness computation.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

__all__ = [
    "available",
    "NativeField",
]

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "libgosnark_native.so",
)

_lib = None


def _try_build() -> None:
    """Best-effort one-shot build (g++ is in the base image)."""
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(_LIB_PATH)],
            capture_output=True,
            timeout=120,
            check=False,
        )
    except Exception:
        pass


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.gosnark_ctx_new.restype = ctypes.c_void_p
    lib.gosnark_ctx_new.argtypes = [ctypes.c_char_p]
    lib.gosnark_ctx_free.argtypes = [ctypes.c_void_p]
    lib.gosnark_pack.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.gosnark_unpack.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.gosnark_sparse_matvec.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_char_p,
    ]
    lib.gosnark_witness_eval.restype = ctypes.c_int
    lib.gosnark_witness_eval.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_char_p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _i64ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class NativeField:
    """One C context per modulus."""

    def __init__(self, p: int):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native library not built — run `make -C native`"
            )
        self.lib = lib
        self.p = p
        self._ctx = lib.gosnark_ctx_new(int(p).to_bytes(32, "little"))

    def __del__(self):
        try:
            self.lib.gosnark_ctx_free(self._ctx)
        except Exception:
            pass

    # ------------------------------------------------------------------
    def ints_to_bytes(self, xs: Sequence[int]) -> bytes:
        return b"".join((x % self.p).to_bytes(32, "little") for x in xs)

    def pack_ints(self, xs: Sequence[int], mont: bool = True) -> np.ndarray:
        """-> (32, N) int32 limb array (Montgomery by default)."""
        n = len(xs)
        out = np.empty((32, n), dtype=np.int32)
        self.lib.gosnark_pack(
            self._ctx,
            self.ints_to_bytes(xs),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
            1 if mont else 0,
        )
        return out

    def unpack_ints(self, arr: np.ndarray, mont: bool = True) -> List[int]:
        arr = np.ascontiguousarray(np.asarray(arr, dtype=np.int32))
        n = arr.shape[1]
        buf = ctypes.create_string_buffer(32 * n)
        self.lib.gosnark_unpack(
            self._ctx,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            buf,
            n,
            1 if mont else 0,
        )
        raw = buf.raw
        return [int.from_bytes(raw[i * 32 : (i + 1) * 32], "little") for i in range(n)]

    # ------------------------------------------------------------------
    def sparse_matvec(
        self,
        indptr: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        witness: Sequence[int],
    ) -> List[int]:
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        cols = np.ascontiguousarray(cols, dtype=np.int64)
        vals = np.ascontiguousarray(vals, dtype=np.int64)
        n_rows = len(indptr) - 1
        wbytes = self.ints_to_bytes(witness)
        out = ctypes.create_string_buffer(32 * n_rows)
        self.lib.gosnark_sparse_matvec(
            self._ctx, _i64ptr(indptr), _i64ptr(cols), _i64ptr(vals), wbytes, n_rows, out
        )
        raw = out.raw
        return [
            int.from_bytes(raw[i * 32 : (i + 1) * 32], "little") for i in range(n_rows)
        ]

    # ------------------------------------------------------------------
    def witness_eval(self, ops: np.ndarray, seeded_witness: Sequence[int]) -> List[int]:
        """ops: (n_ops, 7) int64 in the encoding documented in the C++
        source; seeded_witness: initial signal values (one/public/private
        filled, intermediates zero)."""
        ops = np.ascontiguousarray(ops, dtype=np.int64)
        n = len(seeded_witness)
        buf = ctypes.create_string_buffer(self.ints_to_bytes(seeded_witness), 32 * n)
        rc = self.lib.gosnark_witness_eval(self._ctx, _i64ptr(ops), ops.shape[0], buf)
        if rc != 0:
            raise ZeroDivisionError("witness evaluation: division by zero")
        raw = buf.raw
        return [int.from_bytes(raw[i * 32 : (i + 1) * 32], "little") for i in range(n)]
