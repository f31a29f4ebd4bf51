"""ctypes bindings for libbbbpchem.so (built by bbbp_tpu/native/build.py)."""

from __future__ import annotations

import ctypes
import os
from typing import List, Sequence, Tuple

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libbbbpchem.so")


def _load():
    global _LIB
    if _LIB is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bbbp_fingerprints_packed.restype = ctypes.c_int
        lib.bbbp_fingerprints_packed.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        lib.bbbp_fingerprints.restype = ctypes.c_int
        lib.bbbp_fingerprints.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # smiles array
            ctypes.c_int,                     # n molecules
            ctypes.c_int,                     # kind: 0 morgan, 1 maccs, 2 path
            ctypes.c_int,                     # n_bits
            ctypes.c_int,                     # radius
            ctypes.POINTER(ctypes.c_float),   # out [n, dim]
            ctypes.POINTER(ctypes.c_int32),   # bad flags [n]
            ctypes.c_int,                     # n threads (0 = auto)
        ]
        _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def fingerprints(smiles: Sequence[str], kind: str, n_bits: int = 2048,
                 radius: int = 2, threads: int = 0) -> Tuple[np.ndarray, List[int]]:
    lib = _load()
    if lib is None:
        raise ImportError("libbbbpchem.so not built")
    kind_code = {"morgan": 0, "maccs": 1, "rdkit": 2}[kind]
    dim = 167 if kind == "maccs" else n_bits
    n = len(smiles)
    out = np.zeros((n, dim), dtype=np.float32)
    bad = np.zeros(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[s.encode("utf-8") for s in smiles])
    rc = lib.bbbp_fingerprints(
        arr, n, kind_code, n_bits, radius,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bad.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        threads,
    )
    if rc != 0:
        raise RuntimeError(f"bbbp_fingerprints failed: rc={rc}")
    return out, list(np.nonzero(bad)[0])


def fingerprints_packed(smiles: Sequence[str], kind: str = "morgan",
                        n_bits: int = 2048, radius: int = 2,
                        threads: int = 0) -> Tuple[np.ndarray, List[int]]:
    """Packed uint32 fingerprints [N, n_bits/32] direct from C++ (no dense
    intermediate) — the screening fast path."""
    lib = _load()
    if lib is None:
        raise ImportError("libbbbpchem.so not built")
    kind_code = {"morgan": 0, "rdkit": 2}[kind]
    n = len(smiles)
    words = n_bits // 32
    out = np.zeros((n, words), dtype=np.uint32)
    bad = np.zeros(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[s.encode("utf-8") for s in smiles])
    rc = lib.bbbp_fingerprints_packed(
        arr, n, kind_code, n_bits, radius,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        bad.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        threads,
    )
    if rc != 0:
        raise RuntimeError(f"bbbp_fingerprints_packed failed: rc={rc}")
    return out, list(np.nonzero(bad)[0])
