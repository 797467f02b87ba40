"""ctypes loader for the native host-side scoring kernels (csrc/).

Falls back to pure-Python implementations in ``evalsuite.metrics`` when the
shared library has not been built (``make -C csrc``), so the framework has
no hard native dependency.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "_native", "libpkv_native.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.pkv_levenshtein_ratio.restype = ctypes.c_double
        lib.pkv_levenshtein_ratio.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64
        ]
        lib.pkv_rouge_l_f1.restype = ctypes.c_double
        lib.pkv_rouge_l_f1.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        lib.pkv_token_f1.restype = ctypes.c_double
        lib.pkv_token_f1.argtypes = lib.pkv_rouge_l_f1.argtypes
        lib.pkv_string_match_all.restype = ctypes.c_double
        lib.pkv_string_match_all.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _ids(tokens: "list[str]") -> "tuple":
    """Hash tokens to int32 ids (consistent within one call pair)."""
    table: dict = {}
    out = []
    for t in tokens:
        out.append(table.setdefault(t, len(table)))
    return table, out


def _to_arr(ids: "list[int]"):
    arr = (ctypes.c_int32 * len(ids))(*ids)
    return arr, len(ids)


def levenshtein_ratio(a: str, b: str) -> float:
    lib = _load()
    if lib is None:
        from .evalsuite.metrics import levenshtein_ratio as py

        return py(a, b)
    ab, bb = a.encode(), b.encode()
    return lib.pkv_levenshtein_ratio(ab, len(ab), bb, len(bb))


def token_f1(pred_tokens: "list[str]", gt_tokens: "list[str]") -> float:
    lib = _load()
    if lib is None:
        from .evalsuite.metrics import _token_f1 as py

        return py(pred_tokens, gt_tokens)
    table: dict = {}
    pa = [table.setdefault(t, len(table)) for t in pred_tokens]
    ga = [table.setdefault(t, len(table)) for t in gt_tokens]
    (aa, la), (bb, lb) = _to_arr(pa), _to_arr(ga)
    return lib.pkv_token_f1(aa, la, bb, lb)


def rouge_l_f1(pred_tokens: "list[str]", gt_tokens: "list[str]") -> float:
    lib = _load()
    if lib is None:
        # LCS in pure python
        la, lb = len(pred_tokens), len(gt_tokens)
        if la == 0 or lb == 0:
            return 0.0
        prev = [0] * (lb + 1)
        for i in range(1, la + 1):
            cur = [0] * (lb + 1)
            for j in range(1, lb + 1):
                if pred_tokens[i - 1] == gt_tokens[j - 1]:
                    cur[j] = prev[j - 1] + 1
                else:
                    cur[j] = max(prev[j], cur[j - 1])
            prev = cur
        lcs = prev[lb]
        if lcs == 0:
            return 0.0
        p, r = lcs / la, lcs / lb
        return 2 * p * r / (p + r)
    table: dict = {}
    pa = [table.setdefault(t, len(table)) for t in pred_tokens]
    ga = [table.setdefault(t, len(table)) for t in gt_tokens]
    (aa, la), (bb, lb) = _to_arr(pa), _to_arr(ga)
    return lib.pkv_rouge_l_f1(aa, la, bb, lb)


def string_match_all(preds: "list[str]", refs: "list[list[str]]") -> float:
    lib = _load()
    if lib is None:
        from .evalsuite.metrics import string_match_all as py

        return py(preds, refs)
    pb = "\x1f".join(preds).encode()
    rb = "\x1e".join("\x1f".join(r) for r in refs).encode()
    total = lib.pkv_string_match_all(pb, len(pb), rb, len(rb))
    return round(total / len(preds) * 100, 2)
