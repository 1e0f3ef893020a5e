"""ctypes binding for the C++ wordpiece tokenizer (ASCII fast path).

Builds libproqa_wp.so on first use (g++ -O2), caches it next to the source.
The binary is NOT version-controlled: a source hash stored beside it gates
reuse, so the loaded library always corresponds to the checked-in .cpp (an
unauditable stale/foreign binary can never shadow the source).
`NativeWordpiece.tokenize` returns wordpiece *strings* (converting back from
ids via the vocab) so it is a drop-in for the Python tokenizer; non-ASCII
inputs transparently fall back to the Python implementation.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(__file__), "wordpiece.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libproqa_wp.so")
_HASH = _LIB + ".srchash"
_BUILD_LOCK = threading.Lock()


def _src_digest() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> str:
    with _BUILD_LOCK:
        digest = _src_digest()
        cached = os.path.exists(_LIB) and os.path.exists(_HASH) and \
            open(_HASH).read().strip() == digest
        if not cached:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB + ".tmp"],
                check=True, capture_output=True,
            )
            os.replace(_LIB + ".tmp", _LIB)
            with open(_HASH, "w") as f:
                f.write(digest)
    return _LIB


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.wp_destroy.argtypes = [ctypes.c_void_p]
        lib.wp_tokenize.restype = ctypes.c_int32
        lib.wp_tokenize.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        _lib = lib
    return _lib


class NativeWordpiece:
    def __init__(self, vocab: dict, do_lower_case: bool = True):
        lib = _load()
        blob = "\n".join(vocab.keys()).encode("utf-8")
        self._lib = lib
        self._handle = lib.wp_create(blob, int(do_lower_case))
        self._id_to_token = {i: t for t, i in vocab.items()}
        self._buf = (ctypes.c_int32 * 8192)()
        # python fallback for non-ASCII
        from proqa_tpu.text.basic import BasicTokenizer
        from proqa_tpu.text.wordpiece import WordpieceTokenizer

        self._py_basic = BasicTokenizer(do_lower_case=do_lower_case)
        self._py_wp = WordpieceTokenizer(vocab)

    def __del__(self):
        try:
            self._lib.wp_destroy(self._handle)
        except Exception:
            pass

    def _py_tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for w in self._py_basic.tokenize(text):
            out.extend(self._py_wp.tokenize(w))
        return out

    def tokenize(self, text: str) -> list[str]:
        try:
            raw = text.encode("ascii")
        except UnicodeEncodeError:
            return self._py_tokenize(text)
        if b"\x00" in raw:
            return self._py_tokenize(text)
        n = self._lib.wp_tokenize(self._handle, raw, self._buf, len(self._buf))
        if n < 0:
            return self._py_tokenize(text)
        if n > len(self._buf):
            self._buf = (ctypes.c_int32 * (n + 1024))()
            n = self._lib.wp_tokenize(self._handle, raw, self._buf, len(self._buf))
        return [self._id_to_token[self._buf[i]] for i in range(n)]
