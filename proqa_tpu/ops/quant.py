"""Per-row symmetric int8 corpus quantization for the dense index.

Beyond the reference (FAISS IndexFlatIP is f32-only at
/root/reference/retrieval/eval_retrieval.py:102-104): an int8 index halves
HBM per row vs the production bf16 layout, doubling the supported
single-chip corpus (33.6M -> 67.2M rows at D=128 on a 16 GiB v5e).

Scheme: per-row symmetric absmax. For row x: scale s = max|x| / 127,
q = round(x / s) in [-127, 127] (zero rows get s = 1, q = 0). The
quantized score used everywhere is

    score(query, row) = s_row * (query . q_row)

so ranking is exact w.r.t. the quantized representation: the search
kernel multiplies the per-row scale in BEFORE its block max-reduce and the
rescore stage multiplies gathered scales into candidate scores, which keeps
the block-max hierarchy's exactness argument intact (ops/mips.py docstring)
— recall loss vs the f32 index comes only from the rounding of q itself,
measured at the bench operating point (bench.py int8 sub-bench).

int8 values convert to bf16 LOSSLESSLY (integers up to 256 are exact in
bf16's 8-bit mantissa), so the MXU dot over converted rows is exact integer
arithmetic in f32 accumulation (|sum| <= 128 * 127 * |q_d| << 2^24).
"""
from __future__ import annotations

import numpy as np


def quantize_rows(emb: np.ndarray, chunk: int = 1 << 20):
    """Quantize a host [N, D] float matrix to (int8 [N, D], f32 scales [N]).

    Chunked so Wikipedia-scale matrices (possibly memmapped) never force a
    second full-size float temporary into host RAM.
    """
    n, d = emb.shape
    q = np.empty((n, d), np.int8)
    scales = np.empty((n,), np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        part = np.asarray(emb[s:e], np.float32)
        amax = np.abs(part).max(axis=1)
        sc = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q[s:e] = np.clip(np.rint(part / sc[:, None]), -127, 127).astype(np.int8)
        scales[s:e] = sc
    return q, scales


def dequantize_rows(q: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Inverse of quantize_rows (up to rounding): f32 [N, D]."""
    return q.astype(np.float32) * np.asarray(scales, np.float32)[:, None]
