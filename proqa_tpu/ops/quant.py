"""Per-block symmetric int8 corpus quantization for the dense index.

Beyond the reference (FAISS IndexFlatIP is f32-only at
/root/reference/retrieval/eval_retrieval.py:102-104): an int8 index halves
HBM per row vs the production bf16 layout, doubling the supported
single-chip corpus (33.6M -> 67.2M rows at D=128 on a 16 GiB v5e).

Scheme: symmetric absmax over BLOCKS of `block` consecutive rows. For block
b covering rows x: scale s_b = max|x| / 127, codes q = round(x / s_b) in
[-127, 127] (all-zero blocks get s = 1). The quantized score used everywhere
is

    score(query, row) = s_block(row) * (query . q_row)

Why per-BLOCK rather than per-row: the search kernel must apply the scale
before its block max-reduce, and a per-row scale needs a [rows, 1]-shaped
operand — whose HBM layout is lane-padded 128x by the TPU's (8, 128) tiling
(34 GB of scales at 67M rows; measured OOM). A per-block scale is constant
within each max-reduce segment, so it commutes with the max and multiplies
the REDUCED [TQ, G] maxima tile against a dense [1, G] lane vector instead —
layout-exact, 1/block-th the VPU work, and the block-max hierarchy's
exactness argument is unchanged (each emitted maximum is still an achieved
quantized score). The rescore stage multiplies gathered block scales into
candidate scores. Recall loss vs the f32 index comes only from the rounding
of q itself, measured at the bench operating point (tools/int8_probe.py).

The quantization block must equal the search kernel's reduction block;
`DenseIndex(dtype="int8")` pins it with the same HBM-envelope formula the
search dispatcher uses. block=1 degenerates to per-row quantization (used by
the XLA/CPU paths' tests; the Pallas kernel requires block == search block).

int8 codes convert to bf16 LOSSLESSLY (integers up to 256 are exact in
bf16's 8-bit mantissa), so the MXU dot over converted rows is exact integer
arithmetic in f32 accumulation (|sum| <= 128 * 127 * |q_d| << 2^24).
"""
from __future__ import annotations

import numpy as np


def quantize_rows(emb: np.ndarray, block: int = 1, chunk: int = 1 << 20):
    """Quantize a host [N, D] float matrix to int8 with per-block scales.

    Returns (codes int8 [N, D], scales f32 [ceil(N/block)]). N % block need
    not be 0: the last partial block is scaled over its real rows. Chunked
    so Wikipedia-scale matrices (possibly memmapped) never force a second
    full-size float temporary into host RAM.
    """
    n, d = emb.shape
    nb = -(-n // block)
    q = np.empty((n, d), np.int8)
    scales = np.empty((nb,), np.float32)
    chunk = max(block, chunk - chunk % block)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        part = np.asarray(emb[s:e], np.float32)
        rows = e - s
        pb = -(-rows // block)
        pad = pb * block - rows
        if pad:
            part = np.concatenate([part, np.zeros((pad, d), np.float32)])
        amax = np.abs(part.reshape(pb, -1)).max(axis=1)
        sc = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        codes = np.clip(
            np.rint(part / np.repeat(sc, block)[:, None]), -127, 127
        ).astype(np.int8)
        q[s:e] = codes[:rows]
        scales[s // block : s // block + pb] = sc
    return q, scales


def dequantize_rows(q: np.ndarray, scales: np.ndarray, block: int = 1) -> np.ndarray:
    """Inverse of quantize_rows (up to rounding): f32 [N, D]."""
    n = q.shape[0]
    row_sc = np.repeat(np.asarray(scales, np.float32), block)[:n]
    return q.astype(np.float32) * row_sc[:, None]


def expand_scales(scales, block: int, n: int):
    """Per-block [NB] -> per-row [n] scales (for row-scored fallback paths).
    Works on numpy or jax arrays."""
    if block == 1:
        return scales[:n]
    import jax.numpy as jnp

    if isinstance(scales, np.ndarray):
        return np.repeat(scales, block)[:n]
    return jnp.repeat(scales, block)[:n]
