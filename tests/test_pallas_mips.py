"""Pallas fused block-max kernel: interpreter-mode correctness vs numpy and
the exact search path end-to-end."""
import numpy as np
import pytest

import jax.numpy as jnp

from proqa_tpu.ops.mips import mips_topk_reference
from proqa_tpu.ops.pallas_mips import block_maxima, mips_topk_pallas


def test_block_maxima_matches_numpy():
    rng = np.random.default_rng(0)
    q, n, d, block = 256, 4096, 128, 256
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    corpus = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    bm = block_maxima(queries, corpus, block=block, tile_n=1024, tile_q=256, interpret=True)
    scores = np.asarray(queries) @ np.asarray(corpus).T            # [Q, N]
    want = scores.reshape(q, n // block, block).max(-1).T          # [NB, Q]
    np.testing.assert_allclose(np.asarray(bm), want, rtol=1e-4, atol=1e-4)


def test_mips_topk_pallas_exact():
    rng = np.random.default_rng(1)
    q, n, d, k = 256, 8192, 128, 37
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    corpus = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    rv, ri = mips_topk_reference(queries, corpus, k)
    pv, pi = mips_topk_pallas(
        queries, corpus, k, block=256, kb=64, q_chunk=256,
        tile_n=1024, tile_q=256, interpret=True,
    )
    rv, ri, pv, pi = map(np.asarray, (rv, ri, pv, pi))
    # rankings may flip only where scores are within rounding of each other
    mismatch = ri != pi
    np.testing.assert_allclose(pv, rv, rtol=1e-5, atol=1e-4)
    assert (np.abs(pv[mismatch] - rv[mismatch]) < 1e-3).all()
    assert mismatch.mean() < 0.001


def test_mips_topk_pallas_straddling_block_masked():
    """Round-1 advisor repro: the block straddling n_valid contains zero-score
    pad rows; with kb < nb and all-negative true scores the pad-inflated block
    max must NOT evict a block holding a true top-k row."""
    q, n, d, k, block = 256, 3000, 64, 4, 128
    emb = np.zeros((n, d), np.float32)
    emb[:, 0] = -100.0
    top_rows = [10, 200, 400, 900]  # blocks 0, 1, 3, 7 — none in the straddler
    for rank, row in enumerate(top_rows):
        emb[row, 0] = -float(rank + 1)
    queries = np.zeros((q, d), np.float32)
    queries[:, 0] = 1.0
    # kb=4 == k: straddling block (rows 2944..2999 valid, 3000.. pad) would
    # rank first with an unmasked max of 0 and evict the -4 block.
    pv, pi = mips_topk_pallas(
        jnp.asarray(queries), jnp.asarray(emb), k, block=block, kb=4,
        q_chunk=256, tile_n=512, tile_q=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(pi)[0], top_rows)
    np.testing.assert_allclose(np.asarray(pv)[0], [-1.0, -2.0, -3.0, -4.0])


def test_mips_topk_pallas_traced_n_valid():
    """n_valid as a traced scalar (the sharded path) must match static."""
    rng = np.random.default_rng(3)
    q, n, d, k = 256, 2000, 64, 8
    queries = jnp.asarray(np.abs(rng.standard_normal((q, d))), jnp.float32)
    corpus = jnp.asarray(-np.abs(rng.standard_normal((n, d))), jnp.float32)
    padded = jnp.pad(corpus, ((0, 48), (0, 0)))
    sv, si = mips_topk_pallas(
        queries, padded, k, block=128, kb=8, q_chunk=256,
        tile_n=512, tile_q=256, n_valid=n, interpret=True,
    )
    tv, ti = mips_topk_pallas(
        queries, padded, k, block=128, kb=8, q_chunk=256,
        tile_n=512, tile_q=256, n_valid=jnp.int32(n), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ti))
    np.testing.assert_allclose(np.asarray(sv), np.asarray(tv))
    rv, ri = mips_topk_reference(queries, corpus, k)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))


def test_mips_topk_pallas_padding_masked():
    """Corpus not a tile multiple: padded rows/blocks must never surface."""
    rng = np.random.default_rng(2)
    q, n, d, k = 256, 3000, 64, 16
    # strongly negative scores so zero-padding would win if unmasked
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    corpus = jnp.asarray(-np.abs(rng.standard_normal((n, d))), jnp.float32)
    queries_pos = jnp.asarray(np.abs(np.asarray(queries)), jnp.float32)
    rv, ri = mips_topk_reference(queries_pos, corpus, k)
    pv, pi = mips_topk_pallas(
        queries_pos, corpus, k, block=128, kb=32, q_chunk=256,
        tile_n=512, tile_q=256, interpret=True,
    )
    assert int(np.max(np.asarray(pi))) < n
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))


# ---------------- v2 pipeline (round 2: bmax3 layout, 3-stage select) ----------------
from proqa_tpu.ops.pallas_mips import block_maxima_grouped, mips_topk_pallas_v2


def test_block_maxima_grouped_matches_numpy():
    rng = np.random.default_rng(10)
    q, n, d, block, group = 256, 8192, 128, 32, 64   # rows/group=2048, k_sub=4
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    corpus = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    b3, g = block_maxima_grouped(
        queries, corpus, block=block, group=group, tile_q=256, interpret=True
    )
    scores = np.asarray(queries) @ np.asarray(corpus).T            # [Q, N]
    nb, cg = n // block, n // (block * group)
    bm = scores.reshape(q, nb, block).max(-1)                      # [Q, NB]
    want_b3 = bm.reshape(q, cg, group).transpose(1, 0, 2)          # [CG, Q, G]
    want_g = want_b3.max(-1)[:, None, :]                           # [CG, 1, Q]
    np.testing.assert_allclose(np.asarray(b3), want_b3, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g), want_g, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("block,group", [(32, 64), (64, 32)])
def test_mips_topk_pallas_v2_exact(block, group):
    rng = np.random.default_rng(11)
    q, n, d, k = 256, 8192, 128, 37
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    corpus = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    rv, ri = mips_topk_reference(queries, corpus, k)
    pv, pi = mips_topk_pallas_v2(
        queries, corpus, k, block=block, group=group, tile_q=256, interpret=True
    )
    rv, ri, pv, pi = map(np.asarray, (rv, ri, pv, pi))
    mismatch = ri != pi
    np.testing.assert_allclose(pv, rv, rtol=1e-5, atol=1e-4)
    assert (np.abs(pv[mismatch] - rv[mismatch]) < 1e-3).all()
    assert mismatch.mean() < 0.001


def test_mips_topk_pallas_v2_straddling_block_masked():
    """Same adversarial setup as the v1 straddler test: zero-score pad rows in
    the block/group straddling n_valid must not evict negative-score results."""
    q, n, d, k, block, group = 256, 3000, 64, 4, 128, 4
    emb = np.zeros((n, d), np.float32)
    emb[:, 0] = -100.0
    top_rows = [10, 200, 400, 900]
    for rank, row in enumerate(top_rows):
        emb[row, 0] = -float(rank + 1)
    queries = np.zeros((q, d), np.float32)
    queries[:, 0] = 1.0
    pv, pi = mips_topk_pallas_v2(
        jnp.asarray(queries), jnp.asarray(emb), k, block=block, group=group,
        tile_q=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(pi)[0], top_rows)
    np.testing.assert_allclose(np.asarray(pv)[0], [-1.0, -2.0, -3.0, -4.0])


def test_mips_topk_pallas_v2_traced_n_valid():
    rng = np.random.default_rng(13)
    q, n, d, k = 256, 2000, 64, 8
    queries = jnp.asarray(np.abs(rng.standard_normal((q, d))), jnp.float32)
    corpus = jnp.asarray(-np.abs(rng.standard_normal((n, d))), jnp.float32)
    padded = jnp.pad(corpus, ((0, 48), (0, 0)))
    kw = dict(block=128, group=4, tile_q=256, interpret=True)
    sv, si = mips_topk_pallas_v2(queries, padded, k, n_valid=n, **kw)
    tv, ti = mips_topk_pallas_v2(queries, padded, k, n_valid=jnp.int32(n), **kw)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ti))
    np.testing.assert_allclose(np.asarray(sv), np.asarray(tv))
    rv, ri = mips_topk_reference(queries, corpus, k)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))


def test_mips_topk_pallas_v2_padding_masked():
    rng = np.random.default_rng(12)
    q, n, d, k = 256, 3000, 64, 16
    queries_pos = jnp.asarray(np.abs(rng.standard_normal((q, d))), jnp.float32)
    corpus = jnp.asarray(-np.abs(rng.standard_normal((n, d))), jnp.float32)
    rv, ri = mips_topk_reference(queries_pos, corpus, k)
    pv, pi = mips_topk_pallas_v2(
        queries_pos, corpus, k, block=128, group=4, kb=32,
        tile_q=256, interpret=True,
    )
    assert int(np.max(np.asarray(pi))) < n
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))


# ---------------- DMA-streaming phase-2 rescorer (round 4) ----------------
from proqa_tpu.ops import pallas_rescore
from proqa_tpu.ops.mips import rescore_block_candidates
from proqa_tpu.ops.pallas_rescore import gather_rescore


def test_gather_rescore_matches_einsum():
    rng = np.random.default_rng(20)
    n, d, q, kb, block = 2048, 128, 16, 16, 16
    corpus = jnp.asarray(rng.standard_normal((n // block, block, d)), jnp.float32)
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, n // block, (q, kb)), jnp.int32)
    out = gather_rescore(queries, corpus, ids, block=block, interpret=True)
    want = np.einsum(
        "qkbd,qd->qkb", np.asarray(corpus)[np.asarray(ids)], np.asarray(queries)
    ).reshape(q, kb * block)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


def test_gather_rescore_query_chunking(monkeypatch):
    """Q above the SMEM budget splits into chunked pallas_calls (incl. a
    ragged tail) — shrink the budget so the split is exercised cheaply."""
    monkeypatch.setattr(pallas_rescore, "_MAX_Q", 16)
    rng = np.random.default_rng(21)
    n, d, q, kb, block = 1024, 128, 40, 8, 16   # chunks of 16, 16, 8
    corpus = jnp.asarray(rng.standard_normal((n // block, block, d)), jnp.float32)
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, n // block, (q, kb)), jnp.int32)
    out = gather_rescore(queries, corpus, ids, block=block, interpret=True)
    want = np.einsum(
        "qkbd,qd->qkb", np.asarray(corpus)[np.asarray(ids)], np.asarray(queries)
    ).reshape(q, kb * block)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


def test_rescore_impl_stream_matches_take():
    """rescore_block_candidates impl='stream' returns the same top-k values
    AND indices as the default take+einsum path (pad masking included)."""
    rng = np.random.default_rng(22)
    n_valid, d, q, kb, block = 2000, 128, 16, 16, 16
    nb = 128  # 2048 padded rows; blocks 125..127 straddle/exceed n_valid
    corpus = np.zeros((nb * block, d), np.float32)
    corpus[:n_valid] = -np.abs(rng.standard_normal((n_valid, d)))
    corpus_blocks = jnp.asarray(corpus.reshape(nb, block, d))
    queries = jnp.asarray(np.abs(rng.standard_normal((q, d))), jnp.float32)
    ids = jnp.asarray(rng.integers(120, nb, (q, kb)), jnp.int32)  # hit the pad
    tv, ti = rescore_block_candidates(
        queries, ids, corpus_blocks, k=8, block=block, n_valid=n_valid
    )
    sv, si = rescore_block_candidates(
        queries, ids, corpus_blocks, k=8, block=block, n_valid=n_valid,
        impl="stream", interpret=True,
    )
    assert int(np.max(np.asarray(si))) < n_valid
    np.testing.assert_array_equal(np.asarray(si), np.asarray(ti))
    np.testing.assert_allclose(np.asarray(sv), np.asarray(tv), rtol=1e-4, atol=1e-4)


# ---------------- int8 quantized corpus in the fused kernel (round 4) ----------------

def test_pallas_v2_int8_scales_matches_dequantized():
    """The scaled kernel (per-block scales multiplied after the block
    max-reduce — constant within a block, so it commutes) + scaled rescore
    return exactly the top-k of the dequantized corpus, including ragged-N
    straddler masking."""
    from proqa_tpu.ops.quant import dequantize_rows, quantize_rows
    rng = np.random.default_rng(40)
    n, d, q, k, block = 5003, 128, 32, 9, 16   # ragged: pad + straddler
    emb = (rng.standard_normal((n, d)) * rng.uniform(0.5, 2.0, (n, 1))).astype(np.float32)
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    q8, sc = quantize_rows(emb, block=block)
    want_v, want_i = mips_topk_reference(
        queries, jnp.asarray(dequantize_rows(q8, sc, block=block)), k
    )
    got_v, got_i = mips_topk_pallas_v2(
        queries, jnp.asarray(q8), k, block=block, group=8, tile_q=32,
        sub_chunks=2, scales=jnp.asarray(sc), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-4, atol=1e-4)


def test_block_maxima_grouped_row_scale_bounds():
    """Bounded kernel (per-ROW quantization): emitted per-block values equal
    the sign-aware bound formula AND dominate the true row-scaled block max."""
    from proqa_tpu.ops.pallas_mips import block_maxima_grouped
    from proqa_tpu.ops.quant import quantize_rows
    rng = np.random.default_rng(42)
    n, d, q, block, group = 1024, 128, 16, 8, 16
    emb = (rng.standard_normal((n, d)) * rng.uniform(0.25, 4.0, (n, 1))).astype(np.float32)
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    q8, rs = quantize_rows(emb, block=1)
    nb = n // block
    smax = rs.reshape(nb, block).max(1)
    smin = rs.reshape(nb, block).min(1)
    b3, g = block_maxima_grouped(
        queries, jnp.asarray(q8), block=block, group=group, tile_q=16,
        sub_chunks=2,
        scale_bounds=(jnp.asarray(smax), jnp.asarray(smin)),
        interpret=True,
    )
    raw = np.asarray(queries) @ q8.astype(np.float32).T            # unscaled
    m = raw.reshape(q, nb, block).max(-1)                          # [Q, NB]
    want = np.where(m >= 0, m * smax[None, :], m * smin[None, :])
    cg = n // (block * group)
    got = np.asarray(b3).transpose(1, 0, 2).reshape(q, cg * group)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    true_max = (raw * rs[None, :]).reshape(q, nb, block).max(-1)
    assert (got >= true_max - 1e-3).all()                          # upper bound


def test_pallas_v2_row_scales_end_to_end():
    """Per-row-quantized search contract: returned values are EXACT
    row-scaled scores of the returned rows, and with kb wide enough the
    bound-selected results match the per-row dequantized reference.

    Selection by bound at kb == k is HEURISTIC and measurably lossy (block
    maxima are tightly packed, so the multiplicative smax/smin distortion
    scrambles their ranking — recall 0.22-0.36 at kb=k on norm-varied data,
    1.0 at kb=16k; tools/int8_real_probe.py records the hardware disproof):
    that is why per-block quantization stays the production int8 scheme."""
    from proqa_tpu.ops.quant import quantize_rows
    rng = np.random.default_rng(43)
    n, d, q, k, block = 5003, 128, 32, 9, 16   # ragged: pad + straddler
    emb = (rng.standard_normal((n, d)) * rng.uniform(0.1, 10.0, (n, 1))).astype(np.float32)
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    q8, rs = quantize_rows(emb, block=1)
    want_v, want_i = mips_topk_reference(
        queries, jnp.asarray(q8, jnp.float32), k, scales=jnp.asarray(rs)
    )
    got_v, got_i = mips_topk_pallas_v2(
        queries, jnp.asarray(q8), k, block=block, group=8, tile_q=32,
        sub_chunks=2, row_scales=jnp.asarray(rs), kb=16 * k, interpret=True,
    )
    got_v, got_i = np.asarray(got_v), np.asarray(got_i)
    want_v, want_i = np.asarray(want_v), np.asarray(want_i)
    # every returned value is the exact scaled score of its returned row
    raw = np.asarray(queries) @ q8.astype(np.float32).T
    true = np.take_along_axis(raw * rs[None, :], got_i, axis=1)
    np.testing.assert_allclose(got_v, true, rtol=1e-4, atol=1e-4)
    recall = np.mean([
        len(set(got_i[r]) & set(want_i[r])) / k for r in range(q)
    ])
    assert recall == 1.0, recall
    # and the heuristic's narrow-kb loss is real (documents the disproof)
    _, narrow_i = mips_topk_pallas_v2(
        queries, jnp.asarray(q8), k, block=block, group=8, tile_q=32,
        sub_chunks=2, row_scales=jnp.asarray(rs), interpret=True,
    )
    narrow_i = np.asarray(narrow_i)
    narrow_recall = np.mean([
        len(set(narrow_i[r]) & set(want_i[r])) / k for r in range(q)
    ])
    assert narrow_recall < 0.9, narrow_recall


def test_block_maxima_grouped_int8_scales():
    """Kernel-level: scaled block maxima equal numpy maxima of scaled scores."""
    from proqa_tpu.ops.pallas_mips import block_maxima_grouped
    from proqa_tpu.ops.quant import expand_scales, quantize_rows
    rng = np.random.default_rng(41)
    n, d, q, block, group = 1024, 128, 16, 8, 16
    emb = (rng.standard_normal((n, d)) * rng.uniform(0.25, 4.0, (n, 1))).astype(np.float32)
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.float32)
    q8, sc = quantize_rows(emb, block=block)
    b3, g = block_maxima_grouped(
        queries, jnp.asarray(q8), block=block, group=group, tile_q=16,
        sub_chunks=2, scales=jnp.asarray(sc), interpret=True,
    )
    row_sc = expand_scales(sc, block, n)
    scores = (np.asarray(queries) @ q8.astype(np.float32).T) * row_sc[None, :]
    want = scores.reshape(q, n // block, block).max(-1)        # [Q, NB]
    cg = n // (block * group)
    got = np.asarray(b3).transpose(1, 0, 2).reshape(q, cg * group)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g).reshape(cg, q).T,
        want.reshape(q, cg, group).max(-1), rtol=1e-4, atol=1e-4,
    )


def test_kernels_ignore_global_matmul_precision():
    """Every dot inside a Pallas kernel file must pin `precision=` explicitly.

    The from-scratch-training collapse fix (CLAUDE.md) sets the GLOBAL
    jax_default_matmul_precision to "highest"; any in-kernel dot that defers
    to the default (precision=None) then lowers as an fp32 contract on bf16
    operands, which Mosaic rejects at COMPILE TIME ("Bad lhs type") — a
    hardware-only failure invisible to the interpret-mode suite (it killed
    tools/int8_real_probe.py's search stage on v5e in round 5). Guard at the
    AST level: every dot/dot_general/einsum in ops/pallas_*.py carries a
    precision keyword.
    """
    import ast
    import pathlib

    ops_dir = pathlib.Path(__file__).parent.parent / "proqa_tpu" / "ops"
    files = sorted(ops_dir.glob("pallas_*.py"))
    assert files, "pallas kernel files moved? update this test"
    missing = []
    for f in files:
        tree = ast.parse(f.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            fn = node.func
            name = fn.attr if isinstance(fn, ast.Attribute) else (
                fn.id if isinstance(fn, ast.Name) else "")
            if name not in ("dot", "dot_general", "einsum"):
                continue
            if not any(kw.arg == "precision" for kw in node.keywords):
                missing.append(f"{f.name}:{node.lineno}")
    assert not missing, (
        "dots without an explicit precision= (the global matmul precision "
        f"would leak into the Mosaic kernel): {missing}"
    )


def test_pallas_v2_under_global_highest_precision():
    """mips_topk_pallas_v2 on a bf16 corpus still runs (and stays exact)
    with jax_default_matmul_precision='highest' active — the config the
    from-scratch-training fix installs process-wide."""
    import jax

    rng = np.random.default_rng(7)
    n, d, q, k = 512, 128, 16, 8
    corpus = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
    queries = jnp.asarray(rng.standard_normal((q, d)), jnp.bfloat16)
    with jax.default_matmul_precision("highest"):
        vals, idx = mips_topk_pallas_v2(
            queries, corpus, k=k, block=8, group=16, tile_q=16,
            interpret=True,
        )
    scores = np.asarray(queries, np.float32) @ np.asarray(corpus, np.float32).T
    want = np.sort(scores, axis=1)[:, ::-1][:, :k]
    np.testing.assert_allclose(np.sort(np.asarray(vals))[:, ::-1], want,
                               rtol=2e-2, atol=2e-2)
