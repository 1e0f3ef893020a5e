"""DenseIndex: the HBM-resident, optionally ICI-sharded corpus embedding
matrix with exact/approx MIPS search.

Replaces FAISS IndexFlatIP/IndexIVFFlat usage (reference
eval_retrieval.py:102-104, online_sampler.py:75-79) with device-resident
search. On-disk format stays reference-compatible: a float `.npy` embedding
matrix plus `idx_id.json` (IdMap), so indexes are interchangeable with the
reference pipeline's artifacts.

Beyond the reference (whose pipeline rebuilds indexes offline), a serving
index supports INCREMENTAL updates — `add` / `remove_rows` / `remove_ids` /
`compact` (FAISS `IndexFlat.add` / `remove_ids` parity):

* add appends in place into the zero-padded capacity tail (a donated
  dynamic_update_slice — no full-corpus copy until capacity is exceeded,
  then geometric growth);
* removal is a tombstone scheme: searches over-fetch k + #deleted and
  filter on the host, so EXACT search results equal a rebuilt index
  bit-for-bit at any deletion count (compact() when tombstones accumulate).
  Approximate (exact=False) searches stay approximate: the over-fetch runs
  the approx kernel at a larger k, whose recall profile differs from an
  approx search over a compacted rebuild — only removed rows' exclusion is
  guaranteed, not bit-equality;
* every mutation bumps `version`, which consumers key their compiled-fn
  caches on (QATrainer's fused encode+search cache) so a stale jit can
  never serve a pre-mutation corpus.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from proqa_tpu.index.idmap import IdMap
from proqa_tpu.ops.mips import NEG_INF, mips_topk, pad_queries
from proqa_tpu.parallel.mesh import shard_rows
from proqa_tpu.parallel.search import sharded_mips_topk


def _pad_topk_width(vals, idx, k: int):
    """Pad an in-graph top-k result out to k columns with the degenerate
    (NEG_INF, row 0) contract, so fused search always returns the SAME width
    as the unfused `search` path regardless of corpus size or IVF fill —
    a fused/unfused width mismatch would hand the jitted train step two
    batch signatures and a fresh multi-minute remote compile mid-run."""
    w = vals.shape[1]
    if w >= k:
        return vals, idx
    vals = jnp.pad(vals, ((0, 0), (0, k - w)), constant_values=float(NEG_INF))
    idx = jnp.pad(idx, ((0, 0), (0, k - w)))  # row 0
    return vals, idx


# Donated in-place row write (incremental add): the destination buffer is
# consumed, so an add never holds two full corpus copies in HBM. The start
# row is TRACED (one compiled program per (buffer, rows) shape pair, however
# many adds happen). Callers guarantee start + rows fits — XLA would
# otherwise clamp the start and silently overwrite live rows.
_place_rows_jit = jax.jit(
    lambda buf, rows, start: jax.lax.dynamic_update_slice(buf, rows, (start, 0)),
    donate_argnums=0,
)


def _place_rows(buf, rows, start: int):
    assert start + rows.shape[0] <= buf.shape[0]
    return _place_rows_jit(buf, rows, jnp.int32(start))


_place_vec_jit = jax.jit(
    lambda buf, vec, start: jax.lax.dynamic_update_slice(buf, vec, (start,)),
    donate_argnums=0,
)


def _place_vec(buf, vec, start: int):
    assert start + vec.shape[0] <= buf.shape[0]
    return _place_vec_jit(buf, vec, jnp.int32(start))


def _query_mask(ids):
    """Attention mask derived on device: (ids != 0), with position 0 forced
    on so batch-pad rows (all zeros) attend [CLS] only instead of nothing.
    Real rows start with [CLS] (nonzero), so forcing position 0 is a no-op
    for them — this matches the host-built mask in OnlineSampler._retrieve."""
    mask = (ids != 0).astype(jnp.int32)
    return mask.at[:, 0].set(1)


@dataclass
class DenseIndex:
    embeddings: jax.Array          # [N_padded, D], bf16/f32/int8, device-resident
    n: int                         # true row count (<= N_padded)
    id_map: IdMap | None = None
    mesh: object | None = None     # jax.sharding.Mesh when sharded
    version: int = 0               # bumped by add/remove; cache-invalidation key
    scales: jax.Array = None       # [N_padded/quant_block] f32 (int8 only)
    quant_block: int = 1           # rows per quantization scale (int8 only)
    _deleted: np.ndarray = field(default=None, repr=False)  # sorted tombstone rows

    @property
    def dim(self) -> int:
        return self.embeddings.shape[1]

    @property
    def _query_dtype(self):
        """Scoring dtype for queries: int8 corpora score in bf16 (rows
        convert losslessly — integers <= 256 are exact in bf16)."""
        d = self.embeddings.dtype
        return jnp.bfloat16 if d == jnp.int8 else d

    def __len__(self) -> int:
        return self.n - self.n_deleted

    @property
    def n_deleted(self) -> int:
        return 0 if self._deleted is None else int(self._deleted.size)

    # ---------------- construction ----------------

    @classmethod
    def from_embeddings(
        cls,
        embeddings,
        id_map: IdMap | None = None,
        *,
        mesh=None,
        dtype=jnp.bfloat16,
        pad_multiple: int = 1024,
    ) -> "DenseIndex":
        """Build from a host [N, D] array. Rows are padded to pad_multiple
        (and the mesh size) so search tiles and shards divide evenly; padded
        rows are zero vectors and can never be returned (scores masked).

        dtype "int8" (or jnp.int8) stores the corpus int8-quantized
        (ops/quant.py; the per-block scale granularity is pinned to the
        search kernel's reduce block via ops.mips.envelope_block) at HALF
        the bf16 footprint — 67.2M rows/chip at D=128 on a 16 GiB v5e —
        with searches exact w.r.t. the quantized scores."""
        n = embeddings.shape[0]
        mult = pad_multiple
        n_dev = 1
        if mesh is not None:
            n_dev = int(np.prod(list(mesh.shape.values())))
            mult = np.lcm(mult, n_dev)
        n_pad = (-n) % mult
        if dtype in ("int8", jnp.int8):
            from proqa_tpu.ops.mips import envelope_block
            from proqa_tpu.ops.quant import quantize_rows

            n_total = n + n_pad
            # the kernel reduces per shard: pin the quantization block to
            # the per-shard envelope, shrunk (if needed) to divide the shard
            qb = envelope_block(n_total // n_dev)
            while qb > 16 and (n_total // n_dev) % qb:
                qb //= 2
            if (n_total // n_dev) % qb:
                raise ValueError(
                    f"cannot pick an int8 quantization block for "
                    f"{n_total}/{n_dev} rows per shard"
                )
            q8, sc = quantize_rows(embeddings, block=qb)  # memmap-friendly
            if n_pad:
                q8 = np.concatenate(
                    [q8, np.zeros((n_pad, q8.shape[1]), np.int8)]
                )
            nb_total = n_total // qb
            if sc.shape[0] < nb_total:
                sc = np.concatenate(
                    [sc, np.ones((nb_total - sc.shape[0],), np.float32)]
                )
            return cls._from_quantized(q8, sc, n, qb, id_map, mesh)
        if n_pad and isinstance(embeddings, np.memmap):
            # streaming/memmap builds: pad on device instead of materializing
            # a padded host copy (O(corpus) RAM at Wikipedia scale)
            arr = jnp.pad(jnp.asarray(embeddings, dtype=dtype), ((0, n_pad), (0, 0)))
        else:
            if n_pad:
                embeddings = np.concatenate(
                    [np.asarray(embeddings),
                     np.zeros((n_pad, embeddings.shape[1]), embeddings.dtype)]
                )
            arr = jnp.asarray(embeddings, dtype=dtype)
        if mesh is not None:
            arr = shard_rows(mesh, arr)
        else:
            arr = jax.device_put(arr)
        return cls(embeddings=arr, n=n, id_map=id_map, mesh=mesh)

    @classmethod
    def _from_quantized(cls, q8, sc, n: int, qb: int, id_map, mesh) -> "DenseIndex":
        """Internal: already-padded int8 rows + f32 per-block scales onto
        device."""
        if mesh is not None:
            arr = shard_rows(mesh, jnp.asarray(q8, jnp.int8))
            scales = shard_rows(mesh, jnp.asarray(sc, jnp.float32))
        else:
            arr = jax.device_put(jnp.asarray(q8, jnp.int8))
            scales = jax.device_put(jnp.asarray(sc, jnp.float32))
        return cls(embeddings=arr, n=n, id_map=id_map, mesh=mesh,
                   scales=scales, quant_block=qb)

    @property
    def is_quantized(self) -> bool:
        return self.scales is not None

    # ---------------- incremental updates (serving) ----------------

    _PAD_MULTIPLE = 1024

    def add(self, embeddings, ids=None) -> None:
        """Append rows in place (serving-time incremental updates; the
        reference pipeline only ever rebuilds offline). The write is a
        donated `dynamic_update_slice` into the zero-padded capacity tail —
        no O(corpus) copy unless capacity is exceeded, then geometric (1.5x)
        growth. New-row counts are padded to power-of-two buckets so repeated
        small adds reuse a handful of compiled update programs (remote
        compiles through the tunnel are expensive).

        Not supported on mesh-sharded indexes (row resharding is a rebuild:
        use from_embeddings(mesh=...)) or through an IVF view (slab layout
        is build-time: mutate the dense index, then re-run to_ivf)."""
        if self.mesh is not None:
            raise ValueError(
                "incremental add on a mesh-sharded index is not supported — "
                "rebuild with DenseIndex.from_embeddings(..., mesh=mesh)"
            )
        new = np.asarray(embeddings, np.float32)
        if new.ndim != 2 or new.shape[1] != self.dim:
            raise ValueError(f"expected [m, {self.dim}] rows, got {new.shape}")
        m = new.shape[0]
        if (ids is None) != (self.id_map is None):
            raise ValueError(
                "ids must be passed iff the index has an id map "
                f"(has map: {self.id_map is not None})"
            )
        if ids is not None:
            ids = list(ids)
            if len(ids) != m:
                raise ValueError(f"{m} rows but {len(ids)} ids")
        if m == 0:
            return
        # bucket the write width so repeated adds share compiled programs;
        # the bucket tail rewrites zeros over the (all-zero) capacity tail
        qb = self.quant_block
        start = self.n                     # first written row
        if self.scales is not None:
            # quantization blocks are absolute [i*qb, (i+1)*qb) row ranges:
            # an add starting mid-block REQUANTIZES that straddled block
            # (old rows re-round once against the possibly-larger scale)
            r0 = (self.n // qb) * qb
            if r0 < self.n:
                old = self.take(np.arange(r0, self.n))     # dequantized f32
                new = np.concatenate([old, new])
                start = r0
        m_w = new.shape[0]                 # rows written (old straddle + new)
        mp = 1
        while mp < m_w:
            mp *= 2
        cap = self.embeddings.shape[0]
        if start + mp > cap:
            new_cap = max(start + mp, cap + cap // 2)
            new_cap += (-new_cap) % self._PAD_MULTIPLE
            buf = jnp.zeros((new_cap, self.dim), self.embeddings.dtype)
            self.embeddings = _place_rows(buf, self.embeddings, 0)
            if self.scales is not None:
                sbuf = jnp.ones((new_cap // qb,), jnp.float32)
                self.scales = _place_vec(sbuf, self.scales, 0)
        if self.scales is not None:
            from proqa_tpu.ops.quant import quantize_rows

            pad_rows = mp - m_w            # zero rows complete the buckets
            padded_f = np.zeros((mp, self.dim), np.float32)
            padded_f[:m_w] = new
            q8, sc = quantize_rows(padded_f, block=qb)
            # zero pad rows re-zero the capacity tail; their blocks' scales
            # must NOT clobber real scales: only write blocks that contain
            # at least one real row (scale of all-zero blocks is 1 anyway)
            nb_real = -(-m_w // qb)
            sc[nb_real:] = 1.0
            self.scales = _place_vec(self.scales, jnp.asarray(sc), start // qb)
            padded = q8
            del pad_rows
        else:
            padded = np.zeros((mp, self.dim), np.float32)
            padded[:m_w] = new
        self.embeddings = _place_rows(
            self.embeddings,
            jnp.asarray(padded, self.embeddings.dtype),
            start,
        )
        self.n += m
        if ids is not None:
            self.id_map.extend(ids)
        self.version += 1

    def remove_rows(self, rows) -> int:
        """Tombstone index rows (exact: searches over-fetch and filter, so
        results equal a rebuilt index — see class docstring). Returns the
        number of NEWLY deleted rows. compact() reclaims the space."""
        if self.mesh is not None:
            raise ValueError("incremental removal on a mesh-sharded index "
                             "is not supported")
        rows = np.unique(np.asarray(rows, np.int64))
        if rows.size and (rows[0] < 0 or rows[-1] >= self.n):
            raise ValueError(f"row out of range [0, {self.n})")
        merged = rows if self._deleted is None else np.union1d(self._deleted, rows)
        newly = int(merged.size) - self.n_deleted
        if newly == 0:
            return 0
        self._deleted = merged
        self.version += 1
        return newly

    def remove_ids(self, doc_ids) -> int:
        """Tombstone every row carrying any of the given doc ids (FAISS
        remove_ids parity; duplicated ids tombstone all their rows)."""
        assert self.id_map is not None, "index has no id map"
        return self.remove_rows(self.id_map.ids_to_rows(doc_ids))

    def live_rows(self, doc_ids) -> list[int]:
        """Rows carrying the given doc ids that are NOT tombstoned — the
        retrievable rows. (IdMap.ids_to_rows is history-blind: after an
        upsert it also returns the replaced, tombstoned row.)"""
        assert self.id_map is not None, "index has no id map"
        rows = self.id_map.ids_to_rows(doc_ids)
        if self._deleted is None or not rows:
            return rows
        mask = ~np.isin(np.asarray(rows, np.int64), self._deleted)
        return [r for r, live in zip(rows, mask) if live]

    def compact(self) -> "DenseIndex":
        """Rebuild without tombstoned rows (fresh row numbering). Returns a
        NEW index; the old one stays valid. O(corpus) — amortize over many
        removals."""
        keep = np.arange(self.n)
        if self.n_deleted:
            keep = np.setdiff1d(keep, self._deleted)
        id_map = None
        if self.id_map is not None:
            id_map = IdMap([self.id_map[int(i)] for i in keep])
        if self.scales is not None:
            # surviving rows regroup into fresh quantization blocks, so the
            # codes REQUANTIZE from their dequantized values (one extra
            # rounding, <= half a quantization step; equivalent to
            # from_embeddings(dequantized survivors, dtype="int8"))
            host = self.take(keep)
            return DenseIndex.from_embeddings(
                host, id_map, mesh=self.mesh, dtype="int8"
            )
        host = np.asarray(
            jnp.take(self.embeddings, jnp.asarray(keep), axis=0, mode="clip")
        )
        return DenseIndex.from_embeddings(
            host, id_map, mesh=self.mesh, dtype=self.embeddings.dtype
        )

    def _filter_deleted(self, vals: np.ndarray, idx: np.ndarray, k: int):
        """Drop tombstoned rows from host top-(k+d) results, keeping the
        first k survivors per query (order-preserving), padding any
        under-filled tail with the (NEG_INF, row 0) degenerate contract."""
        keep_mask = ~np.isin(idx, self._deleted)
        out_v = np.full((vals.shape[0], k), -np.inf, np.float32)
        out_i = np.zeros((idx.shape[0], k), idx.dtype)
        for r in range(vals.shape[0]):
            cols = np.nonzero(keep_mask[r])[0][:k]
            out_v[r, : cols.size] = vals[r, cols]
            out_i[r, : cols.size] = idx[r, cols]
        return out_v, out_i

    # ---------------- search ----------------

    def search(self, queries, k: int, *, exact: bool = True, q_pad: int = 256,
               _skip_tombstones: bool = False, **kw):
        """Top-k rows by inner product. queries: [Q, D] host or device array.
        Returns (values [Q, k] f32 np, indices [Q, k] i32 np), padded rows,
        padded queries, and tombstoned (removed) rows excluded."""
        if self.n_deleted and not _skip_tombstones:
            # exact tombstone semantics: over-fetch so that even if every
            # deleted row outscored the true top-k, k live rows survive the
            # host filter. The fetch width is bucketed (next power of two)
            # so accumulating deletions don't compile a fresh top-k width
            # per removal.
            k_fetch = min(self.n, 1 << max(k + self.n_deleted - 1, 1).bit_length())
            vals, idx = self.search(
                queries, k_fetch, exact=exact, q_pad=q_pad,
                _skip_tombstones=True, **kw,
            )
            return self._filter_deleted(vals, idx, k)
        q = jnp.asarray(queries, dtype=self._query_dtype)
        q, q_n = pad_queries(q, q_pad)
        k_eff = min(k, self.n)
        if self.mesh is not None:
            vals, idx = sharded_mips_topk(
                q, self.embeddings, k_eff, self.mesh, exact=exact, n_valid=self.n,
                scales=self.scales, quant_block=self.quant_block, **kw
            )
        else:
            vals, idx = mips_topk(q, self.embeddings, k_eff, exact=exact,
                                  n_valid=self.n, scales=self.scales,
                                  quant_block=self.quant_block, **kw)
        vals = np.asarray(vals[:q_n])
        idx = np.asarray(idx[:q_n])
        if k_eff < k:  # degenerate tiny-corpus case
            vals = np.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, k - k_eff)), constant_values=0)
        return vals, idx

    def fused_search_fn(self, encode_fn, k: int, *, exact: bool = True,
                        q_count: int | None = None):
        """One-dispatch encode+search: returns `(jitted_fn, operands)` where
        `jitted_fn(params, ids, *operands) -> (vals, idx)`, or None when
        this index cannot fuse at the given operating point.

        Motivation: the online QA sampler's per-group chain used to be two
        synchronized dispatches (encode -> host -> search); each synchronized
        dispatch through the tunneled TPU costs ~26-52 ms of fixed latency, so
        fusing them halves the sampler's dispatch wall share. (The reference
        runs this chain per single question: qa/online_sampler.py:104-121.)
        The attention mask is derived ON DEVICE — (ids != 0) with position 0
        forced on, so all-pad rows attend [CLS] only — saving one per-group
        host->device transfer. The index matrix is passed as an operand, not
        closed over — closing a GiB-scale constant into a jit ships it in the
        remote compile payload.
        """
        del q_count  # dense search has no host-side chunking to respect
        if self.n_deleted:
            # tombstoned rows need the host-side over-fetch + filter of
            # .search — no single-dispatch fused program expresses that.
            # Callers treat None as "use the two-dispatch path" (which
            # filters); compact() restores fusion.
            return None
        k_eff = min(k, self.n)
        n_valid = self.n
        mesh = self.mesh
        qdt = self._query_dtype
        qb = self.quant_block

        if mesh is not None:
            def f(params, ids, emb, *sc):
                q = encode_fn(params, ids, _query_mask(ids)).astype(qdt)
                v, i = sharded_mips_topk(q, emb, k_eff, mesh, exact=exact,
                                         n_valid=n_valid,
                                         scales=sc[0] if sc else None,
                                         quant_block=qb)
                return _pad_topk_width(v, i, k)
        else:
            def f(params, ids, emb, *sc):
                q = encode_fn(params, ids, _query_mask(ids)).astype(qdt)
                v, i = mips_topk(q, emb, k_eff, exact=exact, n_valid=n_valid,
                                 scales=sc[0] if sc else None, quant_block=qb)
                return _pad_topk_width(v, i, k)
        operands = (self.embeddings,)
        if self.scales is not None:
            operands += (self.scales,)
        return jax.jit(f), operands

    def search_ids(self, queries, k: int, **kw):
        """Search returning document ids via the IdMap (reference
        convert_idx2id, eval_retrieval.py:68-76)."""
        assert self.id_map is not None, "index has no id map"
        vals, idx = self.search(queries, k, **kw)
        ids = [self.id_map.rows_to_ids(row) for row in idx]
        return vals, idx, ids

    def take(self, rows) -> np.ndarray:
        """Gather embedding rows (e.g. para_embed for the QA rank head).
        mode="clip": -1 padding slots (under-filled retrieval) gather row 0,
        matching the host path's np.maximum(rows, 0) — default jnp.take
        wraps -1 to the LAST row instead. int8 rows come back dequantized."""
        r = jnp.asarray(rows)
        out = jnp.take(self.embeddings, r, axis=0, mode="clip")
        if self.scales is not None:
            sc = jnp.take(self.scales, jnp.maximum(r, 0) // self.quant_block,
                          axis=0, mode="clip")
            out = out.astype(jnp.float32) * sc[..., None]
        return np.asarray(out, np.float32)

    # ---------------- persistence (reference-compatible) ----------------

    def save(self, path: str) -> None:
        """Writes `<path>/embeddings.npy` (f32, unpadded) + `<path>/idx_id.json`.
        Tombstoned rows are compacted away (the artifact is always clean;
        row numbering restarts, like a FAISS rebuild)."""
        if self.n_deleted:
            self.compact().save(path)
            return
        os.makedirs(path, exist_ok=True)
        if self.scales is not None:
            # the artifact stays the reference-compatible f32 matrix: int8 is
            # a RUNTIME representation (re-quantize at load with dtype="int8";
            # a same-n reload recovers the codes bit-for-bit — the absmax
            # element of each block dequantizes to exactly +-127*scale)
            host = self.take(np.arange(self.n))
        else:
            host = np.asarray(self.embeddings[: self.n], dtype=np.float32)
        np.save(os.path.join(path, "embeddings.npy"), host)
        if self.id_map is not None:
            self.id_map.save(os.path.join(path, "idx_id.json"))

    @classmethod
    def load(cls, path: str, *, mesh=None, dtype=jnp.bfloat16) -> "DenseIndex":
        """Loads either our layout or bare reference artifacts: `path` may be
        a directory (embeddings.npy [+ idx_id.json]) or a .npy file.
        dtype="int8" quantizes at load (chunked over the memmap)."""
        if os.path.isdir(path):
            emb_path = os.path.join(path, "embeddings.npy")
            map_path = os.path.join(path, "idx_id.json")
            id_map = IdMap.load(map_path) if os.path.exists(map_path) else None
        else:
            emb_path, id_map = path, None
        emb = np.load(emb_path, mmap_mode="r")  # bounded-RAM load at scale
        return cls.from_embeddings(emb, id_map, mesh=mesh, dtype=dtype)

    def to_ivf(self, *, nlist: int = 100, nprobe: int = 20, niter: int = 20,
               seed: int = 0, **kw) -> "IVFDenseIndex":
        """Train an IVF coarse quantizer over this index (the reference's
        online-QA configuration: nlist=100, nprobe=20 —
        qa/online_sampler.py:75-79)."""
        from proqa_tpu.index.ivf import build_ivf

        if self.n_deleted:
            raise ValueError(
                "index has tombstoned rows — compact() before to_ivf() so "
                "the slab layout can't serve removed paragraphs"
            )

        if self.scales is not None:  # slabs store dequantized rows
            host = self.take(np.arange(self.n))
        else:
            host = np.asarray(self.embeddings[: self.n], np.float32)
        ivf = build_ivf(host, nlist=nlist, nprobe=nprobe, niter=niter, seed=seed,
                        dtype=self._query_dtype, **kw)
        return IVFDenseIndex(
            embeddings=self.embeddings, n=self.n, id_map=self.id_map,
            mesh=self.mesh, ivf=ivf, scales=self.scales,
            quant_block=self.quant_block,
        )


@dataclass
class IVFDenseIndex(DenseIndex):
    """DenseIndex whose searches go through an IVF coarse quantizer
    (approximate, per-query cost ~ nprobe/nlist of the corpus) while keeping
    the dense matrix for embedding gathers (`take`) and persistence."""

    ivf: object = None

    def add(self, embeddings, ids=None) -> None:
        raise ValueError(
            "IVF slab layout is build-time: mutate the dense index, then "
            "re-run to_ivf()"
        )

    def remove_rows(self, rows) -> int:
        raise ValueError(
            "IVF slab layout is build-time: mutate the dense index, then "
            "re-run to_ivf()"
        )

    def fused_search_fn(self, encode_fn, k: int, *, exact: bool = False,
                        q_count: int | None = None):
        if exact:  # explicit exact request bypasses the quantizer
            return super().fused_search_fn(encode_fn, k, exact=True, q_count=q_count)
        from proqa_tpu.index.ivf import _ivf_search

        ivf = self.ivf
        per_q = (
            min(ivf.nprobe, ivf.nlist) * ivf.capacity
            * ivf.slabs.shape[-1] * ivf.slabs.dtype.itemsize
        )
        chunk = max(8, int(ivf.GATHER_BUDGET_BYTES // max(per_q, 1)) // 8 * 8)
        if q_count is not None and q_count > chunk:
            return None  # would need host-side chunking — keep the unfused path
        k_eff = min(k, self.n)
        nprobe = ivf.nprobe
        spherical = ivf.spherical  # probe with the quantizer's own geometry

        def f(params, ids, cent, slabs, srows, over, orows):
            q = encode_fn(params, ids, _query_mask(ids)).astype(slabs.dtype)
            v, i = _ivf_search(q, cent, slabs, srows, over, orows, k=k_eff,
                               nprobe=nprobe, spherical=spherical)
            # _ivf_search caps its width at nprobe*capacity+overflow, which
            # can undercut k — pad to the unfused path's full-k contract
            return _pad_topk_width(v, i, k)

        return jax.jit(f), (
            ivf.centroids, ivf.slabs, ivf.slab_rows, ivf.overflow, ivf.overflow_rows,
        )

    def search(self, queries, k: int, *, exact: bool = False, q_pad: int | None = None, **kw):
        if exact:  # explicit exact request bypasses the quantizer
            return super().search(queries, k, exact=True,
                                  q_pad=q_pad if q_pad is not None else 256, **kw)
        q = jnp.asarray(queries, dtype=self._query_dtype)
        # pad ragged query batches so distinct query counts don't each compile
        # a fresh _ivf_search shape (multi-minute remote compiles through the
        # tunnel). An EXPLICIT q_pad is a caller's compile-shape convention
        # (e.g. the sampler pads every question group to one fixed size) —
        # honor it exactly. Otherwise, unlike the dense path (one matmul;
        # padding ~free) IVF cost is per-query slab gathers, so default to
        # next-power-of-two buckets instead of flooring every call at 256: a
        # handful of reusable compile shapes without 32x the gather work for
        # an 8-query direct call.
        if q_pad is None:
            q_pad = 1
            while q_pad < min(len(q), 256):
                q_pad *= 2
        q, q_n = pad_queries(q, q_pad)
        vals, idx = self.ivf.search(q, min(k, self.n))
        vals, idx = np.asarray(vals)[:q_n], np.asarray(idx)[:q_n]
        if vals.shape[1] < k:
            vals = np.pad(vals, ((0, 0), (0, k - vals.shape[1])), constant_values=-np.inf)
            idx = np.pad(idx, ((0, 0), (0, k - idx.shape[1])))
        return vals, idx
