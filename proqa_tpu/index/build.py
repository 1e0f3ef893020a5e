"""Corpus/query encoding into dense embeddings (index building).

Equivalent of /root/reference/retrieval/get_embed.py:29-176: stream jsonl
text through the retriever's context (or question) tower and emit the [N, D]
embedding matrix. TPU restructuring: static-shape batches from the prefetching
loader, one jitted bf16 encode per batch, host accumulation in fp32
(.npy-compatible artifact) — this is throughput workload #1 (SURVEY.md §3.2).
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from proqa_tpu.data.datasets import EncodeDataset
from proqa_tpu.data.loader import BatchLoader
from proqa_tpu.index.dense import DenseIndex
from proqa_tpu.index.idmap import IdMap
from proqa_tpu.models.bert import BertConfig
from proqa_tpu.models.retriever import encode_context, encode_query
from proqa_tpu.parallel.mesh import DATA_AXIS
from jax.sharding import NamedSharding, PartitionSpec as P


DEFAULT_BUCKETS = (64, 128, 192, 256, 384, 512)

import functools


@functools.partial(jax.jit, static_argnames=("cfg", "is_query"))
def _encode_jit(params, ids, mask, *, cfg: BertConfig, is_query: bool):
    """Module-level jit so repeated encode_corpus calls (and each bucket
    width) hit the global compile cache — a per-call jax.jit(lambda ...)
    re-traced every bucket shape on every call."""
    encode = encode_query if is_query else encode_context
    return encode(params, cfg, ids, mask)


@functools.lru_cache(maxsize=None)
def _encode_jit_mesh(cfg: BertConfig, is_query: bool, mesh):
    """Cached mesh-sharded variant: same retracing trap as _encode_jit —
    a per-call jax.jit over a fresh lambda recompiles every bucket width on
    every encode_corpus/encode_corpus_streaming invocation (multi-minute
    remote compiles through the tunnel)."""
    encode = encode_query if is_query else encode_context
    fn = lambda p, ids, mask: encode(p, cfg, ids, mask)
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(fn, in_shardings=(replicated, sharded, sharded), out_shardings=sharded)


def encode_corpus(
    params,
    cfg: BertConfig,
    dataset: EncodeDataset,
    *,
    batch_size: int = 512,
    is_query: bool = False,
    mesh=None,
    prefetch: int = 4,
    progress: bool = False,
    buckets: tuple | None = DEFAULT_BUCKETS,
) -> np.ndarray:
    """Encode every row of the dataset; returns [N, D] float32 host array.

    With `buckets`, rows are length-sorted and padded to the smallest fitting
    bucket (few compiled signatures, 3-4x less padding waste at corpus scale
    — measured 634 paras/s at pad-512 vs 3272 at pad-128 on v5e); outputs are
    written back in original row order.
    """
    if mesh is not None:
        jfn = _encode_jit_mesh(cfg, is_query, mesh)
    else:
        jfn = functools.partial(_encode_jit, cfg=cfg, is_query=is_query)

    n = len(dataset)

    if buckets is None:
        out: list[np.ndarray] = []
        loader = BatchLoader(dataset.batches(batch_size), prefetch=prefetch)
        for i, batch in enumerate(loader):
            rows = batch["__rows__"]
            emb = jfn(params, jnp.asarray(batch["input_ids"]), jnp.asarray(batch["input_mask"]))
            out.append(np.asarray(emb, np.float32)[:rows])
            if progress and i % 50 == 0:
                print(f"encoded {sum(o.shape[0] for o in out)} / {n}", flush=True)
        return np.concatenate(out, axis=0)

    from proqa_tpu.data.collate import batch_pad, collate_tokens

    buckets = tuple(b for b in buckets if b <= dataset.max_len)
    if not buckets or buckets[-1] < dataset.max_len:
        buckets = buckets + (dataset.max_len,)

    ids_all = [dataset[i] for i in range(n)]  # host tokenization (native path)
    order = np.argsort([len(x) for x in ids_all], kind="stable")

    def gen():
        for start in range(0, n, batch_size):
            sel = order[start : start + batch_size]
            ids = collate_tokens([ids_all[i] for i in sel], buckets=buckets)
            batch = {"input_ids": ids, "input_mask": (ids != 0).astype(np.int32)}
            batch, rows = batch_pad(batch, batch_size)
            yield sel, batch, rows

    out_arr: np.ndarray | None = None
    done = 0
    for sel, batch, rows in BatchLoader(gen(), prefetch=prefetch):
        emb = jfn(params, jnp.asarray(batch["input_ids"]), jnp.asarray(batch["input_mask"]))
        emb = np.asarray(emb, np.float32)[:rows]
        if out_arr is None:
            out_arr = np.empty((n, emb.shape[1]), np.float32)
        out_arr[sel] = emb
        done += rows
        if progress and done % (50 * batch_size) < batch_size:
            print(f"encoded {done} / {n}", flush=True)
    return out_arr if out_arr is not None else np.empty((0, 0), np.float32)


def encode_corpus_streaming(
    params,
    cfg: BertConfig,
    corpus_jsonl: str,
    tokenizer,
    out_path: str,
    *,
    max_length: int = 512,
    batch_size: int = 512,
    chunk_rows: int = 65536,
    buckets: tuple | None = DEFAULT_BUCKETS,
    mesh=None,
    prefetch: int = 4,
    progress: bool = False,
) -> tuple[np.ndarray, list[str]]:
    """Bounded-host-RAM corpus encode (Wikipedia-scale builds on small hosts,
    reference workload /root/reference/retrieval/get_embed.py at 20M+ rows).

    Streams the jsonl twice: pass 1 collects doc ids + row count (strings
    only); pass 2 tokenizes, length-buckets and encodes WITHIN chunks of
    `chunk_rows`, writing each chunk's embeddings straight into a .npy memmap
    at `out_path`. Peak host memory is O(chunk_rows), never O(corpus).

    Returns (embeddings memmap [N, D] f32, doc_ids).
    """
    import json as _json
    import os

    from proqa_tpu.data.collate import batch_pad, collate_tokens

    # ---- pass 1: ids + count (no text retained) ----
    doc_ids: list[str] = []
    with open(corpus_jsonl) as f:
        for line in f:
            if line.strip():
                row = _json.loads(line)
                doc_ids.append(str(row.get("id", len(doc_ids))))
    n = len(doc_ids)

    dim = np.asarray(params["proj_c"]["bias"]).shape[0]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    out = np.lib.format.open_memmap(out_path, mode="w+", dtype=np.float32, shape=(n, dim))

    if mesh is not None:
        jfn = _encode_jit_mesh(cfg, False, mesh)
    else:
        jfn = functools.partial(_encode_jit, cfg=cfg, is_query=False)

    if buckets is not None:
        buckets = tuple(b for b in buckets if b <= max_length)
        if not buckets or buckets[-1] < max_length:
            buckets = buckets + (max_length,)

    def chunk_texts():
        texts, base = [], 0
        with open(corpus_jsonl) as f:
            for line in f:
                if not line.strip():
                    continue
                row = _json.loads(line)
                # pair-format rows encode their Paragraph field, matching
                # EncodeDataset (progressive phase-2 embeds the pair file)
                text = row.get("text", row.get("Paragraph"))
                if text is None:
                    raise KeyError(
                        f"corpus row has neither 'text' nor 'Paragraph': "
                        f"{list(row)[:6]}"
                    )
                texts.append(text)
                if len(texts) == chunk_rows:
                    yield base, texts
                    base += len(texts)
                    texts = []
        if texts:
            yield base, texts

    def batches():
        for base, texts in chunk_texts():
            ids_chunk = [tokenizer.encode(t, max_length=max_length) for t in texts]
            order = np.argsort([len(x) for x in ids_chunk], kind="stable")
            for start in range(0, len(ids_chunk), batch_size):
                sel = order[start : start + batch_size]
                ids = collate_tokens([ids_chunk[i] for i in sel], buckets=buckets) \
                    if buckets is not None else collate_tokens(
                        [ids_chunk[i] for i in sel], length=max_length)
                batch = {"input_ids": ids, "input_mask": (ids != 0).astype(np.int32)}
                batch, rows = batch_pad(batch, batch_size)
                yield base + sel, batch, rows

    done = 0
    for global_rows, batch, rows in BatchLoader(batches(), prefetch=prefetch):
        emb = jfn(params, jnp.asarray(batch["input_ids"]), jnp.asarray(batch["input_mask"]))
        out[global_rows] = np.asarray(emb, np.float32)[:rows]
        done += rows
        if progress and done % (50 * batch_size) < batch_size:
            print(f"encoded {done} / {n}", flush=True)
    out.flush()
    return out, doc_ids


def build_index(
    params,
    cfg: BertConfig,
    corpus_jsonl: str,
    *,
    doc_ids: Iterable[str] | None = None,
    tokenizer=None,
    max_length: int = 512,
    batch_size: int = 512,
    mesh=None,
    dtype=jnp.bfloat16,
    save_path: str | None = None,
    stream_chunk: int = 0,
) -> DenseIndex:
    """Encode a {"text": ..., ["id": ...]} jsonl corpus into a DenseIndex.

    stream_chunk > 0 switches to the bounded-RAM path (requires save_path):
    embeddings are written incrementally into `<save_path>/embeddings.npy`
    and the device index is built from the memmap, so host memory stays
    O(stream_chunk) regardless of corpus size.
    """
    import os

    if stream_chunk > 0:
        assert save_path, "streaming build writes directly into save_path"
        os.makedirs(save_path, exist_ok=True)
        emb_path = os.path.join(save_path, "embeddings.npy")
        embeds, ids = encode_corpus_streaming(
            params, cfg, corpus_jsonl, tokenizer, emb_path,
            max_length=max_length, batch_size=batch_size,
            chunk_rows=stream_chunk, mesh=mesh, progress=True,
        )
        id_map = IdMap.from_doc_ids(doc_ids if doc_ids is not None else ids)
        id_map.save(os.path.join(save_path, "idx_id.json"))
        return DenseIndex.from_embeddings(embeds, id_map, mesh=mesh, dtype=dtype)

    dataset = EncodeDataset(tokenizer, corpus_jsonl, max_length=max_length, is_query=False)
    if doc_ids is None:
        # stringify like the streaming path (:158) and build-db (cli/main.py):
        # an int jsonl id would otherwise miss every DocDB text lookup (sqlite
        # no-affinity column stores "123", int 123 never matches) and every
        # gold-row inverse lookup — silent quality collapse, no error
        doc_ids = [str(row.get("id", i)) for i, row in enumerate(dataset.data)]
    embeds = encode_corpus(
        params, cfg, dataset, batch_size=batch_size, is_query=False, mesh=mesh, progress=True
    )
    index = DenseIndex.from_embeddings(
        embeds, IdMap.from_doc_ids(doc_ids), mesh=mesh, dtype=dtype
    )
    if save_path:
        index.save(save_path)
    return index
