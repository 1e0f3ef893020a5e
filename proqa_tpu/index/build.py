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
    encode = encode_query if is_query else encode_context

    fn = lambda p, ids, mask: encode(p, cfg, ids, mask)
    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        sharded = NamedSharding(mesh, P(DATA_AXIS))
        jfn = jax.jit(fn, in_shardings=(replicated, sharded, sharded), out_shardings=sharded)
    else:
        jfn = jax.jit(fn)

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
) -> DenseIndex:
    """Encode a {"text": ..., ["id": ...]} jsonl corpus into a DenseIndex."""
    dataset = EncodeDataset(tokenizer, corpus_jsonl, max_length=max_length, is_query=False)
    if doc_ids is None:
        doc_ids = [row.get("id", str(i)) for i, row in enumerate(dataset.data)]
    embeds = encode_corpus(
        params, cfg, dataset, batch_size=batch_size, is_query=False, mesh=mesh, progress=True
    )
    index = DenseIndex.from_embeddings(
        embeds, IdMap.from_doc_ids(doc_ids), mesh=mesh, dtype=dtype
    )
    if save_path:
        index.save(save_path)
    return index
