"""Index-row <-> document-id mapping.

Equivalent of the reference's `idx_id.json` artifact
(/root/reference/retrieval/gen_index_id_map.py:1-9, consumed at
eval_retrieval.py:68-76 and online_sampler.py:86,120): dense index row i maps
to the sqlite doc id of the paragraph encoded into that row.
"""
from __future__ import annotations

import json
from typing import Iterable, Sequence


class IdMap:
    def __init__(self, ids: Sequence[str]):
        self._ids = list(ids)

    def __len__(self) -> int:
        return len(self._ids)

    def __getitem__(self, row: int) -> str:
        return self._ids[row]

    def rows_to_ids(self, rows: Iterable[int]) -> list[str]:
        return [self._ids[int(r)] for r in rows]

    def ids_to_rows(self, doc_ids: Iterable[str]) -> list[int]:
        """ALL row indices of the given doc ids (unknown ids skipped; a
        duplicated doc id maps to every row carrying it, matching
        id-membership semantics). Inverse built lazily and cached — used to
        turn gold-paragraph id sets into row sets so per-candidate labeling
        is a vectorized isin, not a 5000-element Python loop per question."""
        inv = getattr(self, "_inv", None)
        if inv is None:
            inv = self._inv = {}
            for i, d in enumerate(self._ids):
                inv.setdefault(d, []).append(i)
        out: list[int] = []
        for d in doc_ids:
            out.extend(inv.get(d, ()))
        return out

    def extend(self, doc_ids: Iterable[str]) -> None:
        """Append ids for incrementally added index rows (DenseIndex.add);
        drops the cached inverse so ids_to_rows sees the new rows."""
        self._ids.extend(doc_ids)
        if hasattr(self, "_inv"):
            del self._inv

    @classmethod
    def from_doc_ids(cls, doc_ids: Iterable[str]) -> "IdMap":
        return cls(list(doc_ids))

    # -- reference-compatible artifact: {"0": id0, "1": id1, ...} --
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({str(i): d for i, d in enumerate(self._ids)}, f)

    @classmethod
    def load(cls, path: str) -> "IdMap":
        with open(path) as f:
            raw = json.load(f)
        ids = [raw[str(i)] for i in range(len(raw))]
        return cls(ids)
