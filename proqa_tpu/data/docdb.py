"""Sqlite paragraph store.

Equivalent of the reference DocDB (/root/reference/retrieval/utils.py:68-105):
a `documents(id PRIMARY KEY, text)` table (e.g. nq_paras.db). Adds a writer
classmethod so tests and converters can build stores, and an LRU row cache for
the QA online sampler's hot lookups.
"""
from __future__ import annotations

import sqlite3
from functools import lru_cache


class DocDB:
    def __init__(self, db_path: str, cache_size: int = 1 << 16):
        self.path = db_path
        self.connection = sqlite3.connect(db_path, check_same_thread=False)
        self._get_cached = lru_cache(maxsize=cache_size)(self._get_doc_text)

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()

    def close(self):
        self.connection.close()

    def get_doc_ids(self) -> list[str]:
        cursor = self.connection.cursor()
        cursor.execute("SELECT id FROM documents")
        ids = [r[0] for r in cursor.fetchall()]
        cursor.close()
        return ids

    def _get_doc_text(self, doc_id: str):
        cursor = self.connection.cursor()
        cursor.execute("SELECT text FROM documents WHERE id = ?", (doc_id,))
        result = cursor.fetchone()
        cursor.close()
        return result if result is None else result[0]

    def get_doc_text(self, doc_id: str):
        return self._get_cached(doc_id)

    def __len__(self) -> int:
        cursor = self.connection.cursor()
        cursor.execute("SELECT COUNT(*) FROM documents")
        (n,) = cursor.fetchone()
        cursor.close()
        return n

    @classmethod
    def create(cls, db_path: str, docs) -> "DocDB":
        """Build a store from an iterable of (id, text) pairs."""
        conn = sqlite3.connect(db_path)
        conn.execute("CREATE TABLE documents (id PRIMARY KEY, text)")
        conn.executemany("INSERT INTO documents VALUES (?, ?)", docs)
        conn.commit()
        conn.close()
        return cls(db_path)
