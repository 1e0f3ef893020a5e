"""Import machinery for EXECUTING the reference's own modules as parity
oracles (VERDICT round-2 task #3: a re-derived oracle can share a bug with
the code under test; the reference's own code cannot).

The reference modules are plain scripts importing each other by bare name
(`from basic_tokenizer import ...`) and importing faiss at module top; this
loader stubs faiss (numpy stands in for the one FAISS call in tests) and
temporarily extends sys.path for the intra-reference imports.
"""
from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference"
_PATHS = [f"{REF}/qa", f"{REF}/retrieval"]


def load_reference_module(subdir: str, modname: str):
    """Load /root/reference/<subdir>/<modname>.py under a private key."""
    if "faiss" not in sys.modules:
        sys.modules["faiss"] = types.ModuleType("faiss")
    key = f"_ref_{subdir}_{modname}"
    if key in sys.modules:
        return sys.modules[key]
    added = [p for p in _PATHS if p not in sys.path]
    sys.path[0:0] = added
    try:
        spec = importlib.util.spec_from_file_location(
            key, f"{REF}/{subdir}/{modname}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[key] = mod
        spec.loader.exec_module(mod)
    finally:
        for p in added:
            sys.path.remove(p)
    return mod
