"""Import machinery for EXECUTING the reference's own modules as parity
oracles (VERDICT round-2 task #3: a re-derived oracle can share a bug with
the code under test; the reference's own code cannot).

The reference modules are plain scripts importing each other by bare name
(`from basic_tokenizer import ...`) and importing faiss at module top; this
loader stubs faiss (numpy stands in for the one FAISS call in tests) and
temporarily extends sys.path for the intra-reference imports.
"""
from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types

REF = "/root/reference"
_PATHS = [f"{REF}/qa", f"{REF}/retrieval"]


def load_reference_module(subdir: str, modname: str):
    """Load /root/reference/<subdir>/<modname>.py under a private key."""
    if "faiss" not in sys.modules:
        stub = types.ModuleType("faiss")
        # transformers probes importlib.util.find_spec("faiss"), which raises
        # on a spec-less stub module
        stub.__spec__ = importlib.machinery.ModuleSpec("faiss", loader=None)
        sys.modules["faiss"] = stub
    # the reference pins transformers 2.5.1 whose AdamW was removed from the
    # installed 4.x; shim the NAME so `from transformers import AdamW` at
    # reference import time resolves (train_retrieve_qa.py:14). Tests that
    # execute optimizer math use torch.optim.AdamW explicitly and document
    # the 2.5.1 eps-placement divergence (docs/MIGRATION.md).
    # CAREFUL: transformers 4.x is a lazy module whose first attribute
    # resolution REPLACES sys.modules["transformers"], dropping injected
    # attributes — materialize the names the reference pulls first, then
    # shim AdamW onto the (now stable) final module object.
    from transformers import (  # noqa: F401  (forces lazy materialization)
        BertConfig,
        BertModel,
        BertPreTrainedModel,
        BertTokenizer,
    )

    if not hasattr(sys.modules["transformers"], "AdamW"):
        import torch

        sys.modules["transformers"].AdamW = torch.optim.AdamW
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
