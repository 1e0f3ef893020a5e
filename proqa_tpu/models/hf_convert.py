"""Convert HuggingFace/torch BERT checkpoints into proqa_tpu param pytrees.

All reference recipes start from pretrained `bert-base-uncased`
(/root/reference/retrieval/retriever.py:16-17) and its released retriever
checkpoints are torch state dicts of `BertForRetriever` (optionally with a DDP
`module.` prefix, stripped like /root/reference/qa/utils.py:69-74). This is a
one-off host-side conversion: no torch is needed on the TPU path.
"""
from __future__ import annotations

from typing import Callable, Mapping

import numpy as np

from proqa_tpu.models.bert import BertConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def strip_ddp_prefix(state: Mapping[str, object]) -> dict:
    return {(k[7:] if k.startswith("module.") else k): v for k, v in state.items()}


def bert_params_from_state_dict(
    state: Mapping[str, object], cfg: BertConfig, prefix: str = ""
) -> dict:
    """HF `BertModel` state dict -> stacked-layer param pytree.

    torch Linear stores weight as [out, in]; our kernels are [in, out].
    """

    def g(name: str) -> np.ndarray:
        return _np(state[prefix + name])

    def stack(fmt: str, transpose: bool = False) -> np.ndarray:
        mats = [g(fmt.format(i)) for i in range(cfg.num_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats)

    def stacked_dense(base: str) -> dict:
        return {
            "kernel": stack(base + ".weight", transpose=True),
            "bias": stack(base + ".bias"),
        }

    layers = {
        "q": stacked_dense("encoder.layer.{0}.attention.self.query"),
        "k": stacked_dense("encoder.layer.{0}.attention.self.key"),
        "v": stacked_dense("encoder.layer.{0}.attention.self.value"),
        "attn_out": stacked_dense("encoder.layer.{0}.attention.output.dense"),
        "attn_ln": {
            "scale": stack("encoder.layer.{0}.attention.output.LayerNorm.weight"),
            "bias": stack("encoder.layer.{0}.attention.output.LayerNorm.bias"),
        },
        "mlp_in": stacked_dense("encoder.layer.{0}.intermediate.dense"),
        "mlp_out": stacked_dense("encoder.layer.{0}.output.dense"),
        "mlp_ln": {
            "scale": stack("encoder.layer.{0}.output.LayerNorm.weight"),
            "bias": stack("encoder.layer.{0}.output.LayerNorm.bias"),
        },
    }
    return {
        "embeddings": {
            "word": g("embeddings.word_embeddings.weight"),
            "position": g("embeddings.position_embeddings.weight"),
            "token_type": g("embeddings.token_type_embeddings.weight"),
            "ln": {
                "scale": g("embeddings.LayerNorm.weight"),
                "bias": g("embeddings.LayerNorm.bias"),
            },
        },
        "layers": layers,
        "pooler": {
            "kernel": g("pooler.dense.weight").T,
            "bias": g("pooler.dense.bias"),
        },
    }


def retriever_params_from_state_dict(state: Mapping[str, object], cfg: BertConfig) -> dict:
    """Reference `BertForRetriever` torch state dict -> retriever pytree."""
    state = strip_ddp_prefix(state)
    return {
        "bert_q": bert_params_from_state_dict(state, cfg, prefix="bert_q."),
        "bert_c": bert_params_from_state_dict(state, cfg, prefix="bert_c."),
        "proj_q": {"kernel": _np(state["proj_q.weight"]).T, "bias": _np(state["proj_q.bias"])},
        "proj_c": {"kernel": _np(state["proj_c.weight"]).T, "bias": _np(state["proj_c.bias"])},
    }


def load_torch_checkpoint(path: str, *, allow_pickle: bool = False) -> dict:
    """Load a torch .pt state dict on CPU (host-side only).

    `weights_only=True` refuses to execute pickled code — plain state dicts
    (the released checkpoints) need none. A silent fallback to full unpickling
    would nullify that protection exactly on the inputs it exists for, so the
    unsafe path requires an explicit opt-in (CLI: --allow-pickle)."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise
        import warnings

        warnings.warn(
            f"{path}: weights-only load failed; falling back to full "
            "unpickling (--allow-pickle). Only do this for trusted files.",
            stacklevel=2,
        )
        return torch.load(path, map_location="cpu")
