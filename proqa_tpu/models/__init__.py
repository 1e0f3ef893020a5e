"""Models: pure-JAX BERT encoder, bi-encoder retriever, retrieve+read QA model."""

from proqa_tpu.models.bert import BertConfig, bert_encoder, init_bert_params
from proqa_tpu.models.retriever import (
    RetrieverParams,
    encode_context,
    encode_query,
    init_retriever_params,
    retriever_forward,
)

__all__ = [
    "BertConfig",
    "RetrieverParams",
    "bert_encoder",
    "encode_context",
    "encode_query",
    "init_bert_params",
    "init_retriever_params",
    "retriever_forward",
]
