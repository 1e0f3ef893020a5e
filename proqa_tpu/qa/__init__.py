"""Online-retrieval QA data path: batched sampler, offline datasets, prepro."""

from proqa_tpu.qa.sampler import OnlineSampler, OnlineSamplerConfig
from proqa_tpu.qa.prepro import hash_question, match_question_paras, process_ground_paras
from proqa_tpu.qa.offline_data import (
    OpenQADataset,
    load_mrqa_dataset,
    load_topk_retrieval,
    tokenize_openqa_file,
    tokenize_openqa_item,
    tokenize_qa_item,
)

__all__ = [
    "OnlineSampler",
    "OnlineSamplerConfig",
    "OpenQADataset",
    "hash_question",
    "load_mrqa_dataset",
    "load_topk_retrieval",
    "match_question_paras",
    "process_ground_paras",
    "tokenize_openqa_file",
    "tokenize_openqa_item",
    "tokenize_qa_item",
]
