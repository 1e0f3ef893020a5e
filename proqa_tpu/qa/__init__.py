"""Online-retrieval QA data path: batched sampler and offline prepro."""

from proqa_tpu.qa.sampler import OnlineSampler, OnlineSamplerConfig

__all__ = ["OnlineSampler", "OnlineSamplerConfig"]
