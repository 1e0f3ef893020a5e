"""proqa_tpu — a TPU-native dense-retrieval open-domain QA framework.

A from-scratch rebuild of the capabilities of xwhan/ProQA (dense-corpus-index
open QA: contrastive bi-encoder pretraining, corpus indexing, exact/IVF MIPS
retrieval, joint retriever+reader finetuning) designed TPU-first:

* compute path: JAX/XLA with Pallas kernels for fused MIPS top-k,
* scaling: `jax.sharding.Mesh` + shard_map over ICI (data-parallel training,
  corpus-sharded retrieval with cross-chip top-k merge),
* precision: bfloat16 activations / fp32 master params,
* host path: static-shape data pipeline + C++ wordpiece tokenizer.

Layout:
  text/      tokenizers, span machinery, answer metrics (host, pure python/C++)
  models/    pure-JAX BERT, bi-encoder retriever, retrieve+read QA model
  ops/       Pallas kernels: fused MIPS top-k, on-device k-means
  index/     HBM-resident sharded dense index (exact + IVF search)
  parallel/  mesh helpers, sharded search, collective utilities
  data/      sqlite DocDB, datasets, samplers, static-shape collation
  qa/        batched online retrieval sampler and QA prepro
  train/     optimizer, checkpointing, train/eval loops
  cli/       entry points
"""

__version__ = "0.1.0"
