#!/usr/bin/env bash
# Encode the paragraph corpus + eval queries, then recall@k
# (reference get_para_embed.sh + eval_retrieval.py; batch 300 para / 512 query).
proqa build-index --vocab data/vocab.txt \
  --corpus data/nq_paras.jsonl \
  --init-checkpoint runs/retriever_cluster/checkpoint_best.msgpack \
  --predict-batch-size 512 --output-dir runs/index
proqa encode-queries --vocab data/vocab.txt \
  --queries data/wq-test.jsonl \
  --init-checkpoint runs/retriever_cluster/checkpoint_best.msgpack \
  --predict-batch-size 512 --output runs/wq_test_q.npy
proqa eval-retrieval data/wq-test.jsonl runs/index runs/wq_test_q.npy data/nq_paras.db --topk 80
