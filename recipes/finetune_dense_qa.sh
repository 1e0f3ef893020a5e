#!/usr/bin/env bash
# Joint dense-QA finetuning (reference train_dense_qa.sh: k=5 paragraphs per
# question, frozen paragraph encoder, shared-norm span loss, regex for trec).
proqa match-paras --retrieved runs/top10000_train.jsonl \
  --raw-data data/nq-train.jsonl --output runs/nq_train_matched.jsonl \
  --db data/nq_paras.db --topk 10000
proqa finetune-qa --vocab data/vocab.txt \
  --train-file data/nq-train.jsonl --predict-file data/nq-dev.jsonl \
  --db data/nq_paras.db --index runs/index \
  --matched-para-path runs/nq_train_matched.jsonl \
  --retriever-path runs/retriever_cluster/checkpoint_best.msgpack \
  --train-batch-size 5 --questions-per-batch 4 --candidates 5000 \
  --fix-para-encoder --shared-norm --eval-period 1000 \
  --output-dir runs/qa
