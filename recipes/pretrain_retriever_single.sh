#!/usr/bin/env bash
# Phase 1: single-file contrastive pretraining.
# Hyperparameters mirror the reference recipe (train_retriever_single.sh:
# effective batch 640 = 80 x accumulate 8, lr 1e-5, seed 87, filter on).
proqa pretrain-retriever \
  --vocab data/vocab.txt \
  --train-file data/retrieve_train.jsonl \
  --predict-file data/retrieve_dev.jsonl \
  --train-batch-size 640 --accumulate-gradients 8 \
  --learning-rate 1e-5 --seed 87 --filter \
  --eval-period 2500 --save-checkpoints-steps 20000 \
  --output-dir runs/retriever_single
