#!/usr/bin/env bash
# Phase 2: progressive (cluster-batched) pretraining, continuing from phase 1
# (reference train_retriever_cluster.sh). First build the shards:
#   proqa build-index ... --corpus data/retrieve_train.jsonl \
#       --init-checkpoint runs/retriever_single/checkpoint_last.msgpack \
#       --output-dir runs/pair_embeds
#   (pair files encode their Paragraph field directly — one embedding per
#   pair line, aligned with the shard writer, like the reference's
#   train_para_embed.npy)
#   proqa cluster-corpus --embeddings runs/pair_embeds/embeddings.npy \
#       --pairs data/retrieve_train.jsonl --output-dir data/data_splits \
#       --ncentroids 10000 --niter 250 --max-points-per-centroid 1000
proqa pretrain-retriever \
  --vocab data/vocab.txt \
  --train-file data/data_splits \
  --predict-file data/retrieve_dev.jsonl \
  --train-batch-size 640 --accumulate-gradients 8 \
  --learning-rate 1e-5 --seed 87 --filter \
  --init-checkpoint runs/retriever_single/checkpoint_last.msgpack \
  --output-dir runs/retriever_cluster
