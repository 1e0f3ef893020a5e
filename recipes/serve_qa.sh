#!/usr/bin/env bash
# Warm QA serving over a finetuned joint model (no reference analogue — the
# reference has no inference entry point; SURVEY.md §1 "no service/serving
# layer"). The model, the device-resident index, and every compiled dispatch
# stay warm across requests.
proqa serve --vocab data/vocab.txt \
  --db data/nq_paras.db --index runs/index \
  --init-checkpoint runs/qa/best-model.msgpack \
  --train-batch-size 5 --candidates 5000 --eval-k 5 \
  --fix-para-encoder --shared-norm \
  --output-dir runs/qa_serve \
  --port 8080 --warmup "who wrote the iliad" &

# one-shot / batch inference without the HTTP server:
#   proqa answer ... --question "who wrote the iliad" --topn 3
#   proqa answer ... --predict-file questions.jsonl
#   ... | proqa answer ... --stdin     # warm loop, one JSON line per question
