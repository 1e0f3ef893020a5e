"""Root-cause diagnostic for test_cli_serve_http's live-/add self-retrieval
failure (VERDICT r3 weak #1): after /add, searching with the new row's own
STORED embedding returned p23, not live0.

Two hypotheses (judge's framing):
  (a) a real add/search regression — the new row is lost/misplaced/zeroed;
  (b) an unsound invariant — IP self-retrieval is NOT guaranteed under
      un-normalized inner product + bf16 storage.

This script rebuilds the exact test world, performs the add, and checks:
  1. stored row == freshly-encoded embedding (bf16-quantized)?  -> add OK
  2. exact f32 scores of <e, corpus_j> for all j: does any row beat <e, e>?
     If yes with a correctly-stored row, hypothesis (b) holds.
  3. rebuilt-from-scratch index search == live index search (the sound
     contract used in tests/test_index_updates.py)?
"""
import json
import os
import sys
import tempfile

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from proqa_tpu.cli.main import _qa_setup, build_parser, main
from proqa_tpu.data.docdb import DocDB
from proqa_tpu.serving import IndexUpdater

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [f"tok{i}" for i in range(60)] + [
    "what", "is", "about",
]

root = tempfile.mkdtemp(prefix="diag_serve_")
root = os.path.abspath(root)
print("world:", root)
with open(f"{root}/vocab.txt", "w") as f:
    f.write("\n".join(VOCAB) + "\n")
with open(f"{root}/pairs.jsonl", "w") as f:
    for i in range(30):
        pid = i // 3
        f.write(json.dumps({
            "Question": f"what is about tok{pid} variant {i % 3}",
            "Paragraph": " ".join([f"tok{(pid + j) % 60}" for j in range(25)]),
            "Answer": f"tok{pid + 10}",
        }) + "\n")
paras = [(f"p{i}", " ".join([f"tok{(i + j) % 60}" for j in range(20)])) for i in range(40)]
DocDB.create(f"{root}/docs.db", paras).close()
with open(f"{root}/corpus.jsonl", "w") as f:
    for pid, text in paras:
        f.write(json.dumps({"text": text, "id": pid}) + "\n")

common = ["--vocab", f"{root}/vocab.txt", "--tiny",
          "--max-seq-length", "64", "--max-query-length", "12"]
main(["pretrain-retriever", *common,
      "--train-file", f"{root}/pairs.jsonl",
      "--predict-file", f"{root}/pairs.jsonl",
      "--output-dir", f"{root}/retriever_run",
      "--train-batch-size", "8", "--predict-batch-size", "8",
      "--num-train-epochs", "1", "--eval-period", "2",
      "--save-checkpoints-steps", "100", "--learning-rate", "1e-3", "--filter"])
main(["build-index", *common,
      "--corpus", f"{root}/corpus.jsonl",
      "--init-checkpoint", f"{root}/retriever_run/checkpoint_last.msgpack",
      "--output-dir", f"{root}/index", "--predict-batch-size", "8"])

args = build_parser().parse_args([
    "serve", *common,
    "--db", f"{root}/docs.db",
    "--index", f"{root}/index",
    "--retriever-path", f"{root}/retriever_run/checkpoint_last.msgpack",
    "--train-batch-size", "2", "--candidates", "8", "--eval-k", "2",
    "--output-dir", f"{root}/qa_http", "--topn", "2",
])
trainer, make_sampler = _qa_setup(args)
probe = make_sampler([])
updater = IndexUpdater(trainer, probe.tokenizer, probe.db, probe.index,
                       max_seq_length=64)
idx = updater.index
new_text = "tok50 tok51 tok52 tok53 tok54"
fresh = updater._encode_texts([new_text])  # what add() will store
updater.add([{"id": "live0", "text": new_text}])

stored = np.asarray(idx.take([idx.n - 1]), np.float32)
print("1) stored == fresh encode (post-bf16)?",
      np.array_equal(stored, np.asarray(
          np.asarray(fresh, np.float32).astype(idx.embeddings.dtype), np.float32)
          if hasattr(idx.embeddings, "dtype") else fresh))
import jax.numpy as jnp
fresh_q = np.asarray(jnp.asarray(fresh).astype(idx.embeddings.dtype), np.float32)
print("   max |stored - fresh(bf16)|:", np.abs(stored - fresh_q).max())

# 2) exact f32 score landscape with the stored embedding as the query
corpus = np.asarray(jnp.asarray(idx.embeddings[: idx.n], jnp.float32))
scores = corpus @ stored[0]
order = np.argsort(-scores)
self_row = idx.n - 1
print("2) self score:", scores[self_row], " best row:", order[0],
      "(", idx.id_map[int(order[0])], ") score:", scores[order[0]])
print("   self rank:", int(np.where(order == self_row)[0][0]),
      " norms: self", np.linalg.norm(stored), " best",
      np.linalg.norm(corpus[order[0]]))
print("   top5:", [(int(r), idx.id_map[int(r)], float(scores[r])) for r in order[:5]])

# 3) sound contract: live search == rebuilt search
from proqa_tpu.index.dense import DenseIndex
from proqa_tpu.index.idmap import IdMap
rebuilt = DenseIndex.from_embeddings(
    corpus, IdMap([idx.id_map[i] for i in range(idx.n)]),
    dtype=idx.embeddings.dtype)
v1, i1 = idx.search(stored, 5)
v2, i2 = rebuilt.search(stored, 5)
print("3) live search == rebuilt search:",
      np.array_equal(v1, v2) and np.array_equal(i1, i2))
print("   live:", i1[0], v1[0])
print("   rebuilt:", i2[0], v2[0])
