#!/usr/bin/env python3
"""Generate a synthetic corpus rich enough to sustain >=2000 BPE
merges (the sf0.001 documents corpus exhausts at 89 — its synthetic
vocabulary is tiny), then train the reference merge table on it with
tools/gen_bpe_merges.py's exact procedure.

Emits two committed test resources:
  src/test/resources/graft/bpe_synth_corpus.txt   one document per line
  src/test/resources/graft/bpe_merges_synth.txt   merges.txt fixture

BpeSpec reads the corpus resource into a DataFrame and pins
TextAnalysis.trainBpe merge-for-merge against the fixture at
nMerges >= 2000 — proving the incremental trainer's real-vocab
headroom against an independent implementation.

Determinism: fixed seed; corpus content is then frozen by the
committed resource file, so cross-language RNG parity is not needed.

Usage: gen_bpe_synth.py [n_merges=2400]
"""
import os
import random
import subprocess
import sys

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
RES = os.path.join(HERE, "..", "src", "test", "resources", "graft")


def main():
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 2400
    rng = random.Random(20260813)
    letters = "abcdefghijklmnopqrstuvwxyz"
    # ~1800 distinct words, each appearing >=2 times so every within-word
    # adjacent pair is learnable (count >= 2); Zipf-ish head so the merge
    # order exercises real frequency ties.
    vocab = set()
    while len(vocab) < 1800:
        n = rng.randint(6, 12)
        vocab.add("".join(rng.choice(letters) for _ in range(n)))
    words = []
    for i, w in enumerate(sorted(vocab)):
        f = 2 + (40 // (1 + i % 97))  # 2..42, deterministic spread
        words.extend([w] * f)
    rng.shuffle(words)
    docs, per = [], max(1, len(words) // 120)
    for i in range(0, len(words), per):
        docs.append(" ".join(words[i:i + per]))

    os.makedirs(RES, exist_ok=True)
    corpus_path = os.path.join(RES, "bpe_synth_corpus.txt")
    with open(corpus_path, "w") as f:
        f.write("\n".join(docs) + "\n")

    pq = "/tmp/bpe_synth.parquet"
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", list(enumerate(docs)))
    con.execute(f"COPY d TO '{pq}' (FORMAT PARQUET)")

    out = os.path.join(RES, "bpe_merges_synth.txt")
    subprocess.check_call([sys.executable,
                           os.path.join(HERE, "gen_bpe_merges.py"),
                           pq, out, str(n_merges)])
    got = sum(1 for l in open(out) if l.strip() and not l.startswith("#"))
    print(f"corpus: {len(docs)} docs, {len(words)} word instances, "
          f"{len(vocab)} distinct; merges learned: {got}")
    assert got >= 2000, f"corpus too small for 2000 merges (got {got})"


if __name__ == "__main__":
    main()
