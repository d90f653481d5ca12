#!/usr/bin/env python3
"""Train a small BPE merge table on a documents.parquet corpus and
write it in the public GPT-2 merges.txt format (one "a b" pair per
line, rank = line order, '#'-prefixed header).

Usage: gen_bpe_merges.py <documents.parquet> <out_merges.txt> [n_merges]

Training is the textbook BPE procedure (Sennrich et al. 2016): words
are the whitespace tokens of the normalized text, each starts as a
sequence of single characters, and each round merges the globally
most frequent adjacent symbol pair (ties broken lexicographically for
determinism). No end-of-word marker — the engine counts tokens, it
does not need to reconstruct word boundaries.
"""
import re
import sys
from collections import Counter

import duckdb


def normalize(t: str) -> str:
    return re.sub(r"\s+", " ", t.strip().lower())


def train(word_freq: Counter, n_merges: int):
    seqs = {w: tuple(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, seq in seqs.items():
            f = word_freq[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += f
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for w, seq in seqs.items():
            if a not in seq:
                continue
            out, i = [], 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def main():
    src, out = sys.argv[1], sys.argv[2]
    n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    rows = duckdb.sql(f"SELECT text FROM '{src}'").fetchall()
    wf = Counter()
    for (text,) in rows:
        for w in normalize(text).split(" "):
            if w:
                wf[w] += 1
    merges = train(wf, n_merges)
    with open(out, "w") as f:
        f.write("#version: graft-bpe-v1\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {len(merges)} merges to {out}")


if __name__ == "__main__":
    main()
