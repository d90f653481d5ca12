#!/usr/bin/env python3
"""Single-node pandas baseline for BASELINE.md.

Re-creates the reference pipeline's core operations
(Cabe22/weather-data-pipeline src/data_processing/data_processor.py,
dashboard.py) with the same pandas idioms the reference uses
(groupby().shift(), rolling(), drop_duplicates(), describe-style aggs),
over the SAME test tables graft's Bench reads, so the two engines'
wall-clock is directly comparable at equal scale factor.

Usage: python3 tools/baseline_pandas.py [sf_dir]
Prints one JSON line: {"queries": {name: sec}, "total": sec, "sf": dir}
"""
import json
import sys
import time

import numpy as np
import pandas as pd


def load_events(sf_dir):
    df = pd.read_parquet(f"{sf_dir}/events.parquet")
    df["ts"] = pd.to_datetime(df["ts"])
    return df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)


def feature_pipeline(df):
    # data_processor.py:55-118,151,246-261 — time + cyclical + lag +
    # rolling + diff + lead target, per entity (city≈user_id)
    out = df[["event_id", "user_id", "value"]].copy()
    h = df["ts"].dt.hour
    out["hour"] = h
    out["day_of_week"] = df["ts"].dt.dayofweek
    out["hour_sin"] = np.sin(2 * np.pi * h / 24)
    out["hour_cos"] = np.cos(2 * np.pi * h / 24)
    g = df.groupby("user_id")["value"]
    out["value_lag_1"] = g.shift(1)
    out["value_lag_24"] = g.shift(24)
    out["rolling_mean_24"] = g.rolling(24, min_periods=1).mean().reset_index(level=0, drop=True)
    out["rolling_std_24"] = g.rolling(24, min_periods=2).std().reset_index(level=0, drop=True)
    out["value_change"] = g.diff()
    future = g.shift(-24)
    out["value_future"] = future
    change = future - df["value"]
    out["change_category"] = pd.cut(change, bins=[-np.inf, -2, 2, np.inf],
                                    labels=["Decrease", "Stable", "Increase"])
    return out


def dedup_key(df):
    # weather_collector.py INSERT-dedup on (city, timestamp)
    return df.drop_duplicates(subset=["user_id", "ts"], keep="first")


def distinct_daily(df):
    # dashboard nunique-at-scale: per-(day, type) distinct users — the
    # exact layer graft's daily HLL sketch is checked against
    # (q_distinct_sketch_check)
    return df.groupby([df["ts"].dt.date, "event_type"]).agg(
        exact_users=("user_id", "nunique"), n_events=("user_id", "size"))


def metrics(df):
    # dashboard.py:160-176 key metrics
    return {
        "avg": df["value"].mean(), "max": df["value"].max(),
        "min": df["value"].min(), "n": len(df),
        "entities": df["user_id"].nunique(), "latest": df["ts"].max(),
    }


def latest_per_key(df):
    # dashboard.py:163,292 latest row per city
    return df.loc[df.groupby("user_id")["ts"].idxmax()]


def corr_matrix(df):
    # dashboard.py:178-207 correlation matrix over engineered measures
    w = pd.DataFrame({
        "temperature": df["value"],
        "humidity": df["props"].str.extract(r'"k":\s*([0-9.+-eE]+)')[0].astype(float),
        "wind_speed": (df["event_id"] % 30).astype(float) + 0.5,
    })
    return w.corr()


def group_compare(df):
    # dashboard.py:233-280 per-city means
    return df.groupby("user_id")["value"].agg(["mean", "min", "max", "count"])


def standard_scale(df):
    # data_processor.py:228-244 StandardScaler parity (population std)
    v = df["value"]
    return (v - v.mean()) / v.std(ddof=0)


def interpolate(df):
    # data_processor.py:186-190 linear interpolation per entity
    masked = df["value"].where(df["event_id"] % 7 != 0)
    return masked.groupby(df["user_id"]).transform(lambda s: s.interpolate())


def dedup_exact_docs(docs):
    # exact text dedup on the documents corpus (normalized-text hash)
    norm = docs["text"].str.lower().str.split().str.join(" ")
    return docs.loc[norm.groupby(norm).head(1).index]


EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# explicit captured ASCII boundaries, not \b (Python's \b is
# Unicode-aware like Java's; RE2's is ASCII — see TextAnalysis.ipPat)
IPV4 = r"(^|[^0-9A-Za-z_])[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}([^0-9A-Za-z_]|$)"
PHONE = r"\+[0-9][0-9()\- ]{6,16}[0-9]([^0-9A-Za-z_]|$)|\(?[0-9]{3}\)?[\- ][0-9]{3}[\- ][0-9]{4}"


def redact_pii(docs):
    # PII scrub with the same patterns/ordering as TextAnalysis.redactPii
    # (unmatched replacement group refs are '' in Python re >= 3.5,
    # matching Java and RE2)
    t = docs["text"]
    n_e = t.str.count(EMAIL)
    a = t.str.replace(EMAIL, "<EMAIL>", regex=True)
    # two IP passes: the consumed trailing boundary is the next
    # adjacent IP's leading boundary (see TextAnalysis.redactPii)
    b1 = a.str.replace(IPV4, r"\1<IP>\2", regex=True)
    n_i = a.str.count(IPV4) + b1.str.count(IPV4)
    b = b1.str.replace(IPV4, r"\1<IP>\2", regex=True)
    n_p = b.str.count(PHONE)
    c = b.str.replace(PHONE, "<PHONE>\\1", regex=True)
    return pd.DataFrame({"doc_id": docs["doc_id"], "n_emails": n_e,
                         "n_ips": n_i, "n_phones": n_p, "text_redacted": c})


def quality_filter(docs):
    # Gopher-style rule flags, same rules as TextAnalysis.qualityFilter
    norm = docs["text"].str.lower().str.split().str.join(" ")
    toks = norm.str.split(" ")
    n_tok = toks.str.len().astype(float)
    mean_wl = (norm.str.len() - (n_tok - 1)) / n_tok.clip(lower=1.0)
    punct = docs["text"].str.count(r"[^a-zA-Z0-9\s]") / \
        docs["text"].str.len().clip(lower=1).astype(float)
    stop = toks.apply(lambda ts: any(t in ("the", "a", "of", "and", "is", "in", "to")
                                     for t in ts))
    keep = (n_tok.between(20, 100000) & mean_wl.between(3.0, 10.0)
            & (punct <= 0.2) & stop)
    return pd.DataFrame({"doc_id": docs["doc_id"], "n_tokens": n_tok, "keep": keep})


def stratified_sample(docs):
    # per-source quota sample with the same Knuth salt
    salt = ((docs["doc_id"] % 2147483648) * 2654435761) % 4294967296
    return docs.assign(salt=salt).sort_values(["source", "salt", "doc_id"]) \
        .groupby("source").head(10)


# ==== round-4 LLM-data operators (same semantics as the graft queries,
# idiomatic pandas/numpy forms for honest single-node comparison) ====

import hashlib
import re as _re

_TAG = r"<[^>]*>"
_ENTPAT = r"&(?:amp|lt|gt|quot|nbsp|#39);"
_ENTS = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
         ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def strip_markup(docs):
    no_tags = docs["text"].str.replace(_TAG, " ", regex=True)
    out = pd.DataFrame({
        "doc_id": docs["doc_id"],
        "n_tags": docs["text"].str.count(_TAG),
        "n_entities": no_tags.str.count(_ENTPAT),
    })
    t = no_tags
    for e, r in _ENTS:
        t = t.str.replace(e, r, regex=False)
    out["text_clean"] = t.str.replace(r"\s+", " ", regex=True).str.strip()
    return out


def _content_hash(text):
    norm = text.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
    return norm.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def dedup_incremental(docs):
    h = _content_hash(docs["text"])
    d = docs.assign(h=h)
    batch = d[d["doc_id"] % 2 == 1]
    corpus_hashes = set(d.loc[d["doc_id"] % 2 == 0, "h"])
    survivors = batch[~batch["h"].isin(corpus_hashes)]
    return survivors.groupby("h").agg(
        keep_id=("doc_id", "min"), n=("doc_id", "size")).reset_index()


def assign_ids(docs):
    out = docs[["doc_id", "source"]].sort_values("doc_id").reset_index(drop=True)
    out["global_id"] = np.arange(len(out), dtype=np.int64)
    return out


def dedup_lines(docs):
    lines = docs[["doc_id"]].assign(line=docs["text"].str.split("\n")).explode("line")
    nonblank = lines[lines["line"].str.strip() != ""]
    df_counts = nonblank.groupby("line")["doc_id"].nunique()
    frequent = set(df_counts[df_counts > 2].index)
    kept = lines[~lines["line"].isin(frequent)]
    return kept.groupby("doc_id")["line"].apply("\n".join).reset_index()


def token_entropy(docs):
    toks = docs[["doc_id"]].assign(
        token=docs["text"].str.lower().str.strip()
        .str.replace(r"\s+", " ", regex=True).str.split(" ")).explode("token")
    tc = toks.groupby(["doc_id", "token"]).size().rename("c").reset_index()
    g = tc.groupby("doc_id")["c"]
    n = g.sum()
    clogc = tc.assign(x=tc["c"] * np.log2(tc["c"])).groupby("doc_id")["x"].sum()
    return pd.DataFrame({"n_tokens": n, "entropy": np.log2(n) - clogc / n})


def url_stats(docs):
    injected = docs["text"] + " https://www.src" + \
        (docs["doc_id"] % 7).astype(str) + ".example.com/doc/" + docs["doc_id"].astype(str)
    hosts = injected.str.extractall(
        r"https?://([A-Za-z0-9.-]+)(?::[0-9]+)?(?:/[^\s]*)?")[0]
    dom = hosts.str.lower().str.replace(r"^www\.", "", regex=True)
    d = dom.reset_index(level=0).rename(columns={"level_0": "row", 0: "domain"})
    d["doc_id"] = docs["doc_id"].iloc[d["row"]].values
    return d.groupby("domain").agg(
        n_urls=("doc_id", "size"), n_docs=("doc_id", "nunique")).reset_index()


def chunk_docs(docs, size=64, overlap=16):
    stride = size - overlap
    toks = docs["text"].str.lower().str.strip() \
        .str.replace(r"\s+", " ", regex=True).str.split(" ")
    rows = []
    for doc_id, t in zip(docs["doc_id"], toks):
        n = len(t)
        n_chunks = 1 + max(0, -(-(max(0, n - size)) // stride))
        for k in range(n_chunks):
            rows.append((doc_id, k, " ".join(t[k * stride:k * stride + size])))
    return pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "chunk_text"])


def corpus_stats(docs):
    norm = docs["text"].str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
    n_tok = norm.str.split(" ").str.len()
    h = _content_hash(docs["text"])
    d = docs.assign(n_tok=n_tok, h=h)
    return d.groupby("source").agg(
        n_docs=("doc_id", "size"), n_tokens=("n_tok", "sum"),
        avg_tokens=("n_tok", "mean"), n_distinct=("h", "nunique")).reset_index()


def tfidf_topk(docs, k=5):
    # graft q_tfidf_topk: smooth-idf per-doc top-k keywords, ranked on
    # the 6dp-rounded score
    ex = docs[["doc_id"]].assign(token=_norm_tokens(docs)).explode("token")
    ex = ex[ex["token"] != ""]
    tf = ex.groupby(["doc_id", "token"]).size().rename("n_tf").reset_index()
    dfreq = tf.groupby("token").size()
    n_docs = len(docs)
    tf["n_df"] = tf["token"].map(dfreq)
    tf["tfidf"] = np.round(
        tf["n_tf"] * (np.log((n_docs + 1) / (tf["n_df"] + 1.0)) + 1) + 1e-9, 6)
    tf = tf.sort_values(["doc_id", "tfidf", "token"],
                        ascending=[True, False, True])
    tf["term_rank"] = tf.groupby("doc_id").cumcount() + 1
    return tf[tf["term_rank"] <= k]


def url_dedup(docs):
    # graft q_url_dedup: the injected-collision view + canonicalization
    # + keep-best per canonical URL (longest text, lowest doc_id)
    did = docs["doc_id"]
    m2 = ((did % 2 + 2) % 2).astype(str)
    m3 = (did % 3 + 3) % 3
    m5 = ((did % 5 + 5) % 5).astype(str)
    url = ("HTTPS://WWW.Src" + m3.astype(str) + ".Example.COM"
           + np.where((did % 2 + 2) % 2 == 0, ":443", "")
           + "/Doc/" + m5 + np.where(m3 == 0, "/", "")
           + np.where((did % 2 + 2) % 2 == 0,
                      "?b=2&utm_source=u" + did.astype(str) + "&a=1&id=" + m2,
                      "?a=1&id=" + m2 + "&b=2&gclid=g" + did.astype(str))
           + "#sec" + did.astype(str))
    nf = url.str.replace(r"#.*$", "", regex=True)
    scheme = nf.str.extract(r"^([A-Za-z][A-Za-z0-9+.-]*)://")[0].str.lower()
    auth = nf.str.extract(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)")[0].str.lower()
    noport = pd.Series(np.where(
        scheme == "https", auth.str.replace(r":443$", "", regex=True),
        np.where(scheme == "http", auth.str.replace(r":80$", "", regex=True),
                 auth)), index=docs.index)
    host = noport.str.replace(r"^www\.", "", regex=True)
    path = nf.str.extract(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)")[0] \
        .str.replace(r"/+$", "", regex=True)
    q = nf.str.extract(r"\?(.*)$")[0].fillna("")
    track = _re.compile(r"^(utm_[^=]*|fbclid|gclid|msclkid|igshid|ref)=")
    kept = q.str.split("&").apply(
        lambda ps: "&".join(sorted(p for p in ps if p and not track.match(p))))
    canon = scheme + "://" + host + path + np.where(kept == "", "", "?" + kept)
    d = docs.assign(url_canon=canon).sort_values(
        ["url_canon", "n_chars", "doc_id"], ascending=[True, False, True])
    d["n_dupes"] = d.groupby("url_canon")["doc_id"].transform("size")
    return d.drop_duplicates("url_canon", keep="first")[
        ["doc_id", "url_canon", "n_dupes"]]


def heavy_hitters_check(docs, k=64):
    # graft q_heavy_hitters_check: Misra-Gries summary + exact heavy
    # set + bound booleans (single partition: the stream is one pass)
    ex = docs[["doc_id"]].assign(token=_norm_tokens(docs)).explode("token")
    toks = ex["token"][ex["token"] != ""]
    mg = {}
    for t in toks:
        if t in mg:
            mg[t] += 1
        elif len(mg) < k:
            mg[t] = 1
        else:
            for key in list(mg):
                if mg[key] == 1:
                    del mg[key]
                else:
                    mg[key] -= 1
    exact = toks.value_counts()
    n = len(toks)
    heavy = exact[exact > 2.0 * n / (k + 1)]
    est = heavy.index.map(lambda t: mg.get(t))
    found = ~pd.isna(est)
    in_bound = found & (pd.Series(est, index=heavy.index).fillna(-1)
                        <= heavy) & (heavy - pd.Series(est, index=heavy.index)
                                     .fillna(-1) <= n / (k + 1.0))
    return pd.DataFrame({"token": heavy.index, "n_exact": heavy.values,
                         "found": found, "est_in_bound": in_bound.values})


def shard_plan(docs, per_shard=2048):
    # graft q_shard_plan: token-balanced contiguous shard assignment
    n_tok = _norm_tokens(docs).str.len()
    d = docs[["doc_id"]].assign(n_tokens=n_tok).sort_values("doc_id")
    cum_before = d["n_tokens"].cumsum() - d["n_tokens"]
    return d.assign(shard=cum_before // per_shard)


def vocab_drift(docs, top_n=50):
    # graft q_vocab_drift: smoothed unigram drift over the q_corpus_diff
    # synthetic version pair
    old = docs[docs["doc_id"] % 13 != 0]
    new = docs[docs["doc_id"] % 19 != 0].copy()
    rev = new["doc_id"] % 17 == 0
    new.loc[rev, "text"] = new.loc[rev, "text"] + " revised"

    def counts(d):
        ex = d.assign(token=_norm_tokens(d)).explode("token")
        return ex["token"][ex["token"] != ""].value_counts()
    no, nn = counts(old), counts(new)
    merged = pd.concat([no.rename("n_old"), nn.rename("n_new")], axis=1).fillna(0)
    v = len(merged)
    p_old = (merged["n_old"] + 1) / (merged["n_old"].sum() + v)
    p_new = (merged["n_new"] + 1) / (merged["n_new"].sum() + v)
    out = merged.assign(
        p_old_permil=np.round(p_old * 1e3 + 1e-9, 6),
        p_new_permil=np.round(p_new * 1e3 + 1e-9, 6),
        abs_dp_permil=np.round(np.abs(p_new - p_old) * 1e3 + 1e-9, 6),
        kl_term_permil=np.round(p_new * np.log(p_new / p_old) * 1e3 + 1e-9, 6))
    # (abs_dp_permil DESC, token ASC) — the token tiebreak matches the
    # Spark operator and DuckDB oracle's pinned ordering; without it
    # rows tied exactly at the top_n boundary select nondeterministically
    return (out.reset_index(names="token")
            .sort_values(["abs_dp_permil", "token"], ascending=[False, True])
            .head(top_n))


def contamination_report(docs, k=13):
    # graft q_contamination_report: per-benchmark-item leak audit
    # (src0 = benchmark, rest = corpus, k-gram content equality)
    def kgrams(d):
        toks = _norm_tokens(d)
        rows = []
        for i, t in zip(d["doc_id"], toks):
            for p in range(max(0, len(t) - k + 1)):
                rows.append((i, " ".join(t[p:p + k])))
        return pd.DataFrame(rows, columns=["doc_id", "w"]).drop_duplicates()
    corpus = kgrams(docs[docs["source"] != "src0"])
    bw = kgrams(docs[docs["source"] == "src0"]).rename(
        columns={"doc_id": "bench_id"})
    btot = bw.groupby("bench_id").size().rename("n_kgrams")
    hits = bw.merge(corpus, on="w").groupby("bench_id").agg(
        n_docs=("doc_id", "nunique"), n_shared=("w", "nunique"))
    rep = pd.concat([btot, hits], axis=1).fillna(0)
    rep["leaked_frac"] = np.round(
        rep["n_shared"] / rep["n_kgrams"] + 1e-9, 6)
    return rep.reset_index()


def dedup_spans(docs, k=20, max_df=1):
    # repeated k-token windows across docs -> merged intervals -> cut
    toks = docs["text"].str.lower().str.strip() \
        .str.replace(r"\s+", " ", regex=True).str.split(" ")
    wins = []
    for doc_id, t in zip(docs["doc_id"], toks):
        for i in range(max(0, len(t) - k + 1)):
            wins.append((doc_id, i, " ".join(t[i:i + k])))
    w = pd.DataFrame(wins, columns=["doc_id", "pos", "w"])
    df_counts = w.groupby("w")["doc_id"].nunique()
    frequent = set(df_counts[df_counts > max_df].index)
    starts = w[w["w"].isin(frequent)]
    by_doc = starts.groupby("doc_id")["pos"].apply(list).to_dict()
    rows = []
    for doc_id, t in zip(docs["doc_id"], toks):
        ps = sorted(by_doc.get(doc_id, []))
        ivs, cur = [], None
        for p in ps:
            if cur is not None and p <= cur[1]:
                cur = (cur[0], max(cur[1], p + k))
            else:
                if cur:
                    ivs.append(cur)
                cur = (p, p + k)
        if cur:
            ivs.append(cur)
        kept = [tok for i, tok in enumerate(t)
                if not any(s <= i < e for s, e in ivs)]
        rows.append((doc_id, len(t), len(t) - len(kept), " ".join(kept)))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_removed", "text_clean"])


def token_count_bpe(docs):
    # greedy BPE apply, reusing the ONE reference implementation
    # (tools/bpe_reference.py — the same module the BpeSpec fixture is
    # generated from, so the baseline cannot drift from the pinned
    # semantics), memoized per word like the engine's kernel
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bpe_reference as ref
    ranks = ref.load_ranks(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "src", "main", "resources", "graft", "bpe_merges.txt"))
    cache = {}

    def word_count(word):
        if word not in cache:
            cache[word] = ref.bpe_word(word, ranks)
        return cache[word]

    norm = docs["text"].str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
    return pd.DataFrame({
        "doc_id": docs["doc_id"],
        "n_bpe_tokens": norm.map(
            lambda s: sum(word_count(w) for w in s.split(" "))),
    })


def quantiles(df):
    # dashboard.py:209-231 distribution percentiles (pandas exact
    # linear interpolation — the analog of graft's exact q_quantiles;
    # graft's quantilesApprox trades exactness for mergeable state,
    # which pandas has no notion of)
    return df["value"].quantile([0.25, 0.5, 0.75, 0.95])


def quantiles_approx_check(df):
    # graft q_quantiles_approx_check: exact interpolated quantiles +
    # non-null count + the GK rank-bound booleans (pandas has no
    # mergeable sketch, so its "approx" IS the exact value — the rank
    # check then counts values around each quantile, the same two
    # passes of work graft does)
    qs = [0.25, 0.5, 0.75, 0.95]
    v = df["value"].dropna()
    n = len(v)
    exact = v.quantile(qs)
    # the rank check must run against a REAL data element (a GK sketch
    # returns observations): an interpolated value between two data
    # points has an EMPTY occupied-rank interval (rank_lt == rank_le),
    # which spuriously fails the bound at small n (ADVICE r14) —
    # interpolation='lower' is the sketch-like stand-in
    approx = v.quantile(qs, interpolation="lower")
    rows = []
    for q in qs:
        x = approx[q]
        rank_lt = (v < x).sum()
        rank_le = (v <= x).sum()
        slack = n / 10000 + 1
        rows.append((q, n, round(exact[q] + 1e-9, 4),
                     rank_lt + 1 - slack <= q * n <= rank_le + slack))
    return pd.DataFrame(rows, columns=["quantile", "n_rows", "exact_q",
                                       "rank_in_bound"])


def _bpe_ranks():
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bpe_reference as ref
    return ref, ref.load_ranks(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "src", "main", "resources", "graft", "bpe_merges.txt"))


def tokenize_bpe(docs):
    # the pieces, not just counts (graft q_tokenize_bpe): per-word
    # greedy merge via the one reference implementation, memoized,
    # exploded to (doc_id, pos, piece) rows
    ref, ranks = _bpe_ranks()
    cache = {}

    def word_syms(word):
        if word not in cache:
            cache[word] = ref.bpe_word_syms(word, ranks)
        return cache[word]

    norm = docs["text"].str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
    rows = []
    for doc_id, s in zip(docs["doc_id"], norm):
        pos = 0
        for w in s.split(" "):
            for p in word_syms(w):
                rows.append((doc_id, pos, p))
                pos += 1
    return pd.DataFrame(rows, columns=["doc_id", "pos", "piece"])


def _norm_tokens(docs):
    return docs["text"].str.lower().str.strip() \
        .str.replace(r"\s+", " ", regex=True).str.split(" ")


def unigram_logprob(docs):
    # graft q_unigram_logprob: per-doc mean -log2 p(token) under the
    # corpus-trained unigram ML model (6dp-rounded addends, 4dp mean)
    ex = docs[["doc_id"]].assign(token=_norm_tokens(docs)).explode("token")
    ex = ex[ex["token"] != ""]
    freq = ex["token"].value_counts()
    nll = np.round(-np.log2(ex["token"].map(freq).to_numpy() / len(ex)) + 1e-9, 6)
    g = ex.assign(nll=nll).groupby("doc_id")["nll"].agg(["size", "mean"])
    return pd.DataFrame({"doc_id": g.index, "n_tokens": g["size"],
                         "mean_nll": np.round(g["mean"].to_numpy() + 1e-9, 4)})


def bigram_logprob(docs, alpha=0.4):
    # graft q_bigram_logprob: Stupid Backoff bigram + Laplace unigrams
    # trained on the held-out source != 'src0' slice, scoring ALL docs
    ex = docs[["doc_id", "source"]].assign(token=_norm_tokens(docs)) \
        .explode("token")
    ex = ex[ex["token"] != ""].reset_index(drop=True)
    ex["prev"] = ex.groupby("doc_id")["token"].shift(1)
    train = ex[ex["source"] != "src0"]
    c1 = train["token"].value_counts()
    n_train, v_train = len(train), len(c1)
    p2 = (train.dropna(subset=["prev"]).groupby(["prev", "token"]).size()
          .rename("c2").reset_index())
    p2["p2"] = p2["c2"] / p2["prev"].map(c1)
    sc = ex.merge(p2[["prev", "token", "p2"]], on=["prev", "token"], how="left")
    puni = (sc["token"].map(c1).fillna(0).to_numpy() + 1) / (n_train + v_train)
    first = sc["prev"].isna().to_numpy()
    backoff = (~first) & sc["p2"].isna().to_numpy()
    score = np.where(first, puni, np.where(~sc["p2"].isna(), sc["p2"], alpha * puni))
    g = sc.assign(nll=np.round(-np.log2(score) + 1e-9, 6), bo=backoff) \
        .groupby("doc_id").agg(n_tokens=("nll", "size"),
                               mean_nll=("nll", "mean"), n_backoff=("bo", "sum"))
    g["mean_nll"] = np.round(g["mean_nll"] + 1e-9, 4)
    return g.reset_index()


def decontaminate_fuzzy(docs, tau=0.8):
    # graft q_decontaminate_fuzzy: best-matching benchmark item
    # (source == src0) per corpus doc by 3-gram shingle containment
    sh = _norm_tokens(docs).map(lambda ts: list(dict.fromkeys(
        " ".join(ts[i:i + 3]) for i in range(len(ts) - 2))))
    d = docs[["doc_id", "source"]].assign(s=sh)
    bench = d[(d["source"] == "src0") & (d["s"].str.len() > 0)]
    nb = bench.set_index("doc_id")["s"].str.len()
    bex = bench[["doc_id", "s"]].rename(columns={"doc_id": "bench_id"}).explode("s")
    corpus = d[d["source"] != "src0"]
    hits = corpus[["doc_id", "s"]].explode("s").dropna().merge(bex, on="s") \
        .groupby(["doc_id", "bench_id"]).size().rename("inter").reset_index()
    hits["cont"] = hits["inter"] / hits["bench_id"].map(nb)
    best = hits.sort_values(["doc_id", "cont", "bench_id"],
                            ascending=[True, False, True]).groupby("doc_id").head(1)
    out = corpus[["doc_id"]].merge(best, on="doc_id", how="left")
    return pd.DataFrame({
        "doc_id": out["doc_id"],
        "best_bench": out["bench_id"].fillna(-1).astype("int64"),
        "containment": np.round(out["cont"].fillna(0) + 1e-9, 4),
        "contaminated": (out["cont"] >= tau).fillna(False).astype("int64"),
    })


def mix_quality(docs, thresholds=(4.90, 4.92), quotas=(50, 100, 30)):
    # graft q_mix_quality: unigram-LM score cut at explicit thresholds,
    # deterministic per-bucket quota via the same Knuth salt rank as
    # stratified_sample
    sc = unigram_logprob(docs).reset_index(drop=True)
    bucket = sum((sc["mean_nll"] >= t).astype(int) for t in thresholds)
    salt = ((sc["doc_id"] % 2147483648) * 2654435761) % 4294967296
    out = sc.assign(bucket=bucket, salt=salt,
                    q=bucket.map(lambda b: quotas[b])) \
        .sort_values(["bucket", "salt", "doc_id"])
    out["sample_rank"] = out.groupby("bucket").cumcount() + 1
    return out[out["sample_rank"] <= out["q"]][
        ["doc_id", "bucket", "mean_nll", "sample_rank"]]


def mix_temperature(docs, budget=600, alpha=0.5):
    # graft q_mix_temperature: per-lang quotas proportional to sqrt(n)
    # scaled to the budget, capped at n, same Knuth salt rank (exact
    # decimal weight sum mirroring the engines' DECIMAL(38,6) path)
    import math
    from decimal import Decimal
    counts = docs["lang"].value_counts().to_dict()
    w = {k: Decimal(str(round(math.sqrt(n) + 1e-9, 6)))
         for k, n in counts.items()}
    wtot = sum(w.values())
    quota = {k: min(counts[k],
                    max(1, int(float(w[k] * budget) / float(wtot))))
             for k in counts}
    salt = ((docs["doc_id"] % 2147483648) * 2654435761) % 4294967296
    out = docs.assign(salt=salt).sort_values(["lang", "salt", "doc_id"])
    out["sample_rank"] = out.groupby("lang").cumcount() + 1
    return out[out["sample_rank"] <= out["lang"].map(quota)][
        ["doc_id", "lang", "sample_rank"]]


def length_histogram(docs, boundaries=(16, 64, 256, 1024)):
    # graft q_length_histogram: integer-edge token-length buckets
    n = _norm_tokens(docs).str.len()
    bucket = sum((n >= b).astype(int) for b in boundaries)
    g = pd.DataFrame({"bucket": bucket, "n": n}).groupby("bucket")["n"] \
        .agg(["size", "sum"])
    return pd.DataFrame({
        "bucket": g.index, "n_docs": g["size"], "n_tokens": g["sum"],
        "token_share": np.round(g["sum"] / n.sum() + 1e-9, 6),
    })


def source_overlap(docs):
    # graft q_source_overlap: distinct 3-gram shingle sets per source,
    # pairwise intersection counts + containment
    from itertools import combinations
    sets = {}
    for src, ts in zip(docs["source"], _norm_tokens(docs)):
        s = sets.setdefault(src, set())
        for i in range(len(ts) - 2):
            s.add((ts[i], ts[i + 1], ts[i + 2]))
    rows = []
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter:
            rows.append((a, b, inter, len(sets[a]), len(sets[b]),
                         round(inter / min(len(sets[a]), len(sets[b])) + 1e-9, 6)))
    return pd.DataFrame(rows, columns=[
        "src_a", "src_b", "n_shared", "n_a", "n_b", "containment"])


def corpus_diff(docs):
    # graft q_corpus_diff: added/removed/changed/unchanged between the
    # same synthetic snapshot pair (%13 absent old, %19 absent new,
    # %17 revised), content equality = md5 of normalized text
    norm = docs["text"].str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
    ids = docs["doc_id"]
    h_old = norm[ids % 13 != 0].map(lambda s: hashlib.md5(s.encode()).hexdigest())
    new_norm = norm.where(ids % 17 != 0,
                          (docs["text"] + " revised").str.lower().str.strip()
                          .str.replace(r"\s+", " ", regex=True))
    h_new = new_norm[ids % 19 != 0].map(lambda s: hashlib.md5(s.encode()).hexdigest())
    o = pd.DataFrame({"doc_id": ids[ids % 13 != 0], "h_old": h_old})
    n = pd.DataFrame({"doc_id": ids[ids % 19 != 0], "h_new": h_new})
    m = o.merge(n, on="doc_id", how="outer")
    status = np.where(m["h_old"].isna(), "added",
             np.where(m["h_new"].isna(), "removed",
             np.where(m["h_old"] != m["h_new"], "changed", "unchanged")))
    return pd.DataFrame({"doc_id": m["doc_id"], "status": status})


def blocklist_filter(docs, blocklist=("dup", "stall")):
    # graft q_blocklist_filter: C4-style badword document filter,
    # distinct blocked terms counted per doc
    bl = set(blocklist)
    hits = _norm_tokens(docs).map(lambda ts: len(bl & set(ts)))
    return pd.DataFrame({
        "doc_id": docs["doc_id"], "n_blocked_terms": hits,
        "keep": (hits == 0).astype("int64"),
    })


def weighted_sample(docs, k=100):
    # graft q_weighted_sample: A-ES with the Knuth-salt uniform,
    # weight = whitespace token count, k smallest keys
    n = _norm_tokens(docs).str.len()
    salt = ((docs["doc_id"] % 2147483648) * 2654435761) % 4294967296
    key = np.round(-np.log((salt + 0.5) / 4294967296.0) / n + 1e-9, 9)
    return docs.assign(n_tokens=n, sample_key=key) \
        .sort_values(["sample_key", "doc_id"]).head(k)[
        ["doc_id", "n_tokens", "sample_key"]]


CURATE_COUNTS = {}


def curate(docs):
    # graft GraftApi.curateCorpus / q_curate end-to-end: the full
    # composed curation (strip markup -> quality filter -> keep-best
    # exact dedup -> exact 3-shingle decontamination vs the src0
    # benchmark -> exact-Jaccard-0.8 near-dup components -> 20-token
    # span cut -> PII redact -> per-source-10 stratified sample),
    # restated stage-by-stage with the same idioms as the standalone
    # pandas pairs above. Per-stage attrition counts land in
    # CURATE_COUNTS for the manifest cross-check against graft's
    # q_curate_manifest.
    bench = docs[docs["source"] == "src0"]
    corpus = docs[docs["source"] != "src0"]
    # 1. strip markup (tag strip -> entity decode -> collapse + trim)
    t = corpus["text"].str.replace(_TAG, " ", regex=True)
    for e, r in _ENTS:
        t = t.str.replace(e, r, regex=False)
    d = pd.DataFrame({
        "doc_id": corpus["doc_id"].to_numpy(),
        "source": corpus["source"].to_numpy(),
        "text": t.str.replace(r"\s+", " ", regex=True).str.strip().to_numpy(),
    })
    counts = {"input": len(d), "strip_markup": len(d)}
    # 2. quality filter + quality score (text is collapsed+trimmed, so
    #    norm = lower(text))
    norm = d["text"].str.lower()
    toks = norm.str.split(" ")
    n_tok = toks.str.len().astype(float)
    mean_wl = (norm.str.len() - (n_tok - 1)) / n_tok.clip(lower=1.0)
    n_punct = d["text"].str.count(r"[^a-zA-Z0-9\s]").astype(float)
    text_len = d["text"].str.len().clip(lower=1).astype(float)
    stopset = {"the", "a", "of", "and", "is", "in", "to"}
    n_stop = toks.apply(lambda ts: float(sum(1 for x in ts if x in stopset)))
    keep = (n_tok.between(20, 100000) & mean_wl.between(3.0, 10.0)
            & (n_punct / text_len <= 0.2) & (n_stop >= 1)).to_numpy()
    q = np.round(np.minimum(n_tok / 200.0, 1.0) * 0.5
                 + (n_stop / n_tok.clip(lower=1.0)) * 0.25
                 + (1.0 - n_punct / text_len) * 0.25 + 1e-9, 4)
    d = d.assign(norm=norm, q=q)[keep]
    counts["quality_filter"] = len(d)
    # 3. keep-best exact dedup (normalized content; best quality, ties
    #    to the lowest doc_id)
    d = d.sort_values(["norm", "q", "doc_id"], ascending=[True, False, True]) \
         .drop_duplicates("norm", keep="first")
    counts["exact_dedup"] = len(d)
    # distinct (doc_id, 3-shingle) frame shared by decontam + near-dup
    def sh3_rows(frame):
        rows = []
        for did, ts in zip(frame["doc_id"], frame["norm"].str.split(" ")):
            if len(ts) >= 3:
                seen = set()
                for i in range(len(ts) - 2):
                    s = ts[i] + " " + ts[i + 1] + " " + ts[i + 2]
                    if s not in seen:
                        seen.add(s)
                        rows.append((did, s))
        return pd.DataFrame(rows, columns=["doc_id", "s"])
    ce = sh3_rows(d)
    # 4. exact decontamination: >=3 distinct 3-shingles shared w/ bench
    bsh = set()
    for bt in _norm_tokens(bench):
        if len(bt) >= 3:
            for i in range(len(bt) - 2):
                bsh.add(bt[i] + " " + bt[i + 1] + " " + bt[i + 2])
    hits = ce[ce["s"].isin(bsh)].groupby("doc_id")["s"].nunique()
    leaked = set(hits[hits >= 3].index)
    d = d[~d["doc_id"].isin(leaked)]
    ce = ce[~ce["doc_id"].isin(leaked)]
    counts["decontaminate"] = len(d)
    # 5. near-dup: exact 3-shingle Jaccard >= 0.8 pairs -> connected
    #    components -> keep each component's lowest doc_id
    sizes = ce.groupby("doc_id").size().to_dict()
    vc = ce["s"].value_counts()
    hot = ce[ce["s"].isin(vc.index[vc > 1])]
    m = hot.merge(hot, on="s")
    m = m[m["doc_id_x"] < m["doc_id_y"]]
    inter = m.groupby(["doc_id_x", "doc_id_y"]).size()
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for (a, b), n in inter.items():
        if round(n / (sizes[a] + sizes[b] - n) + 1e-9, 4) >= 0.8:
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra  # union-by-min: the root IS the min id
    d = d[d["doc_id"].apply(lambda x: find(x) == x).to_numpy()]
    counts["near_dup"] = len(d)
    # 6. span cut k=20: windows over normalized toks (doc-frequency
    #    > 1), positions cut from the original-case text
    k = 20
    wins = []
    for did, ts in zip(d["doc_id"], d["norm"].str.split(" ")):
        for i in range(max(0, len(ts) - k + 1)):
            wins.append((did, i, " ".join(ts[i:i + k])))
    w = pd.DataFrame(wins, columns=["doc_id", "pos", "w"])
    dfc = w.groupby("w")["doc_id"].nunique()
    by_doc = w[w["w"].isin(dfc.index[dfc > 1])] \
        .groupby("doc_id")["pos"].apply(list).to_dict()
    out_text = []
    for did, txt in zip(d["doc_id"], d["text"]):
        ps = sorted(by_doc.get(did, []))
        if not ps:
            out_text.append(txt)
            continue
        ivs, cur = [], None
        for p in ps:
            if cur is not None and p <= cur[1]:
                cur = (cur[0], max(cur[1], p + k))
            else:
                if cur:
                    ivs.append(cur)
                cur = (p, p + k)
        ivs.append(cur)
        kept = [tok for i, tok in enumerate(txt.split(" "))
                if not any(s <= i < e for s, e in ivs)]
        out_text.append(" ".join(kept))
    d = d.assign(text=out_text)
    counts["span_dedup"] = len(d)
    # 7. PII redact (email, two IP passes, phone — redact_pii's form)
    a = d["text"].str.replace(EMAIL, "<EMAIL>", regex=True)
    b = a.str.replace(IPV4, r"\1<IP>\2", regex=True) \
         .str.replace(IPV4, r"\1<IP>\2", regex=True)
    d = d.assign(text=b.str.replace(PHONE, "<PHONE>\\1", regex=True))
    counts["redact_pii"] = len(d)
    # 8. per-source-10 stratified sample (Knuth salt)
    salt = ((d["doc_id"] % 2147483648) * 2654435761) % 4294967296
    out = d.assign(salt=salt).sort_values(["source", "salt", "doc_id"]) \
           .groupby("source").head(10)[["doc_id", "source", "text"]] \
           .sort_values("doc_id")
    counts["stratified_sample"] = len(out)
    CURATE_COUNTS.clear()
    CURATE_COUNTS.update(counts)
    return out


def semantic_decontaminate(emb, tau=0.4):
    # graft q_semantic_decontaminate: per-corpus-vector best-matching
    # benchmark vector (vec_id % 20 == 0) by 6dp-rounded cosine,
    # ties to the lowest bench id
    ids = emb["vec_id"].to_numpy()
    v = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(v, axis=1, keepdims=True)
    u = v / np.where(nrm == 0, 1, nrm)
    bmask = ids % 20 == 0
    bench_ids, bench = ids[bmask], u[bmask]
    order = np.argsort(bench_ids)
    bench_ids, bench = bench_ids[order], bench[order]
    corpus_ids, corpus = ids[~bmask], u[~bmask]
    cos = np.round(corpus @ bench.T + 1e-9, 6)
    # argmax takes the FIRST max -> lowest bench id after the sort
    best = np.argmax(cos, axis=1)
    bc = cos[np.arange(len(best)), best]
    return pd.DataFrame({
        "vec_id": corpus_ids, "best_bench": bench_ids[best],
        "cosine": bc, "contaminated": (bc >= tau).astype("int64"),
    })


def importance_weights(docs):
    # graft q_importance_weights: DSIR-style add-one-smoothed unigram
    # log-likelihood ratio toward the src0 target distribution,
    # per-doc mean (6dp addends, 4dp mean)
    raw = docs[docs["source"] != "src0"]
    tgt = docs[docs["source"] == "src0"]
    rex = raw[["doc_id"]].assign(token=_norm_tokens(raw)).explode("token")
    rex = rex[rex["token"] != ""]
    tex = pd.Series(np.concatenate(_norm_tokens(tgt).to_numpy()))
    tex = tex[tex != ""]
    cr = rex["token"].value_counts()
    ct = tex.value_counts()
    vocab = cr.index.union(ct.index)
    cr = cr.reindex(vocab, fill_value=0)
    ct = ct.reindex(vocab, fill_value=0)
    nr, nt, v = cr.sum(), ct.sum(), len(vocab)
    llr = np.round(np.log2(((ct + 1.0) * (nr + v)) / ((cr + 1.0) * (nt + v))) + 1e-9, 6)
    per_tok = rex["token"].map(llr).to_numpy()
    g = rex.assign(llr=per_tok).groupby("doc_id")["llr"].agg(["size", "mean"])
    return pd.DataFrame({"doc_id": g.index, "n_tokens": g["size"],
                         "importance": np.round(g["mean"].to_numpy() + 1e-9, 4)})


def importance_weights_ng(docs):
    # graft q_importance_weights_ng: DSIR hashed-BIGRAM bucket llr
    # toward the src0 target with add-one smoothing over the FIXED
    # 4096-bucket feature space; per-doc mean (6dp addends, 4dp mean).
    # Timing pair: Python's builtin hash stands in for the poly64+mix64
    # kernel — same work class (one hash per adjacent token pair).
    B = 4096
    raw = docs[docs["source"] != "src0"]
    tgt = docs[docs["source"] == "src0"]
    mask = (1 << 64) - 1

    def bucket_lists(frame):
        out = []
        for ts in _norm_tokens(frame):
            ts = [t for t in ts if t]
            out.append([((hash(a + " " + b) & mask) >> 1) % B
                        for a, b in zip(ts, ts[1:])])
        return out

    rex = raw[["doc_id"]].assign(bucket=bucket_lists(raw)).explode("bucket")
    rex = rex.dropna(subset=["bucket"])
    tflat = [b for lst in bucket_lists(tgt) for b in lst]
    cr = rex["bucket"].value_counts()
    ct = pd.Series(tflat, dtype="int64").value_counts()
    allb = cr.index.union(ct.index)
    cr = cr.reindex(allb, fill_value=0)
    ct = ct.reindex(allb, fill_value=0)
    nr, nt = cr.sum(), ct.sum()
    llr = np.round(np.log2(((ct + 1.0) * (nr + B)) / ((cr + 1.0) * (nt + B))) + 1e-9, 6)
    per = rex["bucket"].map(llr).to_numpy()
    g = rex.assign(llr=per).groupby("doc_id")["llr"].agg(["size", "mean"])
    return pd.DataFrame({"doc_id": g.index, "n_bigrams": g["size"],
                         "importance": np.round(g["mean"].to_numpy() + 1e-9, 4)})


def dsir_select(docs):
    # graft q_dsir_select: DSIR end-to-end — POOLED unigram+bigram
    # hashed buckets (one shared 4096 space), per-doc natural-log
    # importance SUM, then exponentiated-weight A-ES selection in log
    # space (Gumbel-top-k; exp never computed). Timing pair: Python's
    # builtin hash stands in for the poly64+mix64 kernel.
    B, k = 4096, 100
    raw = docs[docs["source"] != "src0"]
    tgt = docs[docs["source"] == "src0"]
    mask = (1 << 64) - 1

    def bucket_lists(frame):
        out = []
        for ts in _norm_tokens(frame):
            ts = [t for t in ts if t]
            out.append([((hash(t) & mask) >> 1) % B for t in ts] +
                       [((hash(a + " " + b) & mask) >> 1) % B
                        for a, b in zip(ts, ts[1:])])
        return out

    rex = raw[["doc_id"]].assign(bucket=bucket_lists(raw)).explode("bucket")
    rex = rex.dropna(subset=["bucket"])
    tflat = [b for lst in bucket_lists(tgt) for b in lst]
    cr = rex["bucket"].value_counts()
    ct = pd.Series(tflat, dtype="int64").value_counts()
    allb = cr.index.union(ct.index)
    cr = cr.reindex(allb, fill_value=0)
    ct = ct.reindex(allb, fill_value=0)
    nr, nt = cr.sum(), ct.sum()
    llr = np.round(np.log(((ct + 1.0) * (nr + B)) / ((cr + 1.0) * (nt + B))) + 1e-9, 6)
    per = rex["bucket"].map(llr).to_numpy()
    g = rex.assign(llr=per).groupby("doc_id")["llr"].agg(["size", "sum"])
    ids = g.index.to_numpy()
    salt = (((ids % 2**31) + 2**31) % 2**31) * 2654435761 % 2**32
    u = (salt + 0.5) / 2**32
    key = np.round(np.log(-np.log(u)) + 1e-9, 9) - np.round(g["sum"].to_numpy() + 1e-9, 4)
    out = pd.DataFrame({"doc_id": ids, "n_features": g["size"].to_numpy(),
                        "log_w": np.round(g["sum"].to_numpy() + 1e-9, 4),
                        "sample_key": key}).reset_index(drop=True)
    return out.nsmallest(k, ["sample_key", "doc_id"])


def lang_id_model(docs):
    # graft q_lang_id_model's shape in numpy: hashing-trick embedding,
    # weak labels from the stopword-profile heuristic, one-vs-rest
    # logistic GD per class (200 iters), scan-local argmax scoring.
    # Timing pair (builtin hash stands in for the mix64 kernel).
    dim, sample_n, iters, lr = 64, 8192, 200, 0.5
    markers = {"de": {"der", "die", "und", "ist", "ein", "nicht"},
               "en": {"the", "of", "and", "is", "to", "that"},
               "es": {"el", "la", "de", "que", "los", "una"},
               "fr": {"le", "la", "et", "les", "des", "une"}}
    langs = sorted(markers) + ["und"]
    toks = _norm_tokens(docs)
    n = len(docs)
    X = np.zeros((n, dim), dtype=np.float32)
    labels = np.full(n, len(langs) - 1)
    for r, ts in enumerate(toks):
        scores = dict.fromkeys(markers, 0)
        for t in ts:
            if t:
                h = hash(t)
                X[r, (h >> 1) % dim] += 1.0 if (h & 1) == 0 else -1.0
                for l, ws in markers.items():
                    if t in ws:
                        scores[l] += 1
        best = max(sorted(markers), key=lambda l: scores[l])
        if scores[best] > 0:
            labels[r] = langs.index(best)
    nr = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(nr == 0, 1, nr)
    idx = np.random.RandomState(42).permutation(n)[:sample_n]
    Xs, ys = X[idx], labels[idx]
    W = np.zeros((len(langs), dim))
    bs = np.zeros(len(langs))
    for c in range(len(langs)):
        w, b = np.zeros(dim), 0.0
        y = (ys == c).astype(np.float64)
        for _ in range(iters):
            p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
            g = p - y
            w -= lr * (Xs.T @ g) / len(ys)
            b -= lr * g.mean()
        W[c], bs[c] = w, b
    scores = np.round(X @ W.T + bs + 1e-9, 6)
    pred = np.argmax(scores, axis=1)
    return pd.DataFrame({"doc_id": docs["doc_id"],
                         "lang_model": [langs[i] for i in pred]})


def semdedup(emb):
    # graft q_semdedup's shape in numpy: spherical k-means assignment
    # (the cluster_embed quantizer), within-cluster pairwise cosine,
    # drop any vector with a lower-id neighbor >= tau in its cluster
    k, iters, tau = 16, 3, 0.4
    v = np.stack(emb["embedding"].to_numpy())
    nrm = np.linalg.norm(v, axis=1, keepdims=True)
    unit = v / np.where(nrm == 0, 1, nrm)
    sample = unit[: k * 256]
    cents = sample[:k].copy()
    for _ in range(iters):
        a = np.argmax(sample @ cents.T, axis=1)
        for c in range(k):
            m = sample[a == c]
            if len(m):
                s = m.sum(axis=0)
                nn = np.linalg.norm(s)
                if nn > 0:
                    cents[c] = s / nn
    cid = np.argmax(unit @ cents.T, axis=1)
    ids = emb["vec_id"].to_numpy()
    keep = np.ones(len(ids), dtype=bool)
    for c in np.unique(cid):
        m = np.where(cid == c)[0]
        m = m[np.argsort(ids[m])]
        cos = np.round(unit[m] @ unit[m].T + 1e-9, 6)
        zero = (nrm[m, 0] == 0)
        for j in range(1, len(m)):
            if not zero[j] and np.any((cos[j, :j] >= tau) & ~zero[:j]):
                keep[m[j]] = False
    return pd.DataFrame({"vec_id": ids[keep], "cid": cid[keep]})


def ann_pq(emb):
    # graft q_ann_pq's shape in numpy: per-subspace L2 k-means
    # codebooks on a sample, argmin encoding, per-query ADC lookup
    # tables, top-5 by summed table entries. Timing pair.
    m, k_codes, iters, n_q, topk = 16, 32, 5, 20, 5
    v = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    n, d = v.shape
    dsub = d // m
    sample = v[: k_codes * 256]
    books = []
    for s in range(m):
        sub = sample[:, s * dsub:(s + 1) * dsub]
        cents = sub[:k_codes].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                mbr = sub[a == c]
                if len(mbr):
                    cents[c] = mbr.mean(axis=0)
        books.append(cents)
    codes = np.zeros((n, m), dtype=np.int32)
    for s in range(m):
        sub = v[:, s * dsub:(s + 1) * dsub]
        d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(d2, axis=1)
    ids = emb["vec_id"].to_numpy()
    out = []
    for qi in np.where(ids < n_q)[0]:
        lut = np.stack([(((v[qi, s * dsub:(s + 1) * dsub][None, :]
                           - books[s]) ** 2).sum(axis=1)) for s in range(m)])
        adist = lut[np.arange(m)[:, None], codes.T].sum(axis=0)
        adist[qi] = np.inf
        top = np.argsort(adist, kind="stable")[:topk]
        out.extend((ids[qi], ids[t], adist[t]) for t in top)
    return pd.DataFrame(out, columns=["query_id", "cand_id", "adist"])


def ann_ivfpq(emb):
    # graft q_ann_ivfpq's shape in numpy (IVFADC + refine): spherical
    # coarse quantizer, unit-sphere residual PQ codebooks, per-query
    # probe of the 6 nearest lists, ADC over the probed lists' codes,
    # refine*k shortlist re-ranked by exact cosine. Timing pair.
    n_list, n_probe, q_iters, m, k_codes, pq_iters = 16, 6, 3, 16, 32, 5
    n_q, topk, refine = 20, 5, 4
    v = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    n, d = v.shape
    dsub = d // m
    nrm = np.linalg.norm(v, axis=1, keepdims=True)
    unit = v / np.where(nrm == 0, 1, nrm)
    # coarse quantizer (the semdedup/cluster_embed training shape)
    sample = unit[: n_list * 256]
    cents = sample[:n_list].copy()
    for _ in range(q_iters):
        a = np.argmax(sample @ cents.T, axis=1)
        for c in range(n_list):
            mbr = sample[a == c]
            if len(mbr):
                s = mbr.sum(axis=0)
                nn = np.linalg.norm(s)
                if nn > 0:
                    cents[c] = s / nn
    cid = np.argmax(unit @ cents.T, axis=1)
    resid = unit - cents[cid]
    # residual codebooks + codes (the ann_pq shape over residuals)
    rs = resid[: k_codes * 256]
    books = []
    for s in range(m):
        sub = rs[:, s * dsub:(s + 1) * dsub]
        bc = sub[:k_codes].copy()
        for _ in range(pq_iters):
            d2 = ((sub[:, None, :] - bc[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(len(bc)):
                mbr = sub[a == c]
                if len(mbr):
                    bc[c] = mbr.mean(axis=0)
        books.append(bc)
    codes = np.zeros((n, m), dtype=np.int32)
    for s in range(m):
        sub = resid[:, s * dsub:(s + 1) * dsub]
        d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(d2, axis=1)
    ids = emb["vec_id"].to_numpy()
    out = []
    for qi in np.where(ids < n_q)[0]:
        ccos = unit[qi] @ cents.T
        probes = np.argsort(-ccos, kind="stable")[:n_probe]
        cand, adist = [], []
        for c in probes:
            qr = unit[qi] - cents[c]
            lut = np.stack([(((qr[s * dsub:(s + 1) * dsub][None, :]
                               - books[s]) ** 2).sum(axis=1)) for s in range(m)])
            mbr = np.where((cid == c) & (np.arange(n) != qi))[0]
            cand.extend(mbr)
            adist.extend(lut[np.arange(m)[:, None], codes[mbr].T].sum(axis=0))
        # explicit dtypes: an empty python list would otherwise become
        # float64 and crash the integer indexing below (r19 advice)
        cand = np.asarray(cand, dtype=np.int64)
        adist = np.asarray(adist, dtype=np.float64)
        short = cand[np.argsort(adist, kind="stable")[: refine * topk]]
        cos = np.round((unit[short] @ unit[qi]) + 1e-9, 6)
        top = short[np.argsort(-cos, kind="stable")[:topk]]
        out.extend((ids[qi], ids[t]) for t in top)
    return pd.DataFrame(out, columns=["query_id", "cand_id"])


def lang_id_model_cn(docs):
    # graft q_lang_id_model_cn's shape: char-3..5-gram hashing-trick
    # embedding (the fastText basis), weak labels from the stopword
    # heuristic, one-vs-rest logistic GD, scan-local argmax. The char
    # windows are the cost delta vs lang_id_model. Timing pair.
    dim, sample_n, iters, lr = 64, 8192, 200, 0.5
    markers = {"de": {"der", "die", "und", "ist", "ein", "nicht"},
               "en": {"the", "of", "and", "is", "to", "that"},
               "es": {"el", "la", "de", "que", "los", "una"},
               "fr": {"le", "la", "et", "les", "des", "une"}}
    langs = sorted(markers) + ["und"]
    toks = _norm_tokens(docs)
    n = len(docs)
    X = np.zeros((n, dim), dtype=np.float32)
    labels = np.full(n, len(langs) - 1)
    for r, ts in enumerate(toks):
        scores = dict.fromkeys(markers, 0)
        for t in ts:
            if t:
                for l, ws in markers.items():
                    if t in ws:
                        scores[l] += 1
        best = max(sorted(markers), key=lambda l: scores[l])
        if scores[best] > 0:
            labels[r] = langs.index(best)
        txt = " ".join(ts)
        for ln in (3, 4, 5):
            for p in range(len(txt) - ln + 1):
                h = hash(txt[p:p + ln])
                X[r, (h >> 1) % dim] += 1.0 if (h & 1) == 0 else -1.0
    nr = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(nr == 0, 1, nr)
    idx = np.random.RandomState(42).permutation(n)[:sample_n]
    Xs, ys = X[idx], labels[idx]
    W = np.zeros((len(langs), dim))
    bs = np.zeros(len(langs))
    for c in range(len(langs)):
        w, b = np.zeros(dim), 0.0
        y = (ys == c).astype(np.float64)
        for _ in range(iters):
            p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
            g = p - y
            w -= lr * (Xs.T @ g) / len(ys)
            b -= lr * g.mean()
        W[c], bs[c] = w, b
    scores = np.round(X @ W.T + bs + 1e-9, 6)
    pred = np.argmax(scores, axis=1)
    return pd.DataFrame({"doc_id": docs["doc_id"],
                         "lang_model": [langs[i] for i in pred]})


def quality_classifier(docs):
    # graft q_quality_classifier's shape in numpy: hashing-trick
    # embedding (64 signed buckets, L2-normalized), weak agreement
    # labels (rule verdict AND unigram-NLL median side) on a bounded
    # seeded sample, 200 full-batch logistic GD iterations, then
    # scan-local scoring of the whole corpus. Timing pair (Python's
    # builtin hash stands in for the mix64 kernel — same work class).
    dim, sample_n, iters, lr = 64, 8192, 200, 0.5
    toks = _norm_tokens(docs)
    n = len(docs)
    X = np.zeros((n, dim), dtype=np.float32)
    for r, ts in enumerate(toks):
        for t in ts:
            if t:
                h = hash(t)
                X[r, (h >> 1) % dim] += 1.0 if (h & 1) == 0 else -1.0
    nr = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(nr == 0, 1, nr)
    rule = quality_filter(docs)["keep"].to_numpy()
    # reset_index: unigram_logprob's frame carries doc_id as both the
    # groupby index name and a column, which merge rejects as ambiguous
    nll = docs[["doc_id"]].merge(
        unigram_logprob(docs)[["doc_id", "mean_nll"]].reset_index(drop=True),
        on="doc_id", how="left")["mean_nll"].fillna(0.0).to_numpy()
    idx = np.random.RandomState(42).permutation(n)[:sample_n]
    med = np.sort(nll[idx])[(len(idx) - 1) // 2]
    pos = rule[idx] & (nll[idx] <= med)
    neg = ~rule[idx] & (nll[idx] > med)
    agree = pos | neg
    Xs = X[idx][agree] if agree.any() else X[idx]
    ys = pos[agree].astype(np.float64) if agree.any() \
        else rule[idx].astype(np.float64)
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        g = p - ys
        w -= lr * (Xs.T @ g) / len(ys)
        b -= lr * g.mean() / 1.0
    score = np.round(X @ w + b + 1e-9, 6)
    return pd.DataFrame({
        "doc_id": docs["doc_id"], "score": score,
        "prob": np.round(1.0 / (1.0 + np.exp(-score)) + 1e-9, 6),
        "keep_pred": (score > 0).astype("int64"),
    })


def cluster_embed(emb):
    # graft q_cluster_embed's shape in numpy: spherical k-means on a
    # bounded sample (3 Lloyd iterations, argmax-dot assignment, ties
    # to lowest cid), then full-corpus assignment + cosine confidence
    k, iters = 16, 3
    v = np.stack(emb["embedding"].to_numpy())
    nrm = np.linalg.norm(v, axis=1, keepdims=True)
    unit = v / np.where(nrm == 0, 1, nrm)
    sample = unit[: k * 256]
    cents = sample[:k].copy()
    for _ in range(iters):
        a = np.argmax(sample @ cents.T, axis=1)
        for c in range(k):
            m = sample[a == c]
            if len(m):
                s = m.sum(axis=0)
                n = np.linalg.norm(s)
                if n > 0:
                    cents[c] = s / n
    dots = unit @ cents.T
    cid = np.argmax(dots, axis=1)
    return pd.DataFrame({
        "vec_id": emb["vec_id"], "cid": cid,
        "ccos": np.round(dots[np.arange(len(cid)), cid] + 1e-9, 6),
    })


def main():
    # argv[2] (optional): comma-separated subset of query names — used
    # for focused measurements (e.g. source_overlap on the synthetic
    # 10x ScaledCorpus for the crossover record in BASELINE.md)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    timings = {}

    event_queries = [
        ("feature_pipeline", feature_pipeline),
        ("dedup_key", dedup_key),
        ("distinct_daily", distinct_daily),
        ("metrics", metrics),
        ("latest_per_key", latest_per_key),
        ("corr_matrix", corr_matrix),
        ("group_compare", group_compare),
        ("standard_scale", standard_scale),
        ("interpolate", interpolate),
        ("quantiles", quantiles),
        ("quantiles_approx_check", quantiles_approx_check),
    ]
    event_queries = [(n, f) for n, f in event_queries
                     if only is None or n in only]
    if event_queries:
        t0 = time.perf_counter()
        df = load_events(sf_dir)
        timings["load_sort"] = time.perf_counter() - t0
        for name, fn in event_queries:
            t0 = time.perf_counter()
            fn(df)
            timings[name] = time.perf_counter() - t0

    doc_queries = [
        ("dedup_exact_docs", dedup_exact_docs),
        ("redact_pii", redact_pii),
        ("quality_filter", quality_filter),
        ("stratified_sample", stratified_sample),
        ("strip_markup", strip_markup),
        ("dedup_incremental", dedup_incremental),
        ("assign_ids", assign_ids),
        ("dedup_lines", dedup_lines),
        ("token_entropy", token_entropy),
        ("url_stats", url_stats),
        ("url_dedup", url_dedup),
        ("tfidf_topk", tfidf_topk),
        ("heavy_hitters_check", heavy_hitters_check),
        ("contamination_report", contamination_report),
        ("vocab_drift", vocab_drift),
        ("shard_plan", shard_plan),
        ("chunk_docs", chunk_docs),
        ("corpus_stats", corpus_stats),
        ("dedup_spans", dedup_spans),
        ("token_count_bpe", token_count_bpe),
        ("tokenize_bpe", tokenize_bpe),
        ("unigram_logprob", unigram_logprob),
        ("bigram_logprob", bigram_logprob),
        ("decontaminate_fuzzy", decontaminate_fuzzy),
        ("mix_quality", mix_quality),
        ("mix_temperature", mix_temperature),
        ("weighted_sample", weighted_sample),
        ("blocklist_filter", blocklist_filter),
        ("corpus_diff", corpus_diff),
        ("source_overlap", source_overlap),
        ("length_histogram", length_histogram),
        ("quality_classifier", quality_classifier),
        ("importance_weights", importance_weights),
        ("importance_weights_ng", importance_weights_ng),
        ("dsir_select", dsir_select),
        ("lang_id_model", lang_id_model),
        ("lang_id_model_cn", lang_id_model_cn),
        ("curate", curate),
    ]
    doc_queries = [(n, f) for n, f in doc_queries
                   if only is None or n in only]
    if doc_queries:
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        for name, fn in doc_queries:
            t0 = time.perf_counter()
            fn(docs)
            timings[name] = time.perf_counter() - t0

    if only is None or {"cluster_embed", "semantic_decontaminate",
                        "semdedup", "ann_pq", "ann_ivfpq"} & only:
        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        if only is None or "cluster_embed" in only:
            t0 = time.perf_counter()
            cluster_embed(emb)
            timings["cluster_embed"] = time.perf_counter() - t0
        if only is None or "semantic_decontaminate" in only:
            t0 = time.perf_counter()
            semantic_decontaminate(emb)
            timings["semantic_decontaminate"] = time.perf_counter() - t0
        if only is None or "semdedup" in only:
            t0 = time.perf_counter()
            semdedup(emb)
            timings["semdedup"] = time.perf_counter() - t0
        if only is None or "ann_pq" in only:
            t0 = time.perf_counter()
            ann_pq(emb)
            timings["ann_pq"] = time.perf_counter() - t0
        if only is None or "ann_ivfpq" in only:
            t0 = time.perf_counter()
            ann_ivfpq(emb)
            timings["ann_ivfpq"] = time.perf_counter() - t0

    print(json.dumps({
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "total": round(sum(timings.values()), 4),
        "sf": sf_dir,
    }))


if __name__ == "__main__":
    main()
