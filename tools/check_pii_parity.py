#!/usr/bin/env python3
"""Regex-dialect parity check for q_redact_pii.

The synthetic documents corpus contains no PII, so the DuckDB oracle
only proves Spark<->DuckDB regex parity on PII-free text. This check
closes the triangle: it runs the SHIPPED oracle SQL (from a Verify
output's oracle_sql.json) against crafted rows containing real
email/IP/phone shapes and pins the exact redacted strings that
TextAnalysisSpec pins for the Spark side. If either engine's regex
dialect drifts (lookaround, \\b semantics, class escaping), this fails.

A second, GENERATIVE section closes the class of dialect drift rather
than the known cases: if a PiiGen dump (sbt "runMain graft.PiiGen
<genDir>") is passed as the second argument, this regenerates the
identical seeded grammar corpus (mirrored LCG + atom table; a corpus
mismatch fails loudly), runs the shipped oracle SQL over it in DuckDB,
and diffs counts and redacted text per row against Spark's parquet.

Usage: python3 tools/check_pii_parity.py <verifyOutDir> [<piiGenDir>]
"""
import json
import sys

import duckdb

EXPECTED = {
    1: ("contact <EMAIL> or call <PHONE> now", 1, 0, 1),
    2: ("server at <IP> responded; backup at <IP>", 0, 2, 0),
    3: ("digits-only local part <EMAIL> must count as email not phone", 1, 0, 0),
    4: ("nothing sensitive here at all", 0, 0, 0),
    # bounded international branch: trailing unrelated digit group is
    # NOT absorbed into the <PHONE> (ADVICE r3 fix)
    5: ("ring <PHONE> 1999 was a good year", 0, 0, 1),
    6: ("fax <PHONE> 1999 was a good year", 0, 0, 1),
}

ROWS = [
    (1, "contact alice.smith+dev@example.co.uk or call +1 (555) 123-4567 now"),
    (2, "server at 192.168.0.1 responded; backup at 10.0.0.255"),
    (3, "digits-only local part 12345678@mail.com must count as email not phone"),
    (4, "nothing sensitive here at all"),
    (5, "ring +44 20 7946 0958 1999 was a good year"),
    (6, "fax +1 (555) 123-4567 1999 was a good year"),
]


# ==== generative section: mirrors graft.PiiGen EXACTLY ====
# (same MMIX LCG constants, same atom/separator tables — the corpus
# equality check below fails loudly if the two generators drift)

ATOMS = [
    "alpha", "beta", "call", "now", "year", "was", "good",
    "héllo", "naïve", "токен", "数字",
    "7", "42", "555", "1234", "55512", "4155551234", "19991231",
    "123456789012345", "0", "00",
    "+", "-", "--", "(", ")", "@", ".", "..", "+1", "+44", "(555)",
    "192.168.0.1", "999.999.999.999", "10.0.0.256", "1.2.3.4.5",
    "user@example.com", "a@b.co", "@example.com", "user@",
    "12345678@mail.com", "+1 (555) 123-4567", "+44 20 7946 0958",
    "555-123-4567", "(555) 123-4567", "555 123 4567", "5551234567",
    "2020-01-02", "1-10", "v2.0.1",
    "<b>", "</p>", '<div class="x">', "<br/>", "<notclosed",
    "a<b", ">stray", "&amp;", "&lt;", "&nbsp;", "&amp;lt;", "&bogus;",
    "https://www.Example.COM/path", "http://example.com:8080/x?y=1",
    "http://other.org", "https://192.168.0.1/admin", "ftp://nope.net",
    "http://", "https://sub.domain.co.uk/a,b.(c)",
]

SEPS = [" ", " ", " ", "", "-", "."]

MASK = (1 << 64) - 1


def gen_corpus(n, seed=20260812):
    state = seed

    def nxt():
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) & MASK
        return state

    def ni(bound):
        return (nxt() >> 33) % bound

    rows = []
    for doc_id in range(n):
        k = 3 + ni(13)
        parts = []
        for i in range(k):
            if i > 0:
                parts.append(SEPS[ni(len(SEPS))])
            parts.append(ATOMS[ni(len(ATOMS))])
        rows.append((doc_id, "".join(parts)))
    return rows


def check_crafted(sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", ROWS)
    got = con.execute(sql).fetchall()
    n_fail = 0
    for doc_id, n_emails, n_ips, n_phones, redacted in got:
        exp_text, exp_e, exp_i, exp_p = EXPECTED[doc_id]
        ok = (redacted == exp_text and n_emails == exp_e
              and n_ips == exp_i and n_phones == exp_p)
        status = "PASS" if ok else "FAIL"
        if not ok:
            n_fail += 1
            print(f"{status} doc {doc_id}: got ({n_emails},{n_ips},{n_phones}) "
                  f"{redacted!r}, want ({exp_e},{exp_i},{exp_p}) {exp_text!r}")
        else:
            print(f"{status} doc {doc_id}")
    return n_fail


def check_generative(sql, gen_dir):
    con = duckdb.connect()
    spark_input = dict(con.execute(
        f"SELECT doc_id, text FROM '{gen_dir}/input/*.parquet'").fetchall())
    rows = gen_corpus(len(spark_input))
    # generator-mirror sanity: both languages must emit the same corpus
    drift = [i for i, t in rows if spark_input.get(i) != t]
    if drift:
        print(f"FAIL generative: corpus mismatch on docs {drift[:5]} — "
              f"the Scala and Python generators have drifted")
        return 1
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    duck = {r[0]: r[1:] for r in con.execute(sql).fetchall()}
    spark = {r[0]: r[1:] for r in con.execute(
        f"SELECT doc_id, n_emails, n_ips, n_phones, text_redacted "
        f"FROM '{gen_dir}/redacted/*.parquet'").fetchall()}
    n_fail = 0
    for doc_id in sorted(spark):
        if duck.get(doc_id) != spark[doc_id]:
            n_fail += 1
            if n_fail <= 10:
                print(f"FAIL generative doc {doc_id}:\n  spark {spark[doc_id]!r}"
                      f"\n  duck  {duck.get(doc_id)!r}")
    print(f"generative: {len(spark) - n_fail}/{len(spark)} rows agree")
    return n_fail


def check_generative_markup(sql, gen_dir):
    """Same generative corpus, q_strip_markup's oracle SQL vs Spark's
    stripped parquet — closes the markup patterns' dialect class the
    same way the redaction check closes PII's."""
    import os
    if not os.path.isdir(f"{gen_dir}/stripped"):
        print("generative markup: SKIPPED (no stripped/ dump in gen dir)")
        return 0
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{gen_dir}/input/*.parquet'").fetchall()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    duck = {r[0]: r[1:] for r in con.execute(sql).fetchall()}
    spark = {r[0]: r[1:] for r in con.execute(
        f"SELECT doc_id, n_tags, n_entities, text_clean "
        f"FROM '{gen_dir}/stripped/*.parquet'").fetchall()}
    n_fail = 0
    for doc_id in sorted(spark):
        if duck.get(doc_id) != spark[doc_id]:
            n_fail += 1
            if n_fail <= 10:
                print(f"FAIL generative markup doc {doc_id}:\n"
                      f"  spark {spark[doc_id]!r}\n  duck  {duck.get(doc_id)!r}")
    print(f"generative markup: {len(spark) - n_fail}/{len(spark)} rows agree")
    return n_fail


def check_generative_urls(sql, gen_dir):
    """Same generative corpus, q_url_stats' oracle SQL vs Spark's
    domain rollup — URL pattern dialect parity (keyed by domain)."""
    import os
    if not os.path.isdir(f"{gen_dir}/urls"):
        print("generative urls: SKIPPED (no urls/ dump in gen dir)")
        return 0
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{gen_dir}/input/*.parquet'").fetchall()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    duck = {r[0]: r[1:] for r in con.execute(sql).fetchall()}
    spark = {r[0]: r[1:] for r in con.execute(
        f"SELECT domain, n_urls, n_docs FROM '{gen_dir}/urls/*.parquet'").fetchall()}
    n_fail = 0
    for key in sorted(set(duck) | set(spark)):
        if duck.get(key) != spark.get(key):
            n_fail += 1
            if n_fail <= 10:
                print(f"FAIL generative url domain {key!r}:\n"
                      f"  spark {spark.get(key)!r}\n  duck  {duck.get(key)!r}")
    print(f"generative urls: {len(spark)} domains, {n_fail} disagree")
    return n_fail


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    sql = oracles["q_redact_pii"]
    n_fail = check_crafted(sql)
    if len(sys.argv) > 2:
        n_fail += check_generative(sql, sys.argv[2])
        n_fail += check_generative_markup(oracles["q_strip_markup"], sys.argv[2])
        n_fail += check_generative_urls(oracles["q_url_stats"], sys.argv[2])
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
