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
    # adjacent IPs: the boundary-consuming pattern runs a second pass
    7: ("ips <IP> <IP> <IP> end", 0, 3, 0),
    8: ("list <IP>,<IP>", 0, 2, 0),
}

ROWS = [
    (1, "contact alice.smith+dev@example.co.uk or call +1 (555) 123-4567 now"),
    (2, "server at 192.168.0.1 responded; backup at 10.0.0.255"),
    (3, "digits-only local part 12345678@mail.com must count as email not phone"),
    (4, "nothing sensitive here at all"),
    (5, "ring +44 20 7946 0958 1999 was a good year"),
    (6, "fax +1 (555) 123-4567 1999 was a good year"),
    (7, "ips 1.2.3.4 5.6.7.8 9.10.11.12 end"),
    (8, "list 1.2.3.4,5.6.7.8"),
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


def _diff_generative(sql, gen_dir, subdir, select, label,
                     verify_corpus=False, required=False):
    """Shared generative-diff core: load SPARK'S OWN input parquet into
    DuckDB (so the diff is a same-text dialect comparison even if the
    Python generator mirror drifts), run the shipped oracle `sql`, and
    key-diff its rows against Spark's parquet dump at
    `{gen_dir}/{subdir}` read via `select`. Rows are keyed by their
    first selected column. `required` dumps hard-fail when missing
    (a typo'd gen dir must not turn the gate green); optional ones
    skip, for gen dirs produced before their operator existed."""
    import os
    if not os.path.isdir(f"{gen_dir}/{subdir}"):
        if required:
            print(f"FAIL {label}: required dump {subdir}/ missing in {gen_dir}")
            return 1
        print(f"{label}: SKIPPED (no {subdir}/ dump in gen dir)")
        return 0
    con = duckdb.connect()
    spark_input = dict(con.execute(
        f"SELECT doc_id, text FROM '{gen_dir}/input/*.parquet'").fetchall())
    if verify_corpus:
        # generator-mirror sanity: both languages must emit the same corpus
        rows = gen_corpus(len(spark_input))
        drift = [i for i, t in rows if spark_input.get(i) != t]
        if drift:
            print(f"FAIL {label}: corpus mismatch on docs {drift[:5]} — "
                  f"the Scala and Python generators have drifted")
            return 1
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    sorted(spark_input.items()))
    duck = {r[0]: r[1:] for r in con.execute(sql).fetchall()}
    spark = {r[0]: r[1:] for r in con.execute(
        f"SELECT {select} FROM '{gen_dir}/{subdir}/*.parquet'").fetchall()}
    n_fail = 0
    for key in sorted(set(duck) | set(spark)):
        if duck.get(key) != spark.get(key):
            n_fail += 1
            if n_fail <= 10:
                print(f"FAIL {label} {key!r}:\n  spark {spark.get(key)!r}"
                      f"\n  duck  {duck.get(key)!r}")
    print(f"{label}: {len(spark)} spark rows vs {len(duck)} oracle rows, "
          f"{n_fail} disagree")
    return n_fail


def check_generative(sql, gen_dir):
    return _diff_generative(
        sql, gen_dir, "redacted",
        "doc_id, n_emails, n_ips, n_phones, text_redacted",
        "generative", verify_corpus=True, required=True)


def check_generative_markup(sql, gen_dir):
    """Same generative corpus, q_strip_markup's oracle SQL vs Spark's
    stripped parquet — closes the markup patterns' dialect class the
    same way the redaction check closes PII's."""
    return _diff_generative(
        sql, gen_dir, "stripped",
        "doc_id, n_tags, n_entities, text_clean", "generative markup")


def check_generative_urls(sql, gen_dir):
    """Same generative corpus, q_url_stats' oracle SQL vs Spark's
    domain rollup — URL pattern dialect parity (keyed by domain)."""
    return _diff_generative(
        sql, gen_dir, "urls", "domain, n_urls, n_docs", "generative urls")


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
