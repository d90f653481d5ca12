#!/usr/bin/env python3
"""Regex-dialect parity check for q_redact_pii.

The synthetic documents corpus contains no PII, so the DuckDB oracle
only proves Spark<->DuckDB regex parity on PII-free text. This check
closes the triangle: it runs the SHIPPED oracle SQL (from a Verify
output's oracle_sql.json) against crafted rows containing real
email/IP/phone shapes and pins the exact redacted strings that
TextAnalysisSpec pins for the Spark side. If either engine's regex
dialect drifts (lookaround, \\b semantics, class escaping), this fails.

Usage: python3 tools/check_pii_parity.py <verifyOutDir>
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


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["q_redact_pii"]
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
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
