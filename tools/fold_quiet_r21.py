#!/usr/bin/env python3
"""One-shot r21 helper: elementwise-min-merge a QUALIFIED bench run
into bench_quiet.json per the file's own discipline (checksum-action
full-suite run, pre-launch 1m load < cpus/8, load_triggered false,
0 failed, 0 spill). Usage:

    python3 tools/fold_quiet_r21.py bench_detail.json

Prints the qualification record and the merge summary; refuses to
merge a non-qualifying run."""
import json
import sys


def main() -> None:
    detail_path = sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json"
    run = json.load(open(detail_path))
    quiet = json.load(open("bench_quiet.json"))
    cpus = run["load"]["cpus"]
    pre = run["load"]["pre_1m"]
    ok = (run["failed_count"] == 0 and run["spill_bytes_total"] == 0
          and not run["load_triggered"] and 0 <= pre < max(2.0, cpus / 8.0))
    print(json.dumps({
        "pre_1m": pre, "cpus": cpus, "failed": run["failed_count"],
        "spill": run["spill_bytes_total"],
        "load_triggered": run["load_triggered"],
        "floor_drift": run["floor_sentinel"]["drift"],
        "qualifies": ok}))
    if not ok:
        print("NOT qualified — no merge performed")
        sys.exit(1)
    improved, entered = [], []
    for k, v in run["queries"].items():
        old = quiet["queries"].get(k)
        if old is None:
            quiet["queries"][k] = v
            entered.append(k)
        elif v < old:
            quiet["queries"][k] = v
            improved.append((k, old, v))
    total = sum(quiet["queries"].values())
    print(f"improved {len(improved)}, entered {len(entered)}, "
          f"suite total of minima {total:.2f} s over "
          f"{len(quiet['queries'])} entries")
    for k, o, v in sorted(improved, key=lambda t: t[1] - t[2],
                          reverse=True)[:15]:
        print(f"  {k:32s} {o:.3f} -> {v:.3f}")
    quiet["note_r21"] = (
        "r21 min-merge of ONE formally qualified full-suite run "
        f"(2026-08-18: pre_1m {pre}, load_triggered false, 0 failed, "
        f"0 spill, floor_drift "
        f"{run['floor_sentinel']['drift']:.2f}) after the r21 "
        "optimization rewrites (DSIR scaled-long model fold, "
        "sourceOverlap driver fold, two-level sketch check, "
        "decontaminate count(1), semanticDecontaminate join-free "
        "rollup, stratifiedSample bounds fold); "
        f"{len(improved)} entries improved, suite total of minima "
        f"{total:.2f} s.")
    json.dump(quiet, open("bench_quiet.json", "w"), indent=1)
    print("bench_quiet.json written")


if __name__ == "__main__":
    main()
