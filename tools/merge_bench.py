#!/usr/bin/env python3
"""Min-merge a fresh bench run into the committed round record.

Policy (COVERAGE.md "bench record" notes): the committed record keeps
per-query MINIMA across the round's clean rc=0 runs — co-tenant load
only ever inflates a timing, so the min across runs is the best
estimate of the code's steady-state cost. Queries new in the fresh run
are added; queries whose code changed since the old record should be
RESET by listing them under --reset (their stale minima no longer
describe the shipped code).

Usage:
  python3 tools/merge_bench.py <record.jsonl> <fresh_run.jsonl> \
      [--note "..."] [--reset q1,q2] [--run-label "r14 s5"]

Writes the merged record back to <record.jsonl> (per-query lines sorted
by name, then the recomputed total line).
"""
import argparse
import json
import sys


def load(path):
    qlines, total = {}, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if row.get("metric") == "total":
                total = row
            elif "q" in row:
                qlines[row["q"]] = row
    return qlines, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("record")
    ap.add_argument("fresh")
    ap.add_argument("--note", default="")
    ap.add_argument("--reset", default="",
                    help="comma-separated queries whose old minima are stale "
                         "(code changed): take the fresh timing verbatim")
    ap.add_argument("--run-label", default="fresh run")
    args = ap.parse_args()

    old_q, old_t = load(args.record)
    new_q, new_t = load(args.fresh)
    if new_t is None:
        sys.exit("fresh run has no total line - refusing to merge a "
                 "partial/killed record")
    if new_t.get("failed"):
        sys.exit(f"fresh run reports failures {new_t['failed']} - fix "
                 "before merging")
    reset = set(q for q in args.reset.split(",") if q)
    missing_reset = reset - set(new_q)
    if missing_reset:
        sys.exit(f"--reset queries absent from the fresh run: "
                 f"{sorted(missing_reset)} - their stale minima cannot be "
                 "replaced; drop them from --reset or rerun the bench")

    # queries present only in the OLD record were removed from the
    # suite — carrying them forward would inflate the committed total
    # forever, so they are DROPPED (loudly)
    dropped = sorted(set(old_q) - set(new_q))
    if dropped:
        print(f"dropping {len(dropped)} queries absent from the fresh "
              f"run (removed from the suite): {dropped}")

    merged, improved, added = {}, 0, 0
    for q in sorted(new_q):
        o, n = old_q.get(q), new_q[q]
        if q in reset or o is None:
            merged[q] = n
            added += 0 if q in reset else 1
        elif n["sec"] < o["sec"]:
            merged[q] = n
            improved += 1
        else:
            merged[q] = o

    # the total line describes the FRESH run (wall, rc, failed, sf...);
    # only the min-merged per-query map, the accumulated calib/runs
    # history, and the note trail carry over from the old record
    total = dict(new_t)
    total["queries"] = {q: merged[q]["sec"] for q in sorted(merged)}
    total["value"] = sum(total["queries"].values())
    runs = total.setdefault("calib", {}).setdefault("runs", [])
    for r in ((old_t or {}).get("calib", {}) or {}).get("runs", []):
        if r not in runs:
            runs.append(r)
    if args.run_label not in runs:
        runs.append(args.run_label)
    if old_t and old_t.get("note") and not total.get("note"):
        total["note"] = old_t["note"]
    stamp = (f"{args.run_label} min-merge: {improved} improved, "
             f"{added} added, {len(reset & set(new_q))} reset"
             + (f". {args.note}" if args.note else ""))
    total["note"] = (total.get("note", "") + " | " + stamp).strip(" |")

    with open(args.record, "w") as f:
        for q in sorted(merged):
            f.write(json.dumps(merged[q]) + "\n")
        f.write(json.dumps(total) + "\n")
    print(f"merged {len(merged)} queries -> {args.record}: "
          f"total {total['value']:.1f}s ({improved} improved, {added} added)")


if __name__ == "__main__":
    main()
