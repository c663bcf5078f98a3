#!/usr/bin/env python3
"""Compare two bench JSON artifacts per query (the only valid comparison —
totals drift as the query set grows).

Usage: python3 tools/compare_bench.py OLD.json NEW.json [--thresh 1.2]

A query is flagged only when it is BOTH >thresh slower and >0.3s absolute
slower; the report prints each side's per-pass times and load averages so a
reader can distinguish host-load pollution (slow pass at high load, other
passes fine) from a genuine regression (slow at low load, reproducible
across passes) without re-running. See Bench.scala's timing protocol.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old_json")
    ap.add_argument("new_json")
    ap.add_argument("--thresh", type=float, default=1.2,
                    help="relative slowdown threshold (default 1.2)")
    ns = ap.parse_args()
    thresh = ns.thresh
    old, new = load(ns.old_json), load(ns.new_json)
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    flagged = [k for k in shared if nq[k] > thresh * oq[k] and nq[k] - oq[k] > 0.3]
    print(f"shared={len(shared)} added={len(added)} removed={len(removed)} "
          f"flagged={len(flagged)} (>{thresh}x and >0.3s)")
    print(f"old: total={old['value']}s loads={old.get('pass_load_avg_1m')}")
    print(f"new: total={new['value']}s loads={new.get('pass_load_avg_1m')}")
    if added:
        print("added:", ", ".join(f"{k}={nq[k]:.2f}s" for k in added))
    if removed:
        print("removed:", ", ".join(f"{k}={oq[k]:.2f}s" for k in removed))
    for k in flagged:
        print(f"\nREGRESSION? {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s")
        print(f"  old passes: {old.get('passes', {}).get(k)}")
        print(f"  new passes: {new.get('passes', {}).get(k)}")
        print(f"  disputed old/new: {k in old.get('disputed', [])}/"
              f"{k in new.get('disputed', [])}")
    improved = [k for k in shared if oq[k] > thresh * nq[k] and oq[k] - nq[k] > 0.3]
    if improved:
        print("\nimproved:", ", ".join(f"{k} {oq[k]:.2f}->{nq[k]:.2f}s" for k in improved))
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
