"""Parse a run_dbgphmm supervisor log into a per-k wall-budget table.

Usage: python scripts/perk_budget.py runs/n5/dbgphmm/log [--md]

Emits one row per k-stage with the measured phase costs:
  k, sampling_s, n_samples, seed_s, positions_s, streams_s, extend_s,
plus run-level totals and restart counts.  The table is the artifact
VERDICT r4 item 1 asks for ("per-phase wall budget" of the flagship run).
"""

import re
import sys


def parse(path):
    stages = {}  # k -> dict
    restarts = 0
    truth_events = []
    cur = {}
    for line in open(path, errors="replace"):
        m = re.search(r"\[seed\] (\d+) reads seeded in ([\d.]+)s", line)
        if m:
            cur["seed_s"] = float(m.group(2))
        m = re.search(
            r"\[posterior\] setup: positions ([\d.]+)s, scorer streams "
            r"([\d.]+)s", line)
        if m:
            cur["positions_s"] = float(m.group(1))
            cur["streams_s"] = float(m.group(2))
        m = re.search(
            r"\[infer\] k=(\d+) posterior sampled in ([\d.]+)s \((\d+) "
            r"samples\)", line)
        if m:
            k = int(m.group(1))
            st = stages.setdefault(k, {})
            st.update(cur)
            # a restarted stage resamples the same k: keep the later values
            st["sampling_s"] = float(m.group(2))
            st["n_samples"] = int(m.group(3))
            cur = {}
        m = re.search(r"\[infer\] extended to k=(\d+) in ([\d.]+)s", line)
        if m:
            prev = max(stages) if stages else None
            if prev is not None:
                stages[prev]["extend_s"] = float(m.group(2))
                stages[prev]["next_k"] = int(m.group(1))
        if "TRUTH LOST" in line or "TRUTH-PURGE" in line:
            truth_events.append(line.strip())
        if re.search(r"# run_dbgphmm: rc=\d+ attempt=", line):
            restarts += 1
    return stages, restarts, truth_events


def main():
    path = sys.argv[1]
    md = "--md" in sys.argv
    stages, restarts, truth_events = parse(path)
    cols = ["sampling_s", "n_samples", "seed_s", "positions_s", "streams_s",
            "extend_s", "next_k"]
    if md:
        print("| k | " + " | ".join(cols) + " |")
        print("|" + "---|" * (len(cols) + 1))
    total = 0.0
    for k in sorted(stages):
        st = stages[k]
        total += sum(st.get(c, 0.0) for c in cols
                     if c.endswith("_s") and isinstance(st.get(c), float))
        row = [str(st.get(c, "")) for c in cols]
        if md:
            print(f"| {k} | " + " | ".join(row) + " |")
        else:
            print(f"k={k} " + " ".join(f"{c}={v}" for c, v in zip(cols, row)))
    jump = [f"{k}->{st['next_k']}" for k, st in sorted(stages.items())
            if st.get("next_k", k + 1) > k + 1]
    print(f"# stages={len(stages)} restarts={restarts} "
          f"measured_phase_total={total/60:.1f}min multi-k jumps: "
          f"{', '.join(jump) if jump else 'none'}")
    for t in truth_events[:10]:
        print(f"# {t}")


if __name__ == "__main__":
    main()
