"""Bisect the packed-kernel production crash batch to a minimal repro.

Runs scripts/repro_packed_prod.py --stage probe over candidate ranges of
the dumped crash batch, each in its own subprocess (a worker crash kills
the process's backend) with a hard timeout (the fault also manifests as a
device-side HANG, observed round 4).  Classifies each range PASS / CRASH
(rc!=0) / HANG (timeout), then narrows the first failing range.

Usage:
  python scripts/bisect_packed_crash.py [--dir runs/n4] \
      [--file data/repro/pallas_crash_k40_1787256600.npz] [--timeout 600]
"""

import argparse
import subprocess
import sys
import time
from pathlib import Path

PY = sys.executable
ME = Path(__file__).resolve().parent / "repro_packed_prod.py"


def wait_healthy(max_wait=900):
    """Block until a fresh process can run a trivial op on the chip.

    A hung packed launch WEDGES the worker for every client until the
    hanging client process dies plus a cooldown (~5 min observed round 4);
    probing during the wedge classifies innocent ranges as HANG."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            r = subprocess.run(
                [PY, "-c",
                 "import jax, jax.numpy as jnp, numpy as np;"
                 "print(int(np.asarray(jnp.arange(8)+1).sum()))"],
                timeout=120, capture_output=True, text=True,
            )
            if r.returncode == 0 and "36" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"  (worker unhealthy, cooling down... {time.time()-t0:.0f}s)",
              flush=True)
        time.sleep(60)
    return False


def probe(d, f, lo, hi, timeout):
    if not wait_healthy():
        print(f"== [{lo},{hi}) -> SKIP (worker never recovered)", flush=True)
        return "SKIP"
    t0 = time.time()
    try:
        r = subprocess.run(
            [PY, "-u", str(ME), "--dir", d, "--stage", "probe",
             "--cands", "file", "--file", f, "--lo", str(lo), "--hi", str(hi)],
            timeout=timeout, capture_output=True, text=True,
        )
        ok = r.returncode == 0 and "PROBE_OK" in r.stdout
        status = "PASS" if ok else f"CRASH(rc={r.returncode})"
        tail = "\n".join(r.stdout.strip().splitlines()[-3:])
    except subprocess.TimeoutExpired as e:
        status = "HANG"
        tail = "\n".join((e.stdout or "").strip().splitlines()[-3:]) if e.stdout else ""
    print(f"== [{lo},{hi}) -> {status} ({time.time()-t0:.0f}s)\n{tail}",
          flush=True)
    return status


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="runs/n4")
    ap.add_argument("--file",
                    default="data/repro/pallas_crash_k40_1787256600.npz")
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("--lo", type=int, default=0)
    ap.add_argument("--hi", type=int, default=178)
    a = ap.parse_args()

    lo, hi = a.lo, a.hi
    # find the first failing 32-range, then narrow inside it.  A failure is
    # only trusted if it REPRODUCES on a healthy worker (the fault has a
    # stochastic hang mode that can wedge the worker and poison the next
    # probe, so single observations are unreliable).
    fail = None
    for c0 in range(lo, hi, 32):
        c1 = min(c0 + 32, hi)
        st = probe(a.dir, a.file, c0, c1, a.timeout)
        if st != "PASS":
            st2 = probe(a.dir, a.file, c0, c1, a.timeout)
            if st2 != "PASS":
                fail = (c0, c1)
                break
            print(f"== [{c0},{c1}) failure did NOT reproduce — transient",
                  flush=True)
        if st == "SKIP":
            return
    if fail is None:
        print("== all ranges PASS — fault needs whole-batch context",
              flush=True)
        return
    # binary-search the failing range down to one candidate.  Note the
    # probe pads sub-batches by repeating candidate 0 of the range, so a
    # single bad candidate stays present under narrowing.
    c0, c1 = fail
    while c1 - c0 > 1:
        mid = (c0 + c1) // 2
        st = probe(a.dir, a.file, c0, mid, a.timeout)
        if st != "PASS":
            c1 = mid
            continue
        st = probe(a.dir, a.file, mid, c1, a.timeout)
        if st != "PASS":
            c0, c1 = mid, c1
            continue
        print(f"== both halves of [{c0},{c1}) PASS — fault is "
              "combination-dependent; stopping at this range", flush=True)
        break
    print(f"== minimal failing range: [{c0},{c1})", flush=True)


if __name__ == "__main__":
    main()
