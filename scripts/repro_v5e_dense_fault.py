"""Minimal repro / bisect of the v5e dense-scan runtime fault.

Round-2 finding (docs/ACCURACY_NOTES.md): dense forward scans over
[B, n, D] tables with D >= 4 crash the TPU worker ("TPU worker process
crashed") for n somewhere in (32768, 65536]; D=2 is fine at n=100k.  The
dense-compute mapping cutoff DENSE_COMPUTE_MAX_NODES=32768 fences it.

This script minimizes the repro away from the assembler: a bare lax.scan
whose body does the same work shape — D gathers from an [n]-table + a
segment-sum — with no PHMM semantics, then bisects the failing n.

WARNING: a positive repro CRASHES THE TPU WORKER for this process (the
next process gets a fresh worker).  Run it alone, never next to a
production run.  Each probe runs in a SUBPROCESS so the bisect survives
worker crashes.

Usage: python scripts/repro_v5e_dense_fault.py [--probe N D L]
  (no args: bisect n over (32768, 65536] at D=4, then control runs at
   D=2/D=3 and a renorm-free variant to isolate the trigger)
"""

import subprocess
import sys


def probe_cmd(n, D, L, renorm=True, B=8):
    body = f"""
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
n, D, L, B = {n}, {D}, {L}, {B}
rng = np.random.default_rng(0)
parent_idx = jnp.asarray(rng.integers(0, n, (n, D)).astype(np.int32))
parent_logt = jnp.asarray(rng.uniform(-3, 0, (n, D)).astype(np.float32))
emit = jnp.asarray(rng.uniform(-3, 0, (n,)).astype(np.float32))
codes = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.int32))

def step(m, x):
    # the dense PHMM fm shape: D gathers from the [B, n] table + lse
    gath = m[:, parent_idx]              # [B, n, D]
    s = jax.nn.logsumexp(gath + parent_logt[None], axis=-1)
    m1 = s + emit[None] + 0.0 * x[:, None].astype(jnp.float32)
    {"m1 = m1 - jnp.max(m1, axis=1, keepdims=True)" if renorm else "pass"}
    return m1, m1.max(axis=1)

m0 = jnp.zeros((B, n), jnp.float32)
out, tops = jax.lax.scan(step, m0, codes.T)
print("OK", float(np.asarray(tops).sum()))
"""
    return [sys.executable, "-c", body]


def run_probe(n, D, L, renorm=True):
    r = subprocess.run(
        probe_cmd(n, D, L, renorm), capture_output=True, timeout=1800
    )
    ok = r.returncode == 0 and b"OK" in r.stdout
    tail = (r.stdout + r.stderr).decode(errors="replace").strip().splitlines()
    tail = tail[-1][:120] if tail else ""
    print(f"  n={n:>6} D={D} L={L} renorm={renorm}: "
          f"{'OK' if ok else 'CRASH/FAIL'}  ({tail})", flush=True)
    return ok


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        n, D, L = (int(v) for v in sys.argv[2:5])
        sys.exit(0 if run_probe(n, D, L) else 1)

    L = 512  # round-2 crashes reproduced at short scans too; keep it fast
    print("# bisecting failing n at D=4, L=", L)
    lo, hi = 32768, 65536
    assert run_probe(lo, 4, L), "fence floor fails?! fault moved"
    if run_probe(hi, 4, L):
        print("# 65536 now PASSES at D=4 — fault may be fixed in this "
              "runtime; try larger n / the full mapping path")
    else:
        while hi - lo > 1024:
            mid = (lo + hi) // 2 // 1024 * 1024
            if run_probe(mid, 4, L):
                lo = mid
            else:
                hi = mid
        print(f"# boundary: last-good n={lo}, first-bad n={hi} (D=4, L={L})")
    print("# controls:")
    run_probe(49152, 2, L)
    run_probe(49152, 3, L)
    run_probe(49152, 5, L)
    run_probe(49152, 4, L, renorm=False)
    run_probe(49152, 4, 64)


if __name__ == "__main__":
    main()
