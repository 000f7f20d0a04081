"""Reproduce / bisect the TPU worker crash in the packed Pallas scorer at
the n4 production operating point (k=40 draft, n=43,779 full edges,
NC=1240 compact, A=128, B=104, RB=2, G=4).

Observed in the first sim.sh-class run (runs/n4/.../dbgphmm/log): the
initial single-candidate score succeeds, the first rescue batch crashes
the TPU worker ("kernel fault"), and the in-process XLA fallback then
dies because the worker is gone for the whole process.

Stages (each chip stage should run in its own subprocess — a worker crash
kills the process's backend):

  --stage maps   : generate mappings on chip, dump to PREFIX.repro.map.mpz
  --stage prep   : host-only; build template/positions/scorer streams and
                   pickle them (so probes don't pay the 2.5 min rebuild)
  --stage probe  : load pickle, score a candidate batch on chip
                   --cands {init,rescue} --n N --read-blocks RB(optional)
  (default)      : orchestrate maps -> prep -> probe matrix via subprocess

Usage: python scripts/repro_packed_prod.py [--dir runs/n4/H0.01_H00.0002]
"""

import argparse
import pickle
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def load_case(d):
    from dbgphmm_tpu.e2e import Dataset
    from dbgphmm_tpu.multi_dbg import output as out

    ds = Dataset.from_json_file(f"{d}/data.json")
    dbg = out.from_dbg_file(f"{d}/data.dbg")
    return dbg, ds.reads


def stage_maps(d):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from dbgphmm_tpu.multi_dbg import output as out
    from dbgphmm_tpu.multi_dbg.posterior import generate_mappings
    from dbgphmm_tpu.phmm.params import PHMMParams

    dbg, reads = load_case(d)
    t0 = time.time()
    m = generate_mappings(dbg, PHMMParams.uniform(0.0003), reads)
    print(f"# mappings in {time.time()-t0:.1f}s")
    out.to_map_file(dbg, f"{d}/repro.map.mpz", reads, m)
    print("# dumped")


def stage_prep(d):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dbgphmm_tpu.multi_dbg import output as out
    from dbgphmm_tpu.ops.forward import pad_reads
    from dbgphmm_tpu.ops.sparse import pad_mappings, precompute_positions
    from dbgphmm_tpu.phmm.params import PHMMParams
    from dbgphmm_tpu.phmm.template import make_template

    dbg, reads = load_case(d)
    mappings = out.from_map_file(f"{d}/repro.map.mpz")
    params = PHMMParams.uniform(0.0003)
    codes, lens = pad_reads(list(reads))
    tpl = make_template(dbg, params)
    width = max((n.shape[1] for n in mappings.nodes if n.size), default=8)
    t0 = time.time()
    map_nodes = pad_mappings(mappings, codes.shape[1], width)
    positions = precompute_positions(
        map_nodes, tpl.parent_idx, parent_exists=tpl.parent_exists
    )
    print(f"# positions {time.time()-t0:.1f}s (width={width})")
    # build the scorer's streams WITHOUT touching the device
    import dbgphmm_tpu.ops.pallas_mapped as pm

    t0 = time.time()
    scorer = pm.PallasMappedScorer.__new__(pm.PallasMappedScorer)
    # run __init__ but on cpu backend (interpret flag just records backend)
    pm.PallasMappedScorer.__init__(
        scorer, tpl, positions, codes, lens, params, space="packed"
    )
    print(f"# streams {time.time()-t0:.1f}s chunks={len(scorer.chunks)} "
          f"A={scorer.chunks[0].emis.shape[2]} CAND_SUB={scorer.CAND_SUB}")
    base = list(dbg.get_copy_nums())
    with open(f"{d}/repro_streams.pkl", "wb") as f:
        pickle.dump(
            {
                "chunks": scorer.chunks,
                "ltv": scorer.ltv,
                "n_max_gaps": scorer.n_max_gaps,
                "n_reads": scorer.n_reads,
                "CAND_SUB": scorer.CAND_SUB,
                "cl": scorer.cl,
                "renorm_every": scorer.renorm_every,
                "TL": scorer.TL,
                "base_cn": base,
            },
            f,
        )
    print("# pickled")


def make_cands(base, kind, n, seed=0, file=None, lo=None, hi=None):
    rng = np.random.default_rng(seed)
    base = np.asarray(base, dtype=np.int64)
    cands = []
    if kind == "file":
        # the exact in-run batch dumped by posterior._dump_crash_batch on a
        # worker crash; [lo:hi] selects a sub-range for bisection
        arr = np.load(file)["candidates"]
        arr = arr[lo:hi] if (lo is not None or hi is not None) else arr
        return [c.tolist() for c in arr]
    if kind == "init":
        cands = [base.tolist()] * n
    elif kind == "rescue":
        zeros = np.flatnonzero(base == 0)
        nonz = np.flatnonzero(base > 0)
        for i in range(n):
            cn = base.copy()
            # rescue cycle: raise one zero edge + adjust a few others +-1
            if len(zeros):
                cn[zeros[rng.integers(len(zeros))]] += 1
            for e in rng.choice(nonz, size=min(3, len(nonz)), replace=False):
                cn[e] += rng.integers(0, 2) * 2 - 1  # -1 or +1
            cn = np.maximum(cn, 0)
            cands.append(cn.tolist())
    return cands


def stage_probe(d, kind, n, file=None, lo=None, hi=None):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import dbgphmm_tpu.ops.pallas_mapped as pm

    with open(f"{d}/repro_streams.pkl", "rb") as f:
        st = pickle.load(f)
    chunks = st["chunks"]
    cands = make_cands(st["base_cn"], kind, n, file=file, lo=lo, hi=hi)
    sub = st["CAND_SUB"]
    outs = []
    with jax.enable_x64(False):
        for c0 in range(0, len(cands), sub):
            part = list(cands[c0 : c0 + sub])
            part += [part[0]] * (sub - len(part))
            for ci, s in enumerate(chunks):
                A = s.emis.shape[2]
                P_ = max(1, 128 // A)
                eff, linv, _ = pm.pack_eff_tables(s, part, P_, st["cl"], A)
                t0 = time.time()
                out = np.asarray(
                    pm.pallas_mapped_scores_packed(
                        jnp.asarray(eff), jnp.asarray(linv),
                        jnp.asarray(s.lens), jnp.asarray(s.codes),
                        jnp.asarray(s.emis), jnp.asarray(s.numce),
                        jnp.asarray(s.selfp), jnp.asarray(s.prevp),
                        jnp.asarray(s.curp), jnp.asarray(s.dence),
                        st["ltv"], n_max_gaps=st["n_max_gaps"],
                        TL=st["TL"], P=P_, CL=st["cl"],
                        renorm_every=st["renorm_every"],
                    )
                )
                try:
                    ms = jax.devices()[0].memory_stats() or {}
                    hbm = ms.get("bytes_in_use", 0) / 1e9
                except Exception:
                    hbm = -1
                print(f"# probe kind={kind} n={n} sub@{c0} chunk{ci} "
                      f"OK {time.time()-t0:.2f}s "
                      f"finite={np.isfinite(out).mean():.3f} hbm={hbm:.2f}GB")
                outs.append(out)
    print("PROBE_OK")


def stage_prod(d, file=None):
    """Replicate the production k=40 in-process sequence exactly:
    on-chip mapping decode -> positions -> scorer build -> initial score ->
    the full rescue batch.  Round-4 finding: the dumped crash batch passes
    when scored in a fresh process (every 32-range AND the whole batch),
    while production crashed 3/3 — the distinguishing variable is the
    device work that precedes scoring, which this stage reproduces."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from dbgphmm_tpu.multi_dbg.posterior import generate_mappings
    from dbgphmm_tpu.ops.forward import pad_reads
    from dbgphmm_tpu.ops.sparse import pad_mappings, precompute_positions
    from dbgphmm_tpu.phmm.params import PHMMParams
    from dbgphmm_tpu.phmm.template import make_template
    import dbgphmm_tpu.ops.pallas_mapped as pm

    dbg, reads = load_case(d)
    params = PHMMParams.uniform(0.0003)
    t0 = time.time()
    m = generate_mappings(dbg, params, reads)
    print(f"# decode {time.time()-t0:.1f}s", flush=True)
    codes, lens = pad_reads(list(reads))
    tpl = make_template(dbg, params)
    width = max((n.shape[1] for n in m.nodes if n.size), default=8)
    t0 = time.time()
    mn = pad_mappings(m, codes.shape[1], width)
    positions = precompute_positions(
        mn, tpl.parent_idx, parent_exists=tpl.parent_exists
    )
    print(f"# positions {time.time()-t0:.1f}s (width={width})", flush=True)
    t0 = time.time()
    scorer = pm.PallasMappedScorer(
        tpl, positions, codes, lens, tpl.params, space="packed"
    )
    print(f"# scorer {time.time()-t0:.1f}s", flush=True)
    base = list(dbg.get_copy_nums())
    t0 = time.time()
    s0, ok0 = scorer.scores_detailed([base])
    print(f"# initial score {time.time()-t0:.1f}s p={s0[0]:.1f} ok={ok0[0]}",
          flush=True)
    cands = make_cands(base, "file", 0, file=file) if file else [base] * 64
    t0 = time.time()
    sums, ok = scorer.scores_detailed(cands)
    print(f"# batch of {len(cands)} scored {time.time()-t0:.1f}s "
          f"finite={np.isfinite(sums).mean():.3f} ok={ok.mean():.3f}",
          flush=True)
    print("PROD_OK", flush=True)


def orchestrate(d):
    py = sys.executable
    me = str(Path(__file__).resolve())
    if not Path(f"{d}/repro.map.mpz").exists():
        r = subprocess.run([py, me, "--dir", d, "--stage", "maps"])
        if r.returncode:
            print("MAPS_FAILED", r.returncode)
            return
    if not Path(f"{d}/repro_streams.pkl").exists():
        r = subprocess.run([py, me, "--dir", d, "--stage", "prep"])
        if r.returncode:
            print("PREP_FAILED", r.returncode)
            return
    for kind, n in [("init", 1), ("rescue", 32), ("init", 32), ("rescue", 1)]:
        r = subprocess.run(
            [py, me, "--dir", d, "--stage", "probe", "--cands", kind,
             "--n", str(n)],
            timeout=1800,
        )
        print(f"== probe kind={kind} n={n} -> rc={r.returncode}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="runs/n4/H0.01_H00.0002")
    ap.add_argument("--stage", default=None)
    ap.add_argument("--cands", default="init")
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--file", default=None, help="crash-batch .npz for --cands file")
    ap.add_argument("--lo", type=int, default=None)
    ap.add_argument("--hi", type=int, default=None)
    a = ap.parse_args()
    if a.stage == "maps":
        stage_maps(a.dir)
    elif a.stage == "prep":
        stage_prep(a.dir)
    elif a.stage == "probe":
        stage_probe(a.dir, a.cands, a.n, file=a.file, lo=a.lo, hi=a.hi)
    elif a.stage == "prod":
        stage_prod(a.dir, file=a.file)
    else:
        orchestrate(a.dir)
