"""CLI surface tests: drive the actual subcommands in subprocesses
(tiny configs; the full pipeline is covered by test_posterior e2e)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def run_cli(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "dbgphmm_tpu", "--cpu"] + args,
        cwd=cwd, capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root", "JAX_PLATFORMS": "cpu"},
    )


@pytest.fixture(scope="module")
def simdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    r = run_cli(
        ["sim-draft", "-k", "12", "--unit-size", "10", "--n-unit", "4",
         "--end-length", "30", "--div-hap", "0.05", "-C", "12", "-L", "200",
         "-p", "0.001", "-o", "sim"],
        d,
    )
    assert r.returncode == 0, r.stderr + r.stdout
    return d


def test_sim_draft_outputs(simdir):
    for suffix in (".json", ".genome.fa", ".reads.fa", ".reads.sam", ".dbg", ".paths"):
        assert (simdir / f"sim{suffix}").exists(), suffix


def test_sim_infer_end_to_end(simdir):
    r = run_cli(
        ["sim-infer", "sim.json", "-d", "sim.dbg", "-o", "out", "-K", "40",
         "-S", "10", "-p", "0.001", "-I", "10"],
        simdir,
    )
    assert r.returncode == 0, r.stderr + r.stdout
    assert (simdir / "out.final.euler.fa").exists()
    assert (simdir / "out.final.inspect").exists()
    assert "exact=True" in r.stdout


def test_euler_cmd(simdir):
    r = run_cli(["euler", "-d", "out.final.dbg", "assembly.fa"], simdir)
    assert r.returncode == 0, r.stderr
    assert (simdir / "assembly.fa").exists()


def test_table_cmd(simdir):
    r = run_cli(["table", "-d", "sim.dbg", "sim.reads.fa"], simdir)
    assert r.returncode == 0, r.stderr
    assert "total logP" in r.stdout


def test_raw_dbg_cmd(simdir):
    r = run_cli(["raw-dbg", "-k", "12", "-M", "2", "sim.reads.fa", "-g", "raw.gfa"], simdir)
    assert r.returncode == 0, r.stderr
    gfa = (simdir / "raw.gfa").read_text()
    assert gfa.startswith("S\t")


def test_edit_dist_cmd(simdir):
    r = run_cli(["edit-dist", "sim.genome.fa", "out.final.euler.fa"], simdir)
    assert r.returncode == 0, r.stderr
    assert "edit_dist=0" in r.stdout


def test_extend_mapping_cmd(simdir):
    r = run_cli(
        ["extend-mapping", "sim.json", "-d", "sim.dbg", "-K", "16",
         "-p", "0.001", "-o", "em"],
        simdir,
    )
    assert r.returncode == 0, r.stderr + r.stdout
    assert "p_extend=" in r.stdout and "p_true=" in r.stdout
    maps = list(simdir.glob("em.k*.extend.map"))
    assert maps, "no extend.map written"
    # extended mapping must score in the same ballpark as the fresh one
    line = [l for l in r.stdout.splitlines() if l.startswith("k=")][-1]
    fields = dict(f.split("=") for f in line.split() if "=" in f)
    assert float(fields["p_extend"]) <= 0.0
    assert float(fields["p_true"]) <= 0.0


def test_inspect_cmd(simdir):
    r = run_cli(["inspect", "-d", "sim.dbg", "sim.json", "-o", "insp"], simdir)
    assert r.returncode == 0, r.stderr + r.stdout
    lines = [l for l in r.stdout.splitlines() if l.startswith(("orig\t", "true\t"))]
    assert len(lines) == 2
    # both rows carry finite scores; the true row's p >= orig's (draft == truth here)
    p_orig = float(lines[0].split("\t")[1])
    p_true = float(lines[1].split("\t")[1])
    assert p_true >= p_orig - 1e-6
    assert (simdir / "insp.true.map").exists()
