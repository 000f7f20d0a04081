"""Multi-host data parallelism over a 2-process CPU mesh.

Each process runs jax.distributed.initialize with 4 virtual CPU devices
(global mesh: 8 devices across 2 "hosts"), loads only its contiguous slice
of the read batch, and the read-sharded total log-likelihood must equal the
single-process value on every host (VERDICT r2 item 10; BASELINE north
star: reads/s scaling 1 chip -> N hosts)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    port, pid = sys.argv[1], int(sys.argv[2])

    from dbgphmm_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", 2, pid)

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from dbgphmm_tpu.ops import forward_scores, pad_reads, to_device
    from dbgphmm_tpu.phmm import PHMMParams
    from dbgphmm_tpu.phmm.model import linear_random_phmm
    from dbgphmm_tpu.seq.random_seq import generate
    import numpy as np

    assert jax.process_count() == 2 and jax.device_count() == 8

    # identical deterministic inputs on every host
    m = linear_random_phmm(120, 3, PHMMParams.default())
    dm = to_device(m, dtype=jnp.float64)
    seq = generate(120, 3)
    reads = [seq[i : i + 60] for i in range(0, 55, 5)]  # 11 reads
    codes, lens = pad_reads(reads)

    mesh = multihost.global_mesh()
    assert mesh.devices.size == 8

    # per-host read loading: keep only this process's slice, zero the rest
    n_dev = 8
    n_pad = -(-codes.shape[0] // n_dev) * n_dev
    codes_g = np.full((n_pad, codes.shape[1]), -1, dtype=codes.dtype)
    lens_g = np.zeros((n_pad,), dtype=lens.dtype)
    codes_g[: codes.shape[0]] = codes
    lens_g[: lens.shape[0]] = lens
    sl = multihost.process_read_slice(codes.shape[0], mesh)
    local_codes = np.full_like(codes_g, -1)
    local_lens = np.zeros_like(lens_g)
    local_codes[sl] = codes_g[sl]
    local_lens[sl] = lens_g[sl]

    total = multihost.distributed_forward_total(dm, local_codes, local_lens, mesh)

    # single-process oracle (local devices only, no sharding)
    scores = forward_scores(dm, jnp.asarray(codes), jnp.asarray(lens), renorm=True)
    expect = float(np.sum(np.asarray(scores)))

    assert abs(total - expect) < 1e-6, (pid, total, expect)
    print(f"OK pid={pid} total={total:.6f}", flush=True)
""")


def test_two_process_cpu_mesh_read_sharding():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"OK pid={i}" in out, out
    # both hosts computed the identical global total
    t0 = outs[0].split("total=")[1].split()[0]
    t1 = outs[1].split("total=")[1].split()[0]
    assert t0 == t1, (t0, t1)


def test_two_process_cli_sample_matches_single(tmp_path):
    """The full `sample` CLI (mappings + posterior sampling + scoring) run
    with --dist across two CPU processes produces the same .post file as a
    single-process run."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo")
    from dbgphmm_tpu.multi_dbg import MultiDbg
    from dbgphmm_tpu.multi_dbg import output as out
    from dbgphmm_tpu.seq.collection import StyledSequence

    h1 = b"TTAGGCTTCGATCGAATGCCAGGTTACGTAGGATCC"
    h2 = b"TTAGGCTTGGATCGAATGCCAGGTTACGTAGGATCC"
    dbg = MultiDbg.from_styled_seqs(8, [StyledSequence.linear(h1), StyledSequence.linear(h2)])
    out.to_dbg_file(dbg, tmp_path / "toy.dbg")
    reads = [h1[2:30], h2[3:33], h1[:28], h2[4:], h1[5:34], h2[:30]]
    with open(tmp_path / "reads.fa", "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r.decode()}\n")

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    base = [
        sys.executable, "-m", "dbgphmm_tpu", "--cpu",
        "sample", "-d", str(tmp_path / "toy.dbg"), "-G", str(len(h1)),
        "-I", "5", str(tmp_path / "reads.fa"),
    ]
    # single-process oracle
    r = subprocess.run(
        base + ["-o", str(tmp_path / "single")],
        capture_output=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stdout.decode() + r.stderr.decode()

    procs = [
        subprocess.Popen(
            base[:3] + [f"--dist=localhost:{port},2,{i}", "--mesh", "1x8"]
            + base[3:] + ["-o", str(tmp_path / f"multi{i}")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"process {i}:\n{outs[i]}"

    import re

    strip_times = lambda s: re.sub(r'"time_[a-z]+":[0-9.e-]+', '"t":0', s)
    single = strip_times((tmp_path / "single.post").read_text())
    assert "samples" in single or single  # non-empty
    for i in range(2):
        multi = strip_times((tmp_path / f"multi{i}.post").read_text())
        assert multi == single
