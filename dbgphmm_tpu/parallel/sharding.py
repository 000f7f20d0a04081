"""Mesh construction and read/candidate-sharded likelihood evaluation.

Design (cf. BASELINE.json north star):

* mesh axes: ``("cand", "reads")`` — neighbor candidates x read batches
* graph/transition arrays: replicated (the k-DBG transition structure is
  small relative to HBM; shard only if it outgrows a chip)
* read codes/lens: sharded along ``reads``
* per-candidate arrays: sharded along ``cand``
* the only cross-device reduction the algorithm needs is the sum of per-read
  log-likelihoods into each candidate's score — XLA lowers the ``jnp.sum``
  over the sharded axis to a psum over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.forward import DeviceModel, forward_scores


def make_mesh(
    n_devices: Optional[int] = None, cand_axis: int = 1
) -> Mesh:
    """Create a ("cand", "reads") mesh over available devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = np.array(devs[:n_devices]).reshape(cand_axis, n_devices // cand_axis)
    return Mesh(devs, axis_names=("cand", "reads"))


def mesh_read_axis_size(mesh: Mesh, flat: bool = False) -> int:
    """Number of shards along the read axis.  ``flat=True`` counts the whole
    mesh (read-only workloads shard over every device)."""
    if flat:
        return mesh.shape["cand"] * mesh.shape["reads"]
    return mesh.shape["reads"]


def _put_sharded(sharding, arr):
    """device_put that also works on a multi-process (multi-host) mesh:
    every host passes the full logical array and materializes only its
    addressable shards via the callback path."""
    if jax.process_count() > 1:
        a = np.asarray(arr)
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx: a[idx]
        )
    return jax.device_put(jnp.asarray(arr), sharding)


def put_read_sharded(mesh: Mesh, arr, axis: int, flat: bool = True):
    """device_put an array sharded along its read axis (all mesh devices when
    ``flat``, else only the "reads" axis).  The array's read dimension must
    already be padded to a multiple of the shard count."""
    spec = [None] * np.asarray(arr).ndim
    spec[axis] = ("cand", "reads") if flat else "reads"
    return _put_sharded(NamedSharding(mesh, P(*spec)), arr)


def put_replicated(mesh: Mesh, tree):
    repl = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(lambda a: _put_sharded(repl, a), tree)
    return jax.device_put(tree, repl)


def gather_to_host(x) -> np.ndarray:
    """np.asarray for possibly-multi-host-sharded outputs: allgathers the
    non-addressable shards over DCN first (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _pad_to_multiple(arr: np.ndarray, m: int, axis: int, fill):
    n = arr.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


def sharded_forward_total(
    dm: DeviceModel,
    codes: np.ndarray,
    lens: np.ndarray,
    mesh: Mesh,
) -> float:
    """Total log P(R | model) with reads sharded across the mesh.

    Pads the read batch to a multiple of the reads-axis size, placing
    zero-length dummy reads (score contribution exp(-inf) -> excluded via
    masking on length>0).
    """
    n_shard = mesh.shape["reads"] * mesh.shape["cand"]
    codes = _pad_to_multiple(np.asarray(codes), n_shard, 0, -1)
    lens_p = _pad_to_multiple(np.asarray(lens), n_shard, 0, 0)

    # flatten mesh for pure read-sharding: shard over both axes
    read_sharding = NamedSharding(mesh, P(("cand", "reads")))
    repl = NamedSharding(mesh, P())

    codes_d = jax.device_put(jnp.asarray(codes), read_sharding)
    lens_d = jax.device_put(jnp.asarray(lens_p), read_sharding)
    dm_d = jax.device_put(dm, repl)

    @jax.jit
    def total(dm, codes, lens):
        scores = forward_scores(dm, codes, lens, renorm=True)
        return jnp.sum(jnp.where(lens > 0, scores, 0.0))

    return float(total(dm_d, codes_d, lens_d))


def sharded_candidate_log_likelihoods(
    dms: Sequence[DeviceModel],
    codes: np.ndarray,
    lens: np.ndarray,
    mesh: Mesh,
) -> np.ndarray:
    """[n_candidates] total log-likelihoods with candidates sharded along
    ``cand`` and reads along ``reads``.

    All candidates must share topology (same emission/parent_idx/child_idx);
    only probabilities differ.
    """
    C = len(dms)
    n_cand_shard = mesh.shape["cand"]
    n_read_shard = mesh.shape["reads"]

    base = dms[0]
    init = np.stack([np.asarray(d.init_logp) for d in dms])
    plogt = np.stack([np.asarray(d.parent_logt) for d in dms])
    clogt = np.stack([np.asarray(d.child_logt) for d in dms])
    # pad candidate axis
    init = _pad_to_multiple(init, n_cand_shard, 0, 0.0)
    plogt = _pad_to_multiple(plogt, n_cand_shard, 0, 0.0)
    clogt = _pad_to_multiple(clogt, n_cand_shard, 0, 0.0)

    codes = _pad_to_multiple(np.asarray(codes), n_read_shard, 0, -1)
    lens_p = _pad_to_multiple(np.asarray(lens), n_read_shard, 0, 0)

    cand_sharding = NamedSharding(mesh, P("cand"))
    read_sharding = NamedSharding(mesh, P(None, "reads"))
    repl = NamedSharding(mesh, P())

    init_d = jax.device_put(jnp.asarray(init), cand_sharding)
    plogt_d = jax.device_put(jnp.asarray(plogt), cand_sharding)
    clogt_d = jax.device_put(jnp.asarray(clogt), cand_sharding)
    codes_d = jax.device_put(jnp.asarray(codes)[None], read_sharding)
    lens_d = jax.device_put(jnp.asarray(lens_p)[None], read_sharding)
    dm_d = jax.device_put(base, repl)

    @jax.jit
    def all_scores(dm, init_b, plogt_b, clogt_b, codes_b, lens_b):
        def one(init_logp, parent_logt, child_logt):
            dmc = dataclasses.replace(
                dm, init_logp=init_logp, parent_logt=parent_logt,
                child_logt=child_logt,
            )
            scores = forward_scores(dmc, codes_b[0], lens_b[0], renorm=True)
            return jnp.sum(jnp.where(lens_b[0] > 0, scores, 0.0))

        return jax.vmap(one)(init_b, plogt_b, clogt_b)

    out = all_scores(dm_d, init_d, plogt_d, clogt_d, codes_d, lens_d)
    return np.asarray(out)[:C]
