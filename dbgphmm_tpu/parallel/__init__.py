"""Multi-chip scale-out (ref: SURVEY.md section 2.11).

The reference's only parallel axis is a rayon thread pool over reads; here it
becomes SPMD over a ``jax.sharding.Mesh``: read batches are sharded across
chips (data parallel), candidate copy-number assignments across a second mesh
axis, the graph arrays are replicated, and per-read log-likelihoods are
reduced with a ``psum``-backed sum that rides ICI.
"""

from .sharding import (  # noqa: F401
    make_mesh,
    mesh_read_axis_size,
    put_read_sharded,
    put_replicated,
    sharded_candidate_log_likelihoods,
    sharded_forward_total,
)
