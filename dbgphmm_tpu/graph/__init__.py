"""Host-side graph algorithms (ref: src/graph/ + petgraph/petgraph_algos)."""

from .digraph import DiGraph  # noqa: F401
from . import compact, euler, k_shortest, utils  # noqa: F401
