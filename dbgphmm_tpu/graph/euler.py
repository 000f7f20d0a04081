"""Euler circuit counting (BEST theorem) and extraction (Hierholzer).

Counting follows the reference exactly (ref: src/graph/euler.rs:22-128):
log #EC = log det(L + e0 e0^T) + sum_v log (deg_out(v) - 1)! - sum_e log c(e)!
computed per strongly-connected component, where the graph is a multigraph
given as (edge -> multiplicity c(e)) on a DiGraph.

The log-determinant is the reference's only BLAS call (LAPACK sln_det); here it
is ``numpy.linalg.slogdet`` — on-device ``jnp.linalg.slogdet`` is used by the
posterior scorer when the compact graph is large (see multi_dbg.posterior).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..prob import NEG_INF, log_factorial
from .digraph import DiGraph


def _euler_count_connected(
    node_ids: List[int], edges: List[Tuple[int, int, int]]
) -> float:
    """Count on one SCC. ``edges`` = (source, target, copy_num) with both
    endpoints in node_ids and copy_num > 0."""
    n = len(node_ids)
    if n == 0:
        return 0.0
    rank = {v: i for i, v in enumerate(node_ids)}
    lap = np.zeros((n, n), dtype=np.float64)
    out_deg = np.zeros(n, dtype=np.int64)
    for s, t, c in edges:
        i, j = rank[s], rank[t]
        out_deg[i] += c
        lap[i, j] -= c
    lap[np.arange(n), np.arange(n)] += out_deg
    lap[0, 0] += 1.0
    sign, ln = np.linalg.slogdet(lap)
    # reference behavior (euler.rs:62-66): count = sign * ln, 0 edges -> -inf
    count = 0.0 if ln == NEG_INF else float(sign * ln)
    for i in range(n):
        if out_deg[i] > 0:
            count += log_factorial(int(out_deg[i]) - 1)
    for _s, _t, c in edges:
        count -= log_factorial(c)
    return count


def euler_circuit_count(
    graph: DiGraph, copy_nums: Optional[List[int]] = None, allow_multiple_component: bool = True
) -> float:
    """Log number of Eulerian circuits of the multigraph whose edge ``e`` has
    multiplicity ``copy_nums[e]`` (default: edge weight as int).

    With ``allow_multiple_component`` the result is the product over SCCs
    (ref: euler.rs:92-128).
    """
    if copy_nums is None:
        copy_nums = [int(w) for w in graph.edge_weights]

    # keep only positive edges / nodes with outgoing edges
    pos_edges = [
        (graph.edge_sources[e], graph.edge_targets[e], copy_nums[e])
        for e in range(graph.n_edges())
        if copy_nums[e] > 0
    ]
    live = DiGraph()
    node_of: Dict[int, int] = {}
    back: List[int] = []
    for s, t, c in pos_edges:
        for v in (s, t):
            if v not in node_of:
                node_of[v] = live.add_node(None)
                back.append(v)
        live.add_edge(node_of[s], node_of[t], c)
    # drop nodes without outgoing edges from SCC consideration: Tarjan puts
    # them in singleton comps whose count contribution is 0 edges -> skipped
    if live.n_nodes() == 0:
        return NEG_INF

    sccs = live.strongly_connected_components()
    if not allow_multiple_component and len(sccs) > 1:
        return NEG_INF

    total = 0.0
    for comp in sccs:
        comp_set = set(comp)
        comp_edges = [
            (live.edge_sources[e], live.edge_targets[e], live.edge_weights[e])
            for e in range(live.n_edges())
            if live.edge_sources[e] in comp_set and live.edge_targets[e] in comp_set
        ]
        if not comp_edges:
            continue
        total += _euler_count_connected(sorted(comp_set), comp_edges)
    return total


def euler_circuit(
    graph: DiGraph,
    copy_nums: List[int],
    start: int,
    child_priority: Optional[Dict[int, int]] = None,
) -> List[int]:
    """Extract one Eulerian circuit as an edge list via Hierholzer
    (ref: euler.rs:133-240; deterministic child order via ``child_priority``,
    cf. multi_dbg.rs:594 sorting children by base).

    Each edge ``e`` is traversed exactly ``copy_nums[e]`` times.
    """
    remaining = list(copy_nums)
    # per node: out-edge indices in priority order
    order: Dict[int, List[int]] = {}
    for v in range(graph.n_nodes()):
        es = graph.out_edges(v)
        if child_priority is not None:
            es = sorted(es, key=lambda e: child_priority.get(e, e))
        order[v] = es

    def next_edge(v: int) -> Optional[int]:
        for e in order[v]:
            if remaining[e] > 0:
                return e
        return None

    # Hierholzer: walk until stuck, then splice sub-circuits
    circuit: List[int] = []
    stack_nodes = [start]
    stack_edges: List[int] = []
    while stack_nodes:
        v = stack_nodes[-1]
        e = next_edge(v)
        if e is not None:
            remaining[e] -= 1
            stack_edges.append(e)
            stack_nodes.append(graph.edge_targets[e])
        else:
            stack_nodes.pop()
            if stack_edges:
                circuit.append(stack_edges.pop())
    circuit.reverse()
    assert all(r == 0 for r in remaining), "graph has no Eulerian circuit covering all copies"
    return circuit
