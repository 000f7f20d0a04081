"""k-shortest paths and cycles (ref: src/graph/k_shortest.rs).

* :func:`k_shortest_cycle` — heap search with per-node visit cap (used for
  candidate cycle generation, ref: k_shortest.rs:61-110).
* :func:`k_shortest_simple_path` — Yen's algorithm with Dijkstra subroutine
  (ref: k_shortest.rs:119-210, which uses repeated A* with forbidden edges).
"""

from __future__ import annotations

import heapq
from typing import Callable, List, Optional, Set, Tuple

from .digraph import DiGraph


def dijkstra_path(
    graph: DiGraph,
    source: int,
    target: int,
    edge_cost: Callable[[int], int],
    removed_nodes: Optional[Set[int]] = None,
    removed_edges: Optional[Set[int]] = None,
) -> Optional[Tuple[int, List[int]]]:
    """Shortest path source->target as (cost, edge list); None if unreachable.

    Costs must be non-negative. ``removed_*`` implement Yen's spur filtering.
    """
    removed_nodes = removed_nodes or set()
    removed_edges = removed_edges or set()
    if source in removed_nodes:
        return None
    dist = {source: 0}
    prev_edge = {}
    heap = [(0, source)]
    while heap:
        d, v = heapq.heappop(heap)
        if v == target:
            # reconstruct
            path = []
            while v != source:
                e = prev_edge[v]
                path.append(e)
                v = graph.edge_sources[e]
            path.reverse()
            return d, path
        if d > dist.get(v, float("inf")):
            continue
        for e, w, _ in graph.childs(v):
            if e in removed_edges or w in removed_nodes:
                continue
            nd = d + edge_cost(e)
            if nd < dist.get(w, float("inf")):
                dist[w] = nd
                prev_edge[w] = e
                heapq.heappush(heap, (nd, w))
    return None


def k_shortest_simple_path(
    graph: DiGraph,
    source: int,
    target: int,
    k: int,
    edge_cost: Callable[[int], int],
) -> List[List[int]]:
    """Yen's k shortest loopless paths (as edge lists)."""
    first = dijkstra_path(graph, source, target, edge_cost)
    if first is None:
        return []
    paths: List[List[int]] = [first[1]]
    candidates: List[Tuple[int, List[int]]] = []
    seen_cands: Set[Tuple[int, ...]] = set()

    for _ in range(1, k):
        a = paths[-1]
        removed_nodes: Set[int] = set()
        for i in range(len(a)):
            spur_node = graph.edge_sources[a[i]]
            if spur_node in removed_nodes:
                break
            removed_edges: Set[int] = set()
            for p in paths:
                if len(p) > i and p[:i] == a[:i]:
                    removed_edges.add(p[i])
            res = dijkstra_path(
                graph, spur_node, target, edge_cost,
                removed_nodes=removed_nodes, removed_edges=removed_edges,
            )
            if res is not None:
                _, spur_path = res
                cand = a[:i] + spur_path
                key = tuple(cand)
                if key not in seen_cands:
                    seen_cands.add(key)
                    cost = sum(edge_cost(e) for e in cand)
                    heapq.heappush(candidates, (cost, cand))
            removed_nodes.add(spur_node)
        if not candidates:
            break
        _, best = heapq.heappop(candidates)
        paths.append(best)
    return paths


def k_shortest_cycle(
    graph: DiGraph,
    edge: int,
    k: int,
    edge_cost: Callable[[int], int],
    is_joinable: Optional[Callable[[List[int], int], bool]] = None,
) -> List[List[int]]:
    """1st..k-th shortest cycles that start with ``edge``
    (ref: k_shortest.rs:61-110): heap of partial paths, a node may be settled
    at most k times."""
    if is_joinable is None:
        is_joinable = lambda _path, _e: True
    count = [0] * graph.n_nodes()
    source = graph.edge_sources[edge]
    heap: List[Tuple[int, int, List[int]]] = [(edge_cost(edge), 0, [edge])]
    cycles: List[List[int]] = []
    uid = 1
    while heap:
        score, _, path = heapq.heappop(heap)
        u = graph.edge_targets[path[-1]]
        count[u] += 1
        if u == source and count[u] <= k:
            cycles.append(path)
        if count[u] <= k:
            for e, _w, _ in graph.childs(u):
                if is_joinable(path, e):
                    heapq.heappush(heap, (score + edge_cost(e), uid, path + [e]))
                    uid += 1
    return cycles
