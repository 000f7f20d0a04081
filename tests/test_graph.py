import math

import pytest

from dbgphmm_tpu.graph import DiGraph
from dbgphmm_tpu.graph.compact import compact_simple_paths
from dbgphmm_tpu.graph.euler import euler_circuit, euler_circuit_count
from dbgphmm_tpu.graph.k_shortest import (
    dijkstra_path,
    k_shortest_cycle,
    k_shortest_simple_path,
)
from dbgphmm_tpu.graph.utils import bridge_edges, split_node


def chain_graph(n):
    g = DiGraph()
    for _ in range(n):
        g.add_node(None)
    for i in range(n - 1):
        g.add_edge(i, i + 1, i)
    return g


def test_digraph_basics():
    g = DiGraph()
    a, b, c = g.add_node("a"), g.add_node("b"), g.add_node("c")
    e0 = g.add_edge(a, b, 1)
    e1 = g.add_edge(b, c, 2)
    e2 = g.add_edge(a, c, 3)
    assert g.n_nodes() == 3 and g.n_edges() == 3
    assert g.childs(a) == [(e0, b, 1), (e2, c, 3)]
    assert g.parents(c) == [(e1, b, 2), (e2, a, 3)]
    assert g.find_edge(a, c) == e2
    assert g.find_edge(c, a) is None


def test_remove_edges_maps():
    g = DiGraph()
    for _ in range(4):
        g.add_node(None)
    g.add_edge(0, 1, "a")
    g.add_edge(1, 2, "b")
    g.add_edge(2, 3, "c")
    g2, nm, em = g.remove_edges([1])
    assert g2.n_edges() == 2
    # node 1,2 survive (still used by edges 0 and 2)
    assert set(nm.keys()) == {0, 1, 2, 3}
    assert em == {0: 0, 2: 1}
    assert g2.edge(em[2]) == "c"


def test_scc():
    g = DiGraph()
    for _ in range(5):
        g.add_node(None)
    # cycle 0-1-2, chain to 3, 4 isolated-ish
    g.add_edge(0, 1, None)
    g.add_edge(1, 2, None)
    g.add_edge(2, 0, None)
    g.add_edge(2, 3, None)
    g.add_edge(3, 4, None)
    comps = sorted([sorted(c) for c in g.strongly_connected_components()])
    assert [0, 1, 2] in comps
    assert [3] in comps and [4] in comps


def test_bridge_edges():
    g = DiGraph()
    for _ in range(4):
        g.add_node(None)
    g.add_edge(0, 1, None)
    g.add_edge(1, 0, None)
    eb = g.add_edge(1, 2, None)
    g.add_edge(2, 3, None)
    g.add_edge(3, 2, None)
    assert bridge_edges(g) == [eb]


def test_compact_simple_paths_chain():
    # 0->1->2->3 with fan at 0: expect single edge from 0 to 3
    g = DiGraph()
    for _ in range(5):
        g.add_node(None)
    g.add_edge(0, 1, "a")
    g.add_edge(1, 2, "b")
    g.add_edge(2, 3, "c")
    g.add_edge(3, 4, "d")
    g.add_edge(4, 0, "e")  # make it a cycle so ends are non-trivial
    # all nodes are deg(1,1) -> whole thing is a pure cycle -> one self-loop
    cg, nm = compact_simple_paths(g)
    assert cg.n_nodes() == 1
    assert cg.n_edges() == 1
    path = cg.edge(0)
    assert [w for _e, w in path] == ["a", "b", "c", "d", "e"]


def test_compact_simple_paths_branch():
    # two parallel paths 0->1->2 and 0->3->2 (diamond)
    g = DiGraph()
    for _ in range(4):
        g.add_node(None)
    g.add_edge(0, 1, "a")
    g.add_edge(1, 2, "b")
    g.add_edge(0, 3, "c")
    g.add_edge(3, 2, "d")
    g.add_edge(2, 0, "z")  # close the loop: 0 and 2 are branch nodes
    cg, nm = compact_simple_paths(g)
    assert cg.n_nodes() == 2
    assert cg.n_edges() == 3
    weights = sorted("".join(w for _e, w in cg.edge(e)) for e in range(3))
    assert weights == ["ab", "cd", "z"]


def test_euler_count_simple_cycle():
    # single cycle with copy 1: exactly 1 euler circuit -> log 1 = 0
    g = DiGraph()
    for _ in range(3):
        g.add_node(None)
    g.add_edge(0, 1, None)
    g.add_edge(1, 2, None)
    g.add_edge(2, 0, None)
    assert euler_circuit_count(g, [1, 1, 1]) == pytest.approx(0.0, abs=1e-9)


def test_euler_count_double_cycle():
    # single cycle with copy 2 on each edge:
    # multigraph with 2 parallel copies per position
    g = DiGraph()
    for _ in range(2):
        g.add_node(None)
    g.add_edge(0, 1, None)
    g.add_edge(1, 0, None)
    # For C_2 with each edge doubled: BEST gives det(L+e0e0^T) with L=[[2,-2],[-2,2]]
    # count = log det + sum log(deg-1)! - sum log c! = log(det)+2*log(1!)-2*log(2!)
    lap_det = (2 + 1) * 2 - 4  # = 2
    expect = math.log(lap_det) + 2 * 0.0 - 2 * math.log(2)
    assert euler_circuit_count(g, [2, 2]) == pytest.approx(expect, abs=1e-9)


def test_euler_count_zero():
    g = DiGraph()
    g.add_node(None)
    g.add_node(None)
    g.add_edge(0, 1, None)
    # no euler circuit (not strongly connected with positive edges)
    assert euler_circuit_count(g, [0]) == float("-inf")


def test_euler_extraction():
    # figure-eight: two loops sharing node 0
    g = DiGraph()
    for _ in range(3):
        g.add_node(None)
    e0 = g.add_edge(0, 1, None)
    e1 = g.add_edge(1, 0, None)
    e2 = g.add_edge(0, 2, None)
    e3 = g.add_edge(2, 0, None)
    circ = euler_circuit(g, [1, 1, 1, 1], start=0)
    assert len(circ) == 4
    # valid circuit: consecutive edges connect
    for i in range(4):
        assert g.edge_targets[circ[i]] == g.edge_sources[circ[(i + 1) % 4]]


def test_euler_extraction_multiplicity():
    g = DiGraph()
    g.add_node(None)
    e0 = g.add_edge(0, 0, None)
    circ = euler_circuit(g, [3], start=0)
    assert circ == [e0, e0, e0]


def test_dijkstra():
    g = chain_graph(4)
    cost, path = dijkstra_path(g, 0, 3, lambda e: 1)
    assert cost == 3 and path == [0, 1, 2]
    assert dijkstra_path(g, 3, 0, lambda e: 1) is None


def test_k_shortest_simple_path():
    # diamond with different costs
    g = DiGraph()
    for _ in range(4):
        g.add_node(None)
    e0 = g.add_edge(0, 1, None)
    e1 = g.add_edge(1, 3, None)
    e2 = g.add_edge(0, 2, None)
    e3 = g.add_edge(2, 3, None)
    e4 = g.add_edge(0, 3, None)
    costs = {e0: 1, e1: 1, e2: 2, e3: 2, e4: 10}
    paths = k_shortest_simple_path(g, 0, 3, 3, lambda e: costs[e])
    assert paths[0] == [e0, e1]
    assert paths[1] == [e2, e3]
    assert paths[2] == [e4]


def test_k_shortest_cycle():
    g = DiGraph()
    for _ in range(3):
        g.add_node(None)
    e0 = g.add_edge(0, 1, None)
    e1 = g.add_edge(1, 0, None)
    e2 = g.add_edge(1, 2, None)
    e3 = g.add_edge(2, 0, None)
    cycles = k_shortest_cycle(g, e0, 2, lambda e: 1)
    assert [e0, e1] in cycles
    assert [e0, e2, e3] in cycles


def test_split_node():
    g = DiGraph()
    for _ in range(3):
        g.add_node(None)
    g.add_edge(0, 1, "in")
    g.add_edge(1, 2, "out")
    g2 = split_node(g, 1, "bridge")
    # node 1 replaced by node_in(3), node_out(4)
    assert g2.n_nodes() == 5
    assert g2.n_edges() == 3
    # in-edge targets node_in, out-edge sources node_out
    assert g2.edge_targets[0] == 3
    assert g2.edge_sources[1] == 4
    assert g2.edge(2) == "bridge"
    assert g2.edge_endpoints(2) == (3, 4)


def test_bipartite():
    from dbgphmm_tpu.graph import Bipartite

    bi = Bipartite.from_fn("node7", ["a", "b"], ["x", "y", "z"],
                           lambda i, j: (i, j))
    assert bi.n_in() == 2 and bi.n_out() == 3
    assert bi.in_node(1) == "b" and bi.out_node(2) == "z"
    assert bi.edge(1, 2) == (1, 2)
    assert bi.edge_index(1, 0) == 3
    assert list(bi.iter_edges())[0] == (0, 0, (0, 0))
    import pytest

    with pytest.raises(IndexError):
        bi.edge(2, 0)


def test_shortest_cycle():
    # triangle 0->1->2->0 plus reverse edge 1->0 (ref shortest_cycle.rs test)
    from dbgphmm_tpu.graph import shortest_cycle

    g = DiGraph()
    for _ in range(3):
        g.add_node(None)
    e01 = g.add_edge(0, 1, None)
    e10 = g.add_edge(1, 0, None)
    g.add_edge(1, 2, None)
    g.add_edge(2, 1, None)
    g.add_edge(2, 0, None)
    g.add_edge(0, 2, None)
    # shortest cycle through 0->1 forbidding the direct back edge 1->0:
    # must go 1 -> 2 -> 0
    assert shortest_cycle(g, e01, e10) == [1, 2, 0]
    # allowing it: direct back edge wins
    assert shortest_cycle(g, e01) == [1, 0]
    # no cycle case
    h = DiGraph()
    h.add_node(None)
    h.add_node(None)
    e = h.add_edge(0, 1, None)
    assert shortest_cycle(h, e) is None


def test_native_k_shortest_matches_python():
    """The C++ Yen's kernel reproduces the pure-Python implementation
    exactly (same paths, same order — tie-breaking mirrored)."""
    import random

    from dbgphmm_tpu.graph import k_shortest as ks
    from dbgphmm_tpu.graph.digraph import DiGraph

    lib = ks._load_native()
    assert lib is not None, "native kernel failed to build"

    rng = random.Random(7)
    for trial in range(25):
        g = DiGraph()
        n = rng.randint(4, 24)
        for _ in range(n):
            g.add_node()
        n_e = rng.randint(n, 4 * n)
        for _ in range(n_e):
            g.add_edge(rng.randrange(n), rng.randrange(n))
        costs = [rng.randint(0, 8) for _ in range(n_e)]
        # a couple of BIG-cost edges like the rescue's forced edge
        for e in rng.sample(range(n_e), min(2, n_e)):
            costs[e] = 10**9
        cost_fn = lambda e: costs[e]
        s, t, k = rng.randrange(n), rng.randrange(n), rng.randint(1, 6)

        native = ks.k_shortest_simple_path(g, s, t, k, cost_fn)
        try:
            ks._KLIB = None  # force the Python fallback
            py = ks.k_shortest_simple_path(g, s, t, k, cost_fn)
        finally:
            ks._KLIB = lib
        assert native == py, (trial, s, t, k, native, py)


def test_euler_cache_matches_direct_counts():
    """EulerCache (LU-once + determinant-lemma per candidate) must equal
    euler_circuit_count on neighbor flows of random Eulerian multigraphs,
    including flows that kill edges, resurrect edges, and split/merge
    SCCs."""
    import random

    from dbgphmm_tpu.graph.digraph import DiGraph
    from dbgphmm_tpu.graph.euler import EulerCache, euler_circuit_count

    rng = random.Random(11)
    for trial in range(12):
        g = DiGraph()
        n = rng.randint(3, 10)
        for _ in range(n):
            g.add_node()
        # random circulation: overlay rng cycles so flow is consistent
        cn = None
        edges = {}
        base = [0] * 0
        copy = {}
        for _ in range(rng.randint(2, 5)):
            cyc = [rng.randrange(n) for _ in range(rng.randint(2, n))]
            for a, b in zip(cyc, cyc[1:] + cyc[:1]):
                key = (a, b)
                if key not in edges:
                    edges[key] = g.add_edge(a, b)
                copy[edges[key]] = copy.get(edges[key], 0) + 1
        base = [copy.get(e, 0) for e in range(g.n_edges())]
        cache = EulerCache(g, base, strict=False)
        direct = euler_circuit_count(g, base)
        got = cache.count(base)
        assert abs(got - direct) < 1e-6, (trial, got, direct)
        # neighbor flows: push +-1 around additional cycles
        for _ in range(6):
            cand = list(base)
            cyc = [rng.randrange(n) for _ in range(rng.randint(2, n))]
            delta = rng.choice([1, -1])
            okf = True
            for a, b in zip(cyc, cyc[1:] + cyc[:1]):
                e = edges.get((a, b))
                if e is None:
                    okf = False
                    break
                cand[e] += delta
                if cand[e] < 0:
                    okf = False
                    break
            if not okf:
                continue
            direct = euler_circuit_count(g, cand)
            got = cache.count(cand)
            assert abs(got - direct) < 1e-6, (trial, cand, got, direct)


def test_euler_strict_multi_component_is_neg_inf():
    """Reference semantics (multi_dbg.rs:836, euler.rs:120-124): a positive
    subgraph split into several SCCs has no Eulerian circuit."""
    from dbgphmm_tpu.graph.digraph import DiGraph
    from dbgphmm_tpu.graph.euler import EulerCache, euler_circuit_count

    g = DiGraph()
    for _ in range(4):
        g.add_node()
    # two disjoint 2-cycles
    e = [g.add_edge(0, 1), g.add_edge(1, 0), g.add_edge(2, 3), g.add_edge(3, 2)]
    base = [1, 1, 1, 1]
    assert euler_circuit_count(g, base, allow_multiple_component=False) == float("-inf")
    assert euler_circuit_count(g, base, allow_multiple_component=True) > float("-inf")
    cache = EulerCache(g, base, strict=True)
    assert cache.count(base) == float("-inf")
    # killing one cycle leaves a single SCC -> finite
    single = [1, 1, 0, 0]
    got = cache.count(single)
    want = euler_circuit_count(g, single, allow_multiple_component=False)
    assert abs(got - want) < 1e-9
