import pytest

from dbgphmm_tpu.flow import (
    FlowEdge,
    enumerate_neighboring_flows,
    find_neighboring_flow_by_edge_change,
    flow_to_residue_convex,
    min_cost_flow_convex,
    residue_graph_cycle_to_flow,
    update_cycle_from_str,
    update_cycle_to_str,
    UP,
    DOWN,
)
from dbgphmm_tpu.graph import DiGraph


def sq_cost(target):
    return lambda c: (c - target) ** 2


def two_cycle_net(t0=2.0, t1=2.0, cap=10):
    """Two-node cycle: flow must be equal on both edges."""
    g = DiGraph()
    g.add_node(None)
    g.add_node(None)
    g.add_edge(0, 1, FlowEdge(0, cap, convex_cost=sq_cost(t0)))
    g.add_edge(1, 0, FlowEdge(0, cap, convex_cost=sq_cost(t1)))
    return g


def test_min_cost_flow_simple_cycle():
    # both edges want 2 -> flow = [2, 2]
    assert min_cost_flow_convex(two_cycle_net(2.0, 2.0)) == [2, 2]
    # conflicting targets 1 and 3 -> best circulation is 2,2
    assert min_cost_flow_convex(two_cycle_net(1.0, 3.0)) == [2, 2]


def test_min_cost_flow_demand():
    g = DiGraph()
    g.add_node(None)
    g.add_node(None)
    g.add_edge(0, 1, FlowEdge(3, 10, convex_cost=sq_cost(0.0)))
    g.add_edge(1, 0, FlowEdge(0, 10, convex_cost=sq_cost(0.0)))
    # demand forces flow 3 despite cost preferring 0
    assert min_cost_flow_convex(g) == [3, 3]


def test_min_cost_flow_infeasible():
    g = DiGraph()
    g.add_node(None)
    g.add_node(None)
    g.add_edge(0, 1, FlowEdge(3, 10, convex_cost=sq_cost(0.0)))
    g.add_edge(1, 0, FlowEdge(0, 2, convex_cost=sq_cost(0.0)))
    # edge 0 needs >=3 but return path caps at 2
    assert min_cost_flow_convex(g) is None


def test_min_cost_flow_branching():
    # node 0 -> {1 or 2} -> 3 -> 0; freqs favor path via 1 with copy 2, via 2 with copy 1
    g = DiGraph()
    for _ in range(4):
        g.add_node(None)
    g.add_edge(0, 1, FlowEdge(0, 10, convex_cost=sq_cost(2.0)))
    g.add_edge(1, 3, FlowEdge(0, 10, convex_cost=sq_cost(2.0)))
    g.add_edge(0, 2, FlowEdge(0, 10, convex_cost=sq_cost(1.0)))
    g.add_edge(2, 3, FlowEdge(0, 10, convex_cost=sq_cost(1.0)))
    g.add_edge(3, 0, FlowEdge(0, 10, convex_cost=sq_cost(3.0)))
    assert min_cost_flow_convex(g) == [2, 2, 1, 1, 3]


def test_min_cost_flow_linear_cost():
    # linear costs: prefer cheaper parallel edge
    g = DiGraph()
    g.add_node(None)
    g.add_node(None)
    g.add_edge(0, 1, FlowEdge(0, 5, cost=1.0))
    g.add_edge(0, 1, FlowEdge(0, 5, cost=5.0))
    g.add_edge(1, 0, FlowEdge(2, 2, cost=0.0))
    flow = min_cost_flow_convex(g)
    assert flow == [2, 0, 2]


def test_residue_graph():
    g = two_cycle_net(2.0, 2.0, cap=3)
    flow = [2, 2]
    rg = flow_to_residue_convex(g, flow)
    # each edge has Up (f<cap) and Down (f>0): 4 residual arcs
    assert rg.n_edges() == 4
    ups = [(s, t) for e, s, t, r in rg.edges() if r.direction == UP]
    downs = [(s, t) for e, s, t, r in rg.edges() if r.direction == DOWN]
    assert (0, 1) in ups and (1, 0) in ups
    assert (1, 0) in downs and (0, 1) in downs


def test_enumerate_neighboring_flows():
    g = two_cycle_net(2.0, 2.0, cap=3)
    flow = [2, 2]
    nbrs = enumerate_neighboring_flows(g, flow, max_cycle_size=4, max_flip=0)
    flows = sorted(tuple(f) for f, _ in nbrs)
    # both-up and both-down cycles (flip count 0)
    assert (1, 1) in flows
    assert (3, 3) in flows
    # with max_flip=0, the up+down combination (flip) is excluded:
    assert all(f in [(1, 1), (3, 3)] for f in flows)


def test_enumerate_neighboring_flows_with_flips():
    # diamond: 0->1->2 and 0->2 parallel paths with return 2->0
    g = DiGraph()
    for _ in range(3):
        g.add_node(None)
    g.add_edge(0, 1, FlowEdge(0, 5))
    g.add_edge(1, 2, FlowEdge(0, 5))
    g.add_edge(0, 2, FlowEdge(0, 5))
    g.add_edge(2, 0, FlowEdge(0, 5))
    flow = [1, 1, 1, 2]
    nbrs = enumerate_neighboring_flows(g, flow, max_cycle_size=4, max_flip=2)
    flows = {tuple(f) for f, _ in nbrs}
    # swap flow between the two parallel paths: up one path, down the other
    # (return edge e3 keeps the balance)
    assert (0, 0, 2, 2) in flows
    assert (2, 2, 0, 2) in flows


def test_find_neighboring_flow_by_edge_change():
    g = DiGraph()
    for _ in range(3):
        g.add_node(None)
    g.add_edge(0, 1, FlowEdge(0, 5))
    g.add_edge(1, 2, FlowEdge(0, 5))
    g.add_edge(0, 2, FlowEdge(0, 5))
    g.add_edge(2, 0, FlowEdge(0, 5))
    flow = [0, 0, 1, 1]
    res = find_neighboring_flow_by_edge_change(g, flow, 0, UP, lambda e: 1)
    assert res is not None
    new_flow, update = res
    assert new_flow[0] == 1
    # flow stays consistent: in == out at each node
    assert new_flow in ([1, 1, 0, 1], [1, 1, 2, 1])


def test_update_cycle_string_roundtrip():
    cyc = [(5, UP), (2, DOWN)]
    s = update_cycle_to_str(cyc)
    assert s == "e5+e2-"
    assert update_cycle_from_str(s) == cyc
