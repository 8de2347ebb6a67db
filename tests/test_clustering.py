"""Connected components: parity with union-find, resumability."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from repostcheckerbot_spark.operators.clustering import connected_components, resume_connected_components


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _check(spark, edges, nodes=None):
    e = spark.createDataFrame(edges, ["conv_id_a", "conv_id_b"])
    v = spark.createDataFrame([(n,) for n in nodes], ["conv_id"]) if nodes else None
    got = {r.conv_id: r.cluster_id for r in connected_components(e, vertices=v).collect()}
    all_nodes = nodes or sorted({x for p in edges for x in p})
    want = _union_find(edges, all_nodes)
    assert got == want


def test_chain(spark):
    _check(spark, [("a", "b"), ("b", "c"), ("c", "d")])


def test_two_components_and_singleton(spark):
    _check(spark, [("a", "b"), ("x", "y")], nodes=["a", "b", "x", "y", "lonely"])


def test_random_graphs_match_union_find(spark):
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        nodes = [f"n{i:03d}" for i in range(120)]
        edges = []
        for _ in range(150):
            a, b = rng.sample(nodes, 2)
            edges.append((min(a, b), max(a, b)))
        _check(spark, edges, nodes)


def test_long_path_converges_log_rounds(spark):
    # a path of 200 nodes is the adversarial case for label propagation;
    # star contraction must close it in O(log n) rounds
    nodes = [f"p{i:04d}" for i in range(200)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(199)]
    metrics = []
    e = spark.createDataFrame(edges, ["conv_id_a", "conv_id_b"])
    got = {r.conv_id: r.cluster_id for r in connected_components(e, metrics=metrics).collect()}
    assert set(got.values()) == {nodes[0]}
    rounds = len([m for m in metrics if m["stage"] == "cc"])
    assert rounds <= 12, f"took {rounds} rounds for a 200-path"


def test_checkpoint_and_resume(spark, tmp_path):
    ckpt = str(tmp_path / "cc")
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    e = spark.createDataFrame(edges, ["conv_id_a", "conv_id_b"])
    want = {r.conv_id: r.cluster_id for r in connected_components(e, checkpoint_dir=ckpt).collect()}
    # resume from the persisted state — must reproduce the same assignment
    got = {r.conv_id: r.cluster_id for r in resume_connected_components(spark, ckpt).collect()}
    assert got == want


def test_driver_and_distributed_paths_identical(spark):
    """The bounded union-find fast path and the star-contraction path must
    produce IDENTICAL clusters (same min-id convention, same singleton
    handling)."""
    from pyspark.sql import functions as F

    from repostcheckerbot_spark.operators.clustering import connected_components

    # chain + triangle + isolated pair + singleton vertex
    edges = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y"), ("y", "z"), ("z", "x"), ("p", "q")],
        "conv_id_a string, conv_id_b string",
    )
    verts = spark.createDataFrame([(v,) for v in "bcdxyzpqs"], "conv_id string")
    fast = connected_components(edges, vertices=verts)  # n=6 ≤ threshold
    slow = connected_components(edges, vertices=verts, small_graph_threshold=0)
    f = {r.conv_id: r.cluster_id for r in fast.collect()}
    s = {r.conv_id: r.cluster_id for r in slow.collect()}
    assert f == s
    assert f == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x", "z": "x", "p": "p", "q": "p", "s": "s"}
