"""Connected components, canonicalization, and linking unit tests
(SURVEY.md §2.3 J7, §2.10 D7/D8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from relation_extraction_spark.operators.canonicalize import canonicalize
from relation_extraction_spark.operators.connected_components import (
    connected_components,
)
from relation_extraction_spark.operators.linking import link_mentions
from relation_extraction_spark.sources.dictionary import entity_dictionary


def _components(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.component for r in connected_components(df).collect()}


def test_cc_chain(spark):
    # path graph 1-2-3-4-5 -> one component rooted at 1
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {n: 1 for n in [1, 2, 3, 4, 5]}


def test_cc_two_components_and_star(spark):
    got = _components(spark, [(10, 11), (11, 12), (20, 21), (22, 21), (23, 21)])
    assert {got[10], got[11], got[12]} == {10}
    assert {got[20], got[21], got[22], got[23]} == {20}


def test_cc_duplicate_and_reversed_edges(spark):
    got = _components(spark, [(2, 1), (1, 2), (2, 3), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_driver_and_distributed_paths_agree(spark):
    """The union-find fast path and the alternating-star iterative-join
    path must return identical (node, component) maps."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = sorted(map(tuple, connected_components(df).collect()))
    dist = sorted(
        map(tuple, connected_components(df, driver_threshold=0).collect())
    )
    assert fast == dist


def test_cc_random_graphs_vs_reference(spark):
    """Randomized graphs: both CC paths must match an independent
    pure-Python BFS reference (not union-find — different algorithm,
    so shared-bug risk is low)."""
    import random
    from collections import defaultdict, deque

    def bfs_components(edges):
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        comp, seen = {}, set()
        for start in sorted(adj):
            if start in seen:
                continue
            group, q = [], deque([start])
            seen.add(start)
            while q:
                x = q.popleft()
                group.append(x)
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        q.append(y)
            root = min(group)
            for x in group:
                comp[x] = root
        return comp

    for seed in [1, 2, 3]:
        rng = random.Random(seed)
        n_nodes = rng.randrange(20, 120)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(rng.randrange(10, 200))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        want = bfs_components(edges)
        df = spark.createDataFrame(edges, "src long, dst long")
        for thr in (2_000_000, 0):  # driver path, distributed path
            got = {
                r.node: r.component
                for r in connected_components(df, driver_threshold=thr).collect()
            }
            assert got == want, f"seed={seed} threshold={thr}"


def test_cc_partition_invariance(spark):
    edges = [(i, i + 1) for i in range(0, 50, 2)] + [(i + 1, i + 2) for i in range(0, 48, 2)]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df8 = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    a = sorted(map(tuple, connected_components(df1).collect()))
    b = sorted(map(tuple, connected_components(df8).collect()))
    assert a == b


def test_canonicalize_merges_near_duplicate_forms(spark):
    mentions = spark.createDataFrame(
        [
            ("u1", 0, "Apache Spark", 0, 5),
            ("u2", 0, "apache  spark", 0, 5),
            ("u3", 0, "apache spark engine", 0, 5),
            ("u4", 0, "DuckDB", 0, 5),
        ],
        "url string, sent_id int, mention string, start int, end int",
    )
    linked = spark.createDataFrame(
        [], "url string, sent_id int, mention string, entity_id long, score double"
    )
    entities, mapping = canonicalize(mentions, linked, threshold=0.5)
    canon = {r.form: r.canonical_id for r in mapping.collect()}
    # normalization already folds case/whitespace -> same form
    assert canon["apache spark"] == canon["apache spark engine"]
    assert canon["duckdb"] != canon["apache spark"]
    ents = {tuple(r.surface_forms) for r in entities.collect()}
    assert ("apache spark", "apache spark engine") in ents


def test_canonicalize_dictionary_star_edges(spark):
    """Forms the linker resolved to the same entity merge even when
    string-dissimilar (the Environment's cross-sentence topic merge)."""
    mentions = spark.createDataFrame(
        [("u1", 0, "Big Query Engine", 0, 5), ("u1", 1, "BQE", 0, 3)],
        "url string, sent_id int, mention string, start int, end int",
    )
    linked = spark.createDataFrame(
        [("u1", 0, "Big Query Engine", 77, 0.9), ("u1", 1, "BQE", 77, 0.8)],
        "url string, sent_id int, mention string, entity_id long, score double",
    )
    _, mapping = canonicalize(mentions, linked, threshold=0.9)
    canon = {r.form: r.canonical_id for r in mapping.collect()}
    assert canon["big query engine"] == canon["bqe"]


def test_link_mentions_top1_and_nil(spark):
    dictionary = entity_dictionary(spark)
    sample = dictionary.limit(2).collect()
    assert sample, "dictionary must be non-empty"
    known = sample[0]["alias_norm"]
    mentions = spark.createDataFrame(
        [("u1", 0, known, 0, 5), ("u1", 0, "zz unknown thing", 6, 20)],
        "url string, sent_id int, mention string, start int, end int",
    )
    got = link_mentions(mentions, dictionary)
    rows = {r.mention: r for r in got.collect()}
    assert got.count() == 2  # exactly one row per input mention
    assert rows[known].entity_id is not None and rows[known].score > 0
    assert rows["zz unknown thing"].entity_id is None


def test_link_deterministic_tiebreak(spark):
    """Two candidates with identical score -> smallest entity_id wins."""
    dictionary = spark.createDataFrame(
        [("acme", "acme", 5, 0.5), ("acme", "acme", 3, 0.5)],
        "alias_norm string, canonical_name string, entity_id long, prior double",
    )
    mentions = spark.createDataFrame(
        [("u1", 0, "Acme", 0, 4)],
        "url string, sent_id int, mention string, start int, end int",
    )
    for _ in range(2):
        rows = link_mentions(mentions, dictionary).collect()
        assert len(rows) == 1 and rows[0].entity_id == 3


def test_cc_string_node_ids_both_paths(spark):
    """Non-integer node ids must work on the driver fast path too (its
    output schema is derived from the edge column types — round-1
    advisor finding)."""
    edges = [("apple", "banana"), ("banana", "cherry"), ("x", "y")]
    df = spark.createDataFrame(edges, "src string, dst string")
    fast = {r.node: r.component for r in connected_components(df).collect()}
    dist = {
        r.node: r.component
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert fast == dist
    assert fast == {
        "apple": "apple", "banana": "apple", "cherry": "apple",
        "x": "x", "y": "x",
    }


def test_gexf_export_roundtrip(spark, tmp_path):
    """edges -> GEXF file: well-formed XML, top-weight capping, labels."""
    import xml.etree.ElementTree as ET

    from relation_extraction_spark.sources.gexf import export_gexf

    edges = spark.createDataFrame(
        [(1, 2, "powers", 5), (2, 3, "holds", 3), (3, 1, "feeds", 1)],
        "src_id long, dst_id long, pred string, weight long",
    )
    entities = spark.createDataFrame(
        [(1, ["spark engine"]), (2, ["the <table>"]), (3, ["rows"])],
        "canonical_id long, surface_forms array<string>",
    )
    path = str(tmp_path / "g.gexf")
    xml = export_gexf(edges, entities, path, max_edges=2)
    root = ET.parse(path).getroot()  # parses => well-formed despite <>&
    ns = {"g": "http://gexf.net/1.2"}
    nodes = root.findall(".//g:node", ns)
    edgs = root.findall(".//g:edge", ns)
    assert len(edgs) == 2  # capped to the two heaviest
    assert {e.get("label") for e in edgs} == {"powers", "holds"}
    assert {n.get("label") for n in nodes} == {"spark engine", "the <table>", "rows"}
    assert xml.startswith("<?xml")


def test_gexf_export_string_node_ids(spark, tmp_path):
    """String node ids (first-class in connected_components) must label
    correctly: the lookup frame's id type is derived from the edges
    schema, not hardcoded long (round-2 advisor crash)."""
    import xml.etree.ElementTree as ET

    from relation_extraction_spark.sources.gexf import export_gexf

    edges = spark.createDataFrame(
        [("a", "b", "links", 4), ("b", "c", "cites", 2)],
        "src_id string, dst_id string, pred string, weight long",
    )
    entities = spark.createDataFrame(
        [("a", ["alpha form"]), ("b", ["beta"]), ("c", ["gamma"])],
        "canonical_id string, surface_forms array<string>",
    )
    path = str(tmp_path / "gs.gexf")
    export_gexf(edges, entities, path, max_edges=10)
    root = ET.parse(path).getroot()
    ns = {"g": "http://gexf.net/1.2"}
    labels = {n.get("label") for n in root.findall(".//g:node", ns)}
    assert labels == {"alpha form", "beta", "gamma"}
