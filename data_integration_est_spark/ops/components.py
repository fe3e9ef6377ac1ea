"""Connected components over a pair list — dup-cluster resolution.

Pair-generating dedup (MinHash/LSH, SimHash, embedding near-dup) emits
EDGES; a pipeline needs the transitive closure — duplicate CLUSTERS — to
keep one representative per group (A~B and B~C must collapse A,B,C
together even though (A,C) was never a candidate pair).  The reference
has no analogue; this is the resolution step of the engine's dedup
suite.

Algorithm: iterative min-label propagation.  Every vertex starts
labelled with its own id; each round every vertex adopts the minimum
label in its closed neighborhood; fixpoint = components labelled by
their minimum member.  Rounds needed = O(component diameter) — near-dup
graphs are dense star/clique-ish (tiny diameters), so 3-5 rounds
typically close.  Each round is ONE shuffle (groupBy vertex) over the
edge list; the driver checks convergence via a changed-label count.
This is the label-propagation half of the Kiveris et al. "Connected
Components in MapReduce" family; the alternating-star optimization is
unnecessary at near-dup diameters.

Scale notes: state per round is O(V) labels + O(E) edges, both
hash-partitioned; labels are persisted per round and the previous
round's cache is released, so lineage stays O(1) deep.  ``max_iter``
bounds pathological chains (a 100 TB corpus with a diameter-1M dup
chain is a data bug, not a workload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.util import local_df
from data_integration_est_spark.util import plan_uses_cache as _plan_uses_cache


def _driver_union_find(rows, vertex_type):
    """Exact union-find (path compression + union by size) over a
    collected edge list; components relabelled by their minimum member —
    identical output to the distributed fixpoint."""
    parent: dict = {}
    size: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        for v in (a, b):
            if v not in parent:
                parent[v] = v
                size[v] = 1
        ra, rb = find(a), find(b)
        if ra != rb:
            if size[ra] < size[rb]:
                ra, rb = rb, ra
            parent[rb] = ra
            size[ra] += size[rb]
    min_label: dict = {}
    for v in parent:
        r = find(v)
        if r not in min_label or v < min_label[r]:
            min_label[r] = v
    return [(v, min_label[find(v)]) for v in parent]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    edges_per_partition: int = 100_000,
    driver_max_edges: int = 200_000,
) -> DataFrame:
    """Component labels for every vertex appearing in ``edges``
    (undirected; self-loops and duplicate pairs are fine).  Vertex ids
    may be any orderable type (numeric, string hash/URL, ...).  Returns
    (vertex, component) with ``component`` = the minimum vertex id in the
    component.  Raises if ``max_iter`` rounds don't reach the fixpoint.

    ``edges_per_partition`` sizes the per-round shuffles to the graph
    (see below); lower it for wide rows or memory-tight executors, raise
    it when the scheduler overhead of many small tasks dominates.

    When the deduplicated edge list fits ``driver_max_edges`` (after the
    count the loop needs anyway), the closure is solved by an exact
    driver-side union-find instead: one collect replaces O(diameter)
    shuffle rounds + per-round convergence jobs.  Verified near-dup pair
    lists are SPARSE relative to the corpus (the candidate join already
    pruned), so this is the common case even at large corpus scale; the
    distributed fixpoint remains the path for genuinely huge edge lists.
    Pass 0 to force the distributed path."""
    # the symmetrization union reads ``edges`` TWICE (once per
    # direction): when the edge pipeline is NOT already cache-fed,
    # persist the narrow two-column projection first so an expensive
    # lazy lineage (Arrow decode + phash + band join in the media path)
    # computes once, not twice (r17 — the same double-evaluation class
    # the r16 continuation swept).  Cache-fed callers (dedup_corpus's
    # persisted verified-pair list) skip the redundant persist.  The
    # handle is released as soon as ``sym`` is materialized below.
    base = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    base_handle = None
    if not _plan_uses_cache(base):
        base = base.persist()
        base_handle = base
    sym = (
        base
        .union(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .persist()
    )
    # size the per-round shuffles to the GRAPH, not the session default:
    # each round is a tiny keyed shuffle over O(E) rows, and 32 near-empty
    # partitions × several rounds is pure scheduler overhead on small
    # graphs (measured 4-7 s for a 1k-edge graph).  ~edges_per_partition
    # edge rows per partition; large graphs keep the session parallelism.
    n_edges = sym.count()
    if base_handle is not None:
        base_handle.unpersist()
    if n_edges <= driver_max_edges:
        from pyspark.sql.types import StructField, StructType

        vtype = sym.schema["a"].dataType
        labels_rows = _driver_union_find(
            [(r["a"], r["b"]) for r in sym.collect()], vtype
        )
        sym.unpersist()
        schema = StructType([
            StructField("vertex", vtype, False),
            StructField("component", vtype, False),
        ])
        return local_df(edges.sparkSession, sorted(labels_rows), schema)
    default_parts = sym.rdd.getNumPartitions()
    parts = max(1, min(default_parts, n_edges // edges_per_partition + 1))
    if parts < default_parts:
        resized = sym.repartition(parts, "b").persist()
        resized.count()  # materialize before dropping the source cache
        sym.unpersist()
        sym = resized
    # localCheckpoint (not plain persist): each round's plan nests the
    # previous round's ENTIRE logical plan — caching stores the data but
    # not a truncated plan, so 10+ rounds (a diameter-10 chain) explode
    # the analyzer exponentially (measured: OOM at ~12 rounds).
    # Checkpointing truncates lineage to the materialized partitions,
    # keeping every round's plan O(1).
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .repartition(parts, "vertex")  # co-partition with every later round
        .localCheckpoint(eager=True)
    )

    # fixpoint signal, two exact variants by vertex type:
    # - numeric ids: labels only ever DECREASE (min-aggregation), so the
    #   decimal label sum is an exact signal — unchanged sum <=> no label
    #   moved.  ONE cheap agg job per round.
    # - anything else (string doc hashes/URLs, ...): the decimal cast
    #   would NULL out and falsely converge after one round (ADVICE r4),
    #   so compare against the previous labels directly — both sides are
    #   hash-partitioned on vertex, so the join adds no extra shuffle.
    from pyspark.sql.types import NumericType

    numeric_ids = isinstance(labels.schema["vertex"].dataType, NumericType)
    sum_expr = F.sum(F.col("component").cast("decimal(38,0)"))
    prev_sum = labels.agg(sum_expr).collect()[0][0] if numeric_ids else None

    for _ in range(max_iter):
        # candidate labels: own current label + each neighbor's label
        neigh = (
            sym.join(labels.withColumnRenamed("vertex", "b"), "b")
            .select(F.col("a").alias("vertex"), "component")
        )
        new_labels = (
            labels.select("vertex", "component").union(neigh)
            .repartition(parts, "vertex")
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        if numeric_ids:
            new_sum = new_labels.agg(sum_expr).collect()[0][0]
            converged = new_sum == prev_sum
            prev_sum = new_sum
        else:
            converged = (
                new_labels.alias("n")
                .join(labels.alias("o"), "vertex")
                .filter(F.col("n.component") != F.col("o.component"))
                .isEmpty()
            )
        try:  # release the previous round's checkpointed partitions
            labels.rdd.unpersist(False)
        except Exception:
            pass
        labels = new_labels
        if converged:
            sym.unpersist()
            return labels
    sym.unpersist()
    try:
        labels.rdd.unpersist(False)
    except Exception:
        pass
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iter} rounds — "
        "component diameter exceeds the bound (likely a degenerate "
        "chain); raise max_iter explicitly if this is intended"
    )


def dedup_keep_representative(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
    left_col: str = "id_l",
    right_col: str = "id_r",
) -> DataFrame:
    """Collapse duplicate clusters: resolve components over the pair
    list, then keep the minimum-id member of each cluster (plus every
    doc that appears in no pair).  The keep-one-per-group step every
    pair-based dedup pipeline ends with."""
    comp = connected_components(dup_pairs, src=left_col, dst=right_col)
    drop = comp.filter(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
