"""Connected components — the closing step of fuzzy dedup at scale.

Near-dup detection (MinHash/SimHash/embedding pairs) yields EDGES; what a
curation pipeline actually needs is the transitive closure: one cluster id
per document, one canonical survivor per cluster. The reference has no
graph tier at all (its dedup is Postgres ON CONFLICT, reference:
dags/financial_pipeline.py:105-118); this is the (a)-tier composition
Spark lacks natively.

Algorithm: hash-min label propagation. Every vertex starts labeled with
its own id; each round, every vertex adopts the minimum label among itself
and its neighbors; converged when no label changes. Rounds needed = graph
diameter — for near-dup families (small, dense clusters) that is 2-3, and
the classic worst-case fix (large-star/small-star, Kiveris et al., which
contracts paths in O(log n) rounds) is a drop-in upgrade of the loop body
if a pathological chain-shaped graph ever shows up.

Scale shape per round: one shuffle of the edge list joined against the
current labels (sort-merge on vertex id; both sides can be bucketed by id
to make every round exchange-free), one min-aggregate, one labels join.
The only driver-side value is the per-round changed-count that drives
convergence. Labels persist per round (bounded lineage); a 1000-executor
run would localCheckpoint every few rounds to also truncate the DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, component) for the undirected graph of ``edges``; ``component``
    is the smallest vertex id reachable from ``id``.

    ``vertices`` (one ``id_col`` column) adds isolated vertices — pass the
    full corpus so singletons come back as their own component. Edges are
    symmetrized internally; self-loops and duplicates are harmless.

    Deterministic: the fixpoint of min-label propagation is unique
    regardless of partitioning or iteration interleaving.
    """
    # Materialize the (possibly expensive — e.g. a full MinHash pipeline)
    # edge frame ONCE, then symmetrize from the checkpointed blocks: a
    # plain union of two selects over the raw frame would evaluate its
    # lineage twice. No distinct() on the result — duplicate edges cost
    # nothing against the MIN aggregate below, while deduplicating would
    # add a full edge-list shuffle before the first round starts.
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .localCheckpoint()
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nodes = sym.select(F.col("u").alias(id_col)).distinct()
    if vertices is not None:
        nodes = nodes.union(vertices.select(F.col(id_col))).distinct()

    # Eager localCheckpoint per round, NOT persist(): persist caches data
    # but the logical plan still nests one level per iteration — by round
    # ~15 the composed plan OOMs the JVM just rendering itself. Checkpoint
    # truncates lineage so every round plans against a materialized base
    # (a durable `checkpoint()` dir is the multi-executor-failure-safe
    # variant for production runs). `sym` needs no checkpoint of its own:
    # both union branches scan the already-checkpointed edge blocks.
    labels = nodes.select(
        id_col, F.col(id_col).alias("component")
    ).localCheckpoint()
    for _ in range(max_iterations):
        # 1-hop spread: adopt the minimum label among self + neighbors.
        neighbor_min = (
            sym.join(labels, sym["v"] == labels[id_col])
            .groupBy("u")
            .agg(F.min("component").alias("_nbr_min"))
        )
        stepped = labels.join(
            neighbor_min, labels[id_col] == neighbor_min["u"], "left"
        ).select(
            labels[id_col],
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce("_nbr_min", "component")
            ).alias("_step"),
        )
        # pointer jump (path halving): follow the adopted label's OWN label
        # one hop — labels only ever decrease, so this shortcuts chains and
        # turns diameter-round convergence into O(log diameter) (the same
        # idea as union-find path compression / large-star contraction).
        lut = labels.select(
            F.col(id_col).alias("_lid"), F.col("component").alias("_lcomp")
        )
        # carry the OLD label through the join so the convergence check is
        # a column on the checkpointed frame (one cheap scan), not an extra
        # labels⋈labels join job per round.
        new_labels = (
            stepped.join(lut, stepped["_step"] == lut["_lid"], "left")
            .select(
                stepped[id_col],
                F.least(
                    F.col("_step"), F.coalesce("_lcomp", "_step")
                ).alias("component"),
                (
                    F.least(F.col("_step"), F.coalesce("_lcomp", "_step"))
                    < F.col("_old")
                ).alias("_changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter("_changed").count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} "
        "rounds — pathological graph diameter; switch to "
        "large-star/small-star"
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """(doc_id, cluster_id, is_canonical, cluster_size) for every document.

    ``pairs`` is any near-dup pair frame (MinHash, SimHash, embedding —
    they all emit (id_a, id_b)). The canonical survivor is the smallest
    doc_id in the cluster (deterministic); ``filter(is_canonical)`` IS the
    dedup, and ``cluster_size`` is the dedup ratio audit for free. One
    |clusters|-keyed aggregate on top of the component labels."""
    comp = connected_components(
        pairs,
        src=pair_cols[0],
        dst=pair_cols[1],
        vertices=docs.select(F.col(id_col).alias("id")),
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id").alias(id_col),
            F.col("component").alias("cluster_id"),
            (F.col("id") == F.col("component")).alias("is_canonical"),
            "cluster_size",
        )
    )
