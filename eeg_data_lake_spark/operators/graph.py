"""Connected components by iterative min-label propagation — the
clustering step that turns near-duplicate PAIRS into dedup GROUPS
(every doc in a component keeps one representative).

Algorithm: every node starts labeled with its own id; each round,
every node takes the min label among itself and its neighbors; stop
at fixpoint. Rounds needed ≈ graph diameter (near-dup graphs are
shallow — dup clusters are cliques or short chains), and each round
is one shuffle (groupBy node), so the 100 TB cost is
O(diameter × shuffle(|E|)). The driver only sees a one-row changed
count per round (the classic large-scale CC formulation; GraphFrames
implements the same loop, which this repo avoids depending on).

Convergence is guaranteed: labels are monotonically non-increasing
per node and bounded below by the component min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Return (node, component) for every node appearing in ``edges``;
    component = min node id reachable. Undirected.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` rounds (components with diameter > max_iter would
    otherwise silently split into several labels). Rounds needed equal
    the graph diameter; near-dup graphs are shallow, so hitting the
    cap means the input is not the expected dup-cluster shape — raise
    ``max_iter`` explicitly for genuinely deep graphs."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    # Iterative loops MUST truncate lineage each round: without it the
    # logical plan nests one level per iteration and Catalyst
    # analysis/optimization time grows super-linearly (a 12-node chain
    # took minutes). localCheckpoint materializes the round's result
    # and restarts the plan from it — the standard fix (cluster jobs
    # with unreliable executors should use checkpoint() on durable
    # storage instead).
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter); labels would be partial — "
        "raise max_iter for deep graphs"
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iters`` rounds of power iteration over the
    undirected graph — the influence/centrality companion to
    connected_components (CC answers "which cluster"; PageRank answers
    "which node matters most within it", e.g. the most-connected
    near-duplicate to keep as the canonical representative, or hub
    documents in a citation/link corpus).

    Same distributed loop discipline as CC: each round is one shuffle
    (contributions grouped by destination), lineage is truncated per
    round with localCheckpoint, and the driver never sees node data.
    Fixed iteration count (PageRank converges geometrically at rate
    ``damping``; 10 rounds ≈ 0.85^10 < 0.2 residual, the usual
    analytics setting) keeps the result deterministic. Dangling nodes
    cannot exist in the symmetrized edge list (every node has the
    edges it came with), so no dangling-mass correction is needed."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # deg is loop-invariant and consumed twice per round (the contrib
    # join and the ranks rebuild): checkpoint it once like sym/ranks,
    # or every iteration re-runs the degree shuffle from scratch twice
    deg = (
        sym.groupBy("a")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=True)
    )
    ranks = (
        deg.select("a", F.lit(1.0).alias("rank"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        contribs = (
            sym.join(ranks.join(deg, "a"), "a")
            .select(F.col("b").alias("a"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("a")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            deg.select("a")
            .join(contribs, "a", "left")
            .select(
                "a",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("csum"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("a").alias("node"), "rank")


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) — the third iterative graph op next to
    connected_components and pagerank, and the one that splits DENSE
    near-dup neighborhoods into communities where CC would fuse
    everything reachable into one blob (CC answers "is there any
    path"; LPA answers "where is the mass").

    Each round every node adopts the label most frequent among its
    neighbors AND itself (the self-inclusive variant — the self-vote
    damps the synchronous 2-cycle classic LPA exhibits on bipartite
    structures, e.g. a single edge oscillating forever), ties broken
    by MIN label — the deterministic variant (classic LPA breaks ties
    randomly; a seeded tie would still be partitioning-dependent, min
    is not). Synchronous update with a fixed round count: LPA still
    has no guaranteed fixpoint in general, so a cap, not a convergence
    test, is the textbook stopping rule.

    Cost per round: one join of edges to labels + one
    (node, label)-count shuffle + one per-node argmax — all keyed
    shuffles, no driver data path; lineage truncated per round like
    the CC loop.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = sym.join(labels, sym.b == labels.node).select(
            F.col("a").alias("node"), F.col("label")
        )
        votes = (
            nbr.unionByName(labels.select("node", "label"))  # self-vote
            .groupBy("node", "label")
            .agg(F.count("*").alias("n"))
        )
        # per-node argmax: most neighbor votes, then min label
        best = votes.groupBy("node").agg(
            F.min(
                F.struct((-F.col("n")).alias("neg_n"), F.col("label"))
            ).alias("s")
        )
        labels = best.select(
            "node", F.col("s.label").alias("label")
        ).localCheckpoint(eager=True)
    return labels
