"""Distributed connected components over a pair graph — the shared core
of cluster-granularity dedup (text near-dup clusters, perceptual-hash
image clusters).

Iterative min-label propagation PLUS pointer jumping (each round also
replaces a node's label with its label's label), so rounds needed is
O(log diameter), not O(diameter). Convergence is a cheap filter-count
over checkpointed rows every round; exhausting the round budget without
converging raises rather than silently returning partial labels.

Extracted verbatim from ``queries/text.py::q_doc_dup_clusters`` (round 4;
the measured notes on loop sizing and lineage truncation live with the
code below) so the multimodal dedup family can reuse it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CC_MAX_ROUNDS = 20  # with pointer jumping this covers diameter ~2^20


def min_label_components(spark: SparkSession, pairs: DataFrame,
                         max_rounds: int = CC_MAX_ROUNDS) -> DataFrame:
    """Label every node of the undirected pair graph with the smallest
    node id reachable from it. ``pairs`` is (d1, d2); returns
    (doc_id, etiqueta) for every node that appears in a pair."""
    edges0 = (pairs.select("d1", "d2")
              .unionByName(pairs.select(F.col("d2").alias("d1"),
                                        F.col("d1").alias("d2")))
              .distinct().cache())
    # right-size the loop's parallelism to the graph: the pair graph is a
    # small fraction of the corpus (near-dups), and every round shuffles
    # it several times — at the session's default partition count most
    # loop tasks are empty scheduling overhead (measured 2x the wall of a
    # sized loop at sf0.1). localCheckpoint pins partitioning across
    # rounds, so AQE cannot coalesce it away; size it once up front.
    n_part = max(4, min(int(spark.conf.get("spark.sql.shuffle.partitions")),
                        edges0.count() // 50_000 + 1))
    edges = edges0.repartition(n_part, "d1").cache()
    edges.count()  # materialize before dropping the pre-repartition cache
    edges0.unpersist()
    # seed = round-1 min-propagation, fused into node extraction: the node
    # set needs one d1 shuffle either way (distinct vs groupBy are the same
    # hash-aggregate), so folding min(d2) into it pre-applies the first
    # propagation step for free — star/pair components (the bulk of a
    # near-dup graph) then converge one full loop round (3 joins + a
    # checkpoint + a count) earlier. Measured at sf0.1 (alternating A/B,
    # min-of-4): rounds drop exactly 1 on every family member
    # (doc_dup_clusters 3->2, multimodal_phash_clusters 5->4) and the
    # six CC-family queries run 0.80-0.91x, 18.0 -> 15.5 s total.
    labels = (edges.groupBy(F.col("d1").alias("doc_id"))
              .agg(F.least(F.col("d1"), F.min("d2")).alias("etiqueta"))
              .cache())
    converged = False
    for _ in range(1, max_rounds + 1):
        neighbor_min = (
            edges.join(labels, edges.d2 == labels.doc_id)
            .groupBy(F.col("d1").alias("doc_id"))
            .agg(F.min("etiqueta").alias("_nb_min"))
        )
        stepped = (
            labels.join(neighbor_min, "doc_id", "left")
            .select("doc_id", F.col("etiqueta").alias("_prev"),
                    F.least("etiqueta",
                            F.coalesce("_nb_min", F.col("etiqueta")))
                    .alias("etiqueta"))
        )
        # pointer jumping: labels only ever point at other member doc_ids,
        # and min-propagation is monotone, so label(label(x)) <= label(x)
        parents = stepped.select(F.col("doc_id").alias("_p_id"),
                                 F.col("etiqueta").alias("_p_lab"))
        updated = (
            stepped.join(parents, stepped.etiqueta == parents._p_id, "left")
            .select("doc_id", "_prev",
                    F.least("etiqueta",
                            F.coalesce("_p_lab", F.col("etiqueta")))
                    .alias("etiqueta"))
            # truncate the iterative lineage EVERY round: the pointer jump
            # references the previous generation three times, so plan size
            # grows ~3^rounds without a hard cut and Catalyst analysis time
            # dwarfs the actual label shuffles (measured 63s/round by round
            # 4 at 40k docs with a 5-round cut). The checkpoint materializes
            # |labels| rows — same cost class as the cache it replaces.
            .localCheckpoint()
        )
        # convergence: `_prev` (the round-start label) carried through the
        # checkpoint makes the check a filter-count over already-
        # materialized rows — no join against the previous generation, so
        # it is cheap enough to run EVERY round. A round that moves nothing
        # is a true fixed point: propagation-fixed on a connected component
        # forces the label constant across every edge (label(x)<=label(y)
        # both ways), i.e. full convergence; the jump is then the identity.
        changed = updated.filter("etiqueta != _prev").count()
        labels.unpersist()  # superseded generation — don't pin executor memory
        labels = updated.drop("_prev")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"min_label_components: min-label propagation did not converge "
            f"in {max_rounds} rounds — component diameter exceeds "
            f"2^{max_rounds}? Inspect the pair graph before trusting labels.")
    return labels
