package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the dedup
  * CLUSTERING step: near-dup PAIRS (x3/x4/x14 output) → duplicate
  * CLUSTERS, so a curation pipeline can keep exactly one representative
  * per cluster instead of dropping only one side of each pair.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id and repeatedly adopts the minimum label in
  * its closed neighborhood until no label changes. Each round is two
  * hash-partitioned shuffles (edge-label join + groupBy min) over the
  * EDGE list only — nothing is collected to the driver, no per-row
  * windows — and the loop runs O(component diameter) rounds. Near-dup
  * components are small and dense (duplicates of one document all link
  * to each other), so 2–4 rounds close the fixpoint in practice. At
  * extreme diameters swap the edge rewrite for large-star/small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC 2014) — the driver loop and convergence check are
  * identical.
  *
  * The reference has no graph/clustering surface at all; this extends
  * the dedup family (SURVEY §2.2) with the operator that makes pair
  * output actionable.
  *
  * Output: one row per node appearing in `pairs` — (id, cluster) with
  * cluster = minimum reachable node id, a deterministic canonical
  * representative (partitioning-independent).
  */
object ConnectedComponents {

  def clusters(pairs: DataFrame, id1: String, id2: String): DataFrame = {
    // symmetrize with ONE evaluation of `pairs` (an explode, not a
    // union: union's two branches would each re-run the upstream plan —
    // for pair generators like the Jaccard pipeline that doubles the
    // dominant cost)
    val edges0 = pairs.select(explode(array(
        struct(col(id1).as("src"), col(id2).as("dst")),
        struct(col(id2).as("src"), col(id1).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
    val edgesC = graft.core.CacheScope.cached(edges0)
    // seed with what the first propagation round would compute from
    // self-labels anyway — min(id, min direct neighbor) — saving one
    // full iteration (three shuffles); size-2 components (most near-dup
    // clusters) then converge in a single convergence-check round
    var labels = graft.core.CacheScope.cached(
      edgesC.groupBy(col("src").as("id"))
        .agg(least(col("id"), min(col("dst"))).as("label")))
    var changed = 1L
    while (changed > 0) {
      val neighborMin = edgesC
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nmin"))
      // prev label rides along in the same join that computes the new
      // one, so the convergence count needs no second labels join
      val stepped = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label").as("__prev"),
          least(col("label"), coalesce(col("nmin"), col("label")))
            .as("label"))
      val steppedC = graft.core.CacheScope.cached(stepped)
      // one action per round: materializes and counts label moves
      changed = steppedC.filter(col("label") =!= col("__prev")).count()
      labels.unpersist()
      // keep the CACHED frame as the loop variable (a select on top
      // would make the next round's unpersist a no-op and leak cache);
      // downstream joins project (id, label) explicitly
      labels = steppedC
    }
    edgesC.unpersist()
    labels.select(col("id"), col("label"))
  }
}
