package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join hashes rows to tasks by key, so one hot key (a null
  * surrogate, a celebrity user, a default timestamp) lands its entire
  * row set on one task. Salting splits each left key into `salt`
  * sub-keys at random and replicates every right row `salt` times, so
  * the hot key's work spreads across `salt` tasks at the cost of
  * salt× duplication of the (smaller) right side.
  *
  * WHEN TO SALT vs trust the built-ins — the decision rule, measured by
  * the x53 (salted) / x54 (plain) bench pair on a planted 25 %-hot key:
  *  1. If the dim side fits the broadcast threshold, neither applies:
  *     a broadcast join has no shuffle, so there is nothing to skew —
  *     the bench pair pins both sides with `hint("merge")` precisely
  *     because at small SF Spark would broadcast the dim and hide the
  *     question.
  *  2. In a shuffle join, AQE's skew split
  *     (`spark.sql.adaptive.skewJoin`) kicks in when a post-shuffle
  *     partition exceeds `skewedPartitionThresholdInBytes` (256 MB
  *     default) AND the median-ratio test; it splits the hot
  *     PARTITION into chunks that each rescan the matching right
  *     partition. That handles moderate skew with zero user code and
  *     no replication cost — below those thresholds (as at bench SF,
  *     where x54 ≈ x53 minus the salt overhead) salting is pure waste.
  *  3. Explicit salting is the tool PAST AQE's reach: a hot partition
  *     painful enough to serialize the stage but BELOW the 256 MB
  *     split threshold (AQE never engages), one key so hot that even
  *     split chunks bottleneck (AQE splits along map-output
  *     boundaries, so a single mapper's output for the key is its
  *     atom), a sort-merge whose sort itself is the problem, or an
  *     aggregation-after-join where the salt also pre-spreads the
  *     groupBy. The salt count trades hot-task runtime (÷salt) for dim
  *     shuffle volume (×salt) — size it to the ratio of the hot key's
  *     share to a task's fair share. This branch is MEASURED by the
  *     x64 (salted) / x65 (plain) bench pair: 99 % of a 9.5 M-row fact
  *     side on one key with a compute-heavy post-join aggregation —
  *     the ~150 MB hot partition sits under AQE's threshold, the hot
  *     reduce task serializes x65, and the salt buys a steady ~25-35 %
  *     wall-clock win (~2× cold) at sf0.1/local[32].
  *
  * Semantics: exactly an inner equi-join on `key` (each left row joins
  * the single replica of the right side bearing its salt) — x53/x54
  * share one SQL oracle for this reason.
  */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val l = left.withColumn("__salt",
      (pmod(hash(monotonically_increasing_id()), lit(salt))).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
