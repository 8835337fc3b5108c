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
  * salt× duplication of the (smaller) right side. AQE's skew-join
  * handles moderate skew adaptively; explicit salting is the tool when
  * one key dominates so hard that even a split partition is one task's
  * whole runtime.
  *
  * Semantics: exactly an inner equi-join on `key` (each left row joins
  * the single replica of the right side bearing its salt).
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
