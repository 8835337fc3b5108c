package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule that swaps the interpreted HOF dot-product
  * pattern for the compiled kernel (unconditional — the compat kernel
  * reproduces the HOF null semantics exactly).
  */
class RewriteSpec extends SparkSpec {

  private def hofDot(an: String, bn: String) = aggregate(
    zip_with(col(an), col(bn),
      (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), _ + _)

  test("HOF dot-product over parquet embeddings is rewritten and exact") {
    val emb = graft.core.Graft.table(spark, sfDir, "embeddings").limit(50)
    val q = emb.as("l").join(emb.as("r"),
        col("l.vec_id") === col("r.vec_id"))
      .select(col("l.vec_id").as("id"),
        hofDot("l.embedding", "r.embedding").as("d"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_vec_dot_hof"),
      s"rule did not fire:\n$optimized")
    // equals the library kernel's normSq on the same vectors
    val expected = emb.select(col("vec_id").as("id"),
        graft.expressions.GraftFunctions.vecNormSq(col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    q.collect().foreach(r =>
      assert(r.getDouble(1) == expected(r.getLong(0))))
  }

  test("rewritten kernel preserves NULL-on-length-mismatch and null elements") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rw").toString
    Seq(
      (1L, Seq[Option[Float]](Some(1f), Some(2f)),
        Seq[Option[Float]](Some(3f), Some(4f))),
      (2L, Seq[Option[Float]](Some(1f), Some(2f)),
        Seq[Option[Float]](Some(3f), Some(4f), Some(5f))), // length mismatch
      (3L, Seq[Option[Float]](Some(1f), None),
        Seq[Option[Float]](Some(3f), Some(4f)))            // null element
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val q = df.select(col("id"), hofDot("a", "b").as("d")).orderBy(col("id"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_vec_dot_hof"))
    val rows = q.collect()
    assert(rows(0).getDouble(1) == 11.0)
    assert(rows(1).isNullAt(1))
    assert(rows(2).isNullAt(1))
  }
}
