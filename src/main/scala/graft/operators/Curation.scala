package graft.operators

import graft.functions.UrlFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-level corpus curation: the blocklist/allowlist pass every
  * web-crawl pipeline runs between URL parsing and content processing.
  *
  * Scale shape: the blocklist is domains (10⁴–10⁷ rows — always tiny
  * next to a 100 TB corpus), so every operation here is one BROADCAST
  * join against the corpus — no corpus shuffle, no skew exposure (a
  * mega-domain like a link farm hits one broadcast-probe partition-local
  * lookup, never a shuffled hot key).
  */
object Curation {

  /** Corpus rows annotated with parsed URL parts and the curation keys:
    * `host`, `registered_domain`, `url_normalized`. Pure map-side
    * projection (codegen'd regexp chain, no UDF) — composes with any
    * downstream filter without breaking pushdown of other predicates.
    */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val host = UrlFunctions.urlHost(u)
    df.withColumn("host", host)
      .withColumn("registered_domain", UrlFunctions.registeredDomain(host))
      .withColumn("url_normalized", UrlFunctions.normalizeUrl(u))
  }

  /** Rows flagged `kept = false` when their registered domain appears in
    * the blocklist (a one-column `domain` frame). Broadcast LEFT join so
    * the flag is auditable; [[filterBlocklisted]] is the drop form and
    * is provably `mark.filter(kept)` minus the bookkeeping columns.
    */
  def markBlocklisted(df: DataFrame, domainCol: String,
      blocklist: DataFrame): DataFrame = {
    val bl = broadcast(blocklist.select(col("domain")).distinct()
      .withColumn("__blocked", lit(true)))
    df.join(bl, df(domainCol) === bl("domain"), "left")
      .withColumn("kept", coalesce(col("__blocked"), lit(false)) === lit(false))
      .drop("domain", "__blocked")
  }

  /** The production drop form: broadcast LEFT ANTI join — rows whose
    * registered domain is blocklisted never survive the probe, nothing
    * corpus-sized shuffles.
    */
  def filterBlocklisted(df: DataFrame, domainCol: String,
      blocklist: DataFrame): DataFrame = {
    val bl = broadcast(blocklist.select(col("domain")).distinct())
    df.join(bl, df(domainCol) === bl("domain"), "left_anti")
  }
}
