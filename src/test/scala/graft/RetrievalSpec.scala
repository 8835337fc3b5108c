package graft

import graft.operators.{Dedup, Retrieval, Sampling}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Operator-level properties for the retrieval / sampling /
  * decontamination operators — hand-computed fixtures and invariants the
  * SQL oracles can't express (stability across partitionings, exact
  * per-group sample counts, planted contamination).
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("tfIdfTopTerms: hand-computed fixture, integer-exact ranking") {
    // 4 docs; 'rare' appears in 1, 'common' in all
    val df = docsDf(
      1L -> "common rare common",
      2L -> "common common",
      3L -> "common x",
      4L -> "common y")
    val got = Retrieval.tfIdfTopTerms(df, "doc_id", "text", topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      .groupBy(_._1)
    // doc 1: 'rare' idf = ln(5/2) > 'common' idf = ln(5/5)=0 even at tf 2
    val d1 = got(1L).sortBy(-_._4)
    assert(d1.head._2 == "rare")
    assert(d1.head._4 == math.floor(math.log(5.0 / 2.0) * 1e8) / 1e8)
    // 'common' everywhere has idf ln(1)=0 → score exactly 0
    got.values.flatten.filter(_._2 == "common").foreach(t =>
      assert(t._4 == 0.0, s"common should score 0, got $t"))
  }

  test("bm25TopDocs: matching docs ranked above non-matching, fixture score") {
    val df = docsDf(
      1L -> "alpha beta gamma",
      2L -> "alpha alpha beta",
      3L -> "delta epsilon zeta")
    val got = Retrieval.bm25TopDocs(df, "doc_id", "text",
        Seq("alpha"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // only docs 1 and 2 match; doc 2 has higher tf → higher score
    assert(got.map(_._1).toSeq == Seq(2L, 1L))
    // fixture check of doc 1: N=3, df=2, dl=3, avgdl=3, tf=1
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    val contrib = idf * ((1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * (3.0 / 3.0))))
    assert(got.find(_._1 == 1L).get._3 == math.floor(contrib * 1e8) / 1e8)
  }

  test("invertedIndex: postings capped but df/cf aggregate everything") {
    val df = docsDf((1L to 12L).map(i => i -> "tok tok"): _*)
    val got = Retrieval.invertedIndex(df, "doc_id", "text", postingsCap = 8)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("token") == "tok")
    assert(r.getAs[Long]("df") == 12L)   // all 12 docs counted
    assert(r.getAs[Long]("cf") == 24L)   // tf 2 each
    assert(r.getAs[String]("postings") == (1L to 8L).mkString(","))
  }

  test("stratifiedSample: exactly ceil(n_g·rate) per group, stable " +
      "across partitionings, sample is a subset of the input") {
    val df = (1L to 95L).map(i => (if (i % 3 == 0) "a" else "b", i))
      .toDF("grp", "id")
    def runOn(parts: Int): Map[String, Seq[Long]] =
      Sampling.stratifiedSample(df.repartition(parts), "grp", "id", 1, 10)
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val s4 = runOn(4)
    // group a: 31 rows → ceil(3.1) = 4; group b: 64 → ceil(6.4) = 7
    assert(s4("a").length == 4, s"a: ${s4("a")}")
    assert(s4("b").length == 7, s"b: ${s4("b")}")
    assert(runOn(1) == s4 && runOn(13) == s4,
      "sample must not depend on partitioning")
  }

  test("hashSample: deterministic, rate-monotone nesting, near-rate " +
      "count, and agrees with a driver-side md5 filter") {
    val df = (1L to 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def ids(num: Int) = Sampling.hashSample(df, "doc_id", num, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = ids(1); val s2 = ids(2); val s5 = ids(5)
    assert(s1.subsetOf(s2) && s2.subsetOf(s5), "nesting across rates")
    // binomial around 200: generous 4-sigma band (~±36)
    assert(s1.size > 140 && s1.size < 260, s"rate off: ${s1.size}")
    // exact membership agrees with a driver-side md5 computation
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = (1L to 2000L).filter { i =>
      val hex = md.digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      hex < "19999999"
    }.toSet
    assert(s1 == expected)
    assert(ids(1) == s1, "re-run identical")
  }

  test("hashSample boundary: rate >= 1 keeps every row (no 9-hex-digit " +
      "threshold truncation), rate just below 1 keeps nearly all") {
    val df = (1L to 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    assert(Sampling.hashSample(df, "doc_id", 1, 1).count() == 2000L)
    assert(Sampling.hashSample(df, "doc_id", 10, 10).count() == 2000L)
    assert(Sampling.hashSample(df, "doc_id", 7, 3).count() == 2000L,
      "rate > 1 must also keep everything")
    val near = Sampling.hashSample(df, "doc_id", 99, 100).count()
    assert(near > 1900L && near <= 2000L, s"rate 0.99 kept $near")
    assert(Sampling.hashSample(df, "doc_id", 0, 1).count() == 0L)
  }

  test("shuffleShards: exact partition of the corpus, deterministic " +
      "across partitionings and re-runs, balanced, seed-independent " +
      "permutations, stable within-shard order key") {
    val df = (1L to 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def assign(parts: Int, seed: String = "s1") =
      Sampling.shuffleShards(df.repartition(parts, col("doc_id")),
          "doc_id", seed, 32)
        .select("doc_id", "shard", "__shuffle_key").collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getString(2)))).toMap
    val a = assign(4)
    assert(a.size == 2000, "every row assigned exactly once")
    assert(a.values.forall { case (s, _) => s >= 0 && s < 32 })
    assert(assign(1) == a && assign(13) == a,
      "assignment must not depend on partitioning")
    // balance: 2000 rows over 32 shards ≈ 62.5 each; md5-uniform →
    // generous ±4σ-ish band
    val sizes = a.values.groupBy(_._1).view.mapValues(_.size)
    assert(sizes.size == 32, s"empty shards: ${32 - sizes.size}")
    assert(sizes.values.forall(n => n > 25 && n < 100),
      s"unbalanced: ${sizes.toMap}")
    // a different seed yields a genuinely different permutation
    val b = assign(4, seed = "s2")
    val moved = (1L to 2000L).count(i => a(i)._1 != b(i)._1)
    assert(moved > 1500, s"only $moved rows moved under a new seed")
    // the within-shard key orders rows stably: key collisions would
    // break byte-stable shard files (md5 over distinct ids — none)
    assert(a.values.map(_._2).toSet.size == 2000)
  }

  test("resumeShuffle: skip 0 is the whole epoch with contiguous " +
      "per-shard positions; consumed prefix + resumed remainder " +
      "partition the corpus exactly; deterministic across " +
      "partitionings") {
    val df = (1L to 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def resume(skip: Long, parts: Int = 4) =
      Sampling.resumeShuffle(df.repartition(parts, col("doc_id")),
          "doc_id", "s1", 32, skip)
        .select("doc_id", "shard", "position").collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    val full = resume(0L)
    assert(full.size == 2000, "skip 0 must emit every row")
    // positions are 0-based and contiguous within each shard
    full.values.groupBy(_._1).foreach { case (s, rows) =>
      val pos = rows.map(_._2).toSeq.sorted
      assert(pos == (0L until pos.size.toLong), s"shard $s: $pos")
    }
    // the checkpoint partitions the epoch: rows with position < skip
    // are exactly the rows missing from the resumed remainder
    val skip = 7L
    val rest = resume(skip)
    assert(rest.keySet == full.filter(_._2._2 >= skip).keySet)
    // surviving rows keep their shard AND position — the remainder is
    // a suffix of the same permutation, not a re-deal
    rest.foreach { case (id, sp) => assert(sp == full(id)) }
    // deterministic across partitionings
    assert(resume(skip, parts = 13) == rest)
    // skipping past every shard's size empties the epoch
    assert(resume(10000L).isEmpty)
  }

  test("domainQuota: exact cap on oversized domains, under-quota " +
      "domains pass whole, deterministic; the approx map-side form " +
      "agrees on regimes with a binomial-band cap") {
    import graft.operators.Curation
    // domain 'big' has 1500 rows, 'mid' exactly quota, 'tiny' under
    val df = (1L to 1650L).map { i =>
      (i, if (i <= 1500) "big" else if (i <= 1600) "mid" else "tiny")
    }.toDF("id", "dom")
    val exact = Curation.domainQuota(df, "dom", "id", quota = 100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDom = exact.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDom("big") == 100 && byDom("mid") == 100 &&
      byDom("tiny") == 50, byDom.toString)
    // deterministic and partitioning-independent
    val again = Curation
      .domainQuota(df.repartition(13, col("id")), "dom", "id", 100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(exact.toSet == again.toSet)
    // approx: under/at-quota domains pass WHOLE; the oversized domain
    // thins to ~quota (binomial around 100, 4σ ≈ ±40)
    val approx = Curation.domainQuotaApprox(df, "dom", "id", 100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val aByDom = approx.groupBy(_._2).view.mapValues(_.length).toMap
    assert(aByDom("mid") == 100 && aByDom("tiny") == 50, aByDom.toString)
    assert(aByDom("big") > 60 && aByDom("big") < 140, aByDom.toString)
    // both are SUBSETS of the input (samplers never invent rows)
    val ids = (1L to 1650L).toSet
    assert(exact.forall(p => ids(p._1)) && approx.forall(p => ids(p._1)))
  }

  test("domainQuota: NULL-domain rows form one quota group of their " +
      "own (null-safe join) — never silently dropped; exact form " +
      "matches the ranking-window semantics including the null " +
      "partition; approx form keeps them too") {
    import graft.operators.Curation
    import org.apache.spark.sql.expressions.Window
    // 150 rows with a NULL domain (failed extraction) + one domain at
    // exactly quota
    val df = (1L to 250L).map { i =>
      (i, if (i <= 150) null else "real"): (Long, String)
    }.toDF("id", "dom")
    val exact = Curation.domainQuota(df, "dom", "id", quota = 100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(exact.count(_._2 == null) == 100,
      s"null group must cap at quota, got ${exact.count(_._2 == null)}")
    assert(exact.count(_._2 == "real") == 100)
    // the kept set equals row_number() over the null-inclusive window
    val w = Window.partitionBy(col("dom")).orderBy(
      concat(md5(col("id").cast("string")), col("id").cast("string")))
    val ref = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 100)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(exact.toSet == ref)
    // approx: the null group thins around quota (binomial 150·(2/3)),
    // not to zero
    val approx = Curation.domainQuotaApprox(df, "dom", "id", 100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val aNull = approx.count(_._2 == null)
    assert(aNull > 55 && aNull <= 150, s"approx kept $aNull null rows")
    assert(approx.count(_._2 == "real") == 100)
  }

  test("withUrlParts under a PSL emits BOTH keys in punycode: IDN and " +
      "wire-form URLs of the same site land in one host and one " +
      "registered domain") {
    import graft.operators.Curation
    val psl = Seq("de", "com")
    val df = Seq(
      (1L, "https://www.m\u00fcnchen.de/a"),     // unicode
      (2L, "https://WWW.xn--MNCHEN-3ya.de/b"),   // wire form, cased
      (3L, "http://plain.example.com/c")
    ).toDF("id", "url")
    val parts = Curation.withUrlParts(df, "url", psl)
      .select(col("id"), col("host"), col("registered_domain"))
      .collect().map(r => (r.getLong(0),
        (r.getString(1), r.getString(2)))).toMap
    assert(parts(1L) == ("www.xn--mnchen-3ya.de", "xn--mnchen-3ya.de"))
    assert(parts(1L) == parts(2L),
      "IDN and wire-form URLs split into different grouping keys")
    assert(parts(3L) == ("plain.example.com", "example.com"))
  }

  test("operators degrade to empty/zero results on empty inputs, " +
      "never errors") {
    val empty = docsDf()
    val some = docsDf(1L -> "alpha beta gamma delta")
    assert(Retrieval.tfIdfTopTerms(empty, "doc_id", "text", 3).count() == 0)
    assert(Retrieval.bm25TopDocs(empty, "doc_id", "text", Seq("alpha"), 5)
      .count() == 0)
    assert(Retrieval.invertedIndex(empty, "doc_id", "text", 8).count() == 0)
    assert(Sampling.stratifiedSample(empty.withColumn("g", lit("x")),
      "g", "doc_id", 1, 10).count() == 0)
    assert(Dedup.exact(empty, "doc_id", "text").count() == 0)
    assert(Dedup.jaccardShinglePairs(empty, "doc_id", "text", 3, 0.6)
      .count() == 0)
    // empty train: nothing can be contaminated, but every test doc reports
    val r1 = Dedup.contaminationReport(empty, some, "doc_id", "text", 3)
      .collect()
    assert(r1.length == 1 && !r1.head.getBoolean(3) && r1.head.getLong(2) == 0)
    // empty test: empty report
    assert(Dedup.contaminationReport(some, empty, "doc_id", "text", 3)
      .count() == 0)
  }

  test("contaminationReport: planted overlap flagged, disjoint and " +
      "too-short docs not") {
    val train = docsDf(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs")
    val test = docsDf(
      10L -> "the quick brown fox jumps over the lazy dog", // full copy
      11L -> "waltz bad nymph for quick jigs vex",           // disjoint
      12L -> "two words")                                    // no shingles
    val got = Dedup.contaminationReport(train, test, "doc_id", "text", k = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got(10L)._3, "full copy must be contaminated")
    assert(got(10L)._1 == got(10L)._2, "every shingle of the copy is shared")
    assert(!got(11L)._3 && got(11L)._2 == 0L, "disjoint doc clean")
    assert(got(12L) == ((0L, 0L, false)), "sub-shingle doc reports zeros")
  }
}
