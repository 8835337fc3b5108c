package graft

import graft.io.TrainerShards
import graft.operators.Packing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contiguous trainer shards: the flat tokens-blob + offsets-sidecar
  * pair must round-trip byte-exactly against the materialized
  * sequences, be deterministic across runs and partitionings, publish
  * atomically (two-rename swap, no staging/retired residue), and under
  * the zero-merge byte configuration the width-1 blob must be
  * LITERALLY the stratum's concatenated document bytes (the x96
  * identity carried to the file).
  */
class TrainerShardsSpec extends SparkSpec {

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_shards")
    java.nio.file.Files.delete(d) // writer publishes via rename
    d.toString
  }

  private def docsDf(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "lang", "text")
  }

  private val fixture = docsDf(
    (1L, "en", "the quick brown fox jumps over the lazy dog"),
    (2L, "en", "pack my box with five dozen liquor jugs"),
    (3L, "en", "sphinx of black quartz judge my vow"),
    (4L, "de", "zwei boxkaempfer jagen eva quer durch sylt"),
    (5L, "de", "franz jagt im taxi quer durch bayern"),
    (6L, "fr", "portez ce vieux whisky au juge blond"))

  private def materialize(df: DataFrame, seqLen: Int): DataFrame =
    Packing.materializeSequences(df, "doc_id", "text", "lang", seqLen,
      merges = Nil,
      tokenPattern = graft.functions.TextFunctions.bpeBytePatternFull)

  test("round-trip: readShard returns every sequence's token_ids " +
      "byte-exactly, in seq_id order, with the written width") {
    val seqs = materialize(fixture, seqLen = 32)
    val dir = tmpDir()
    val manifest = TrainerShards.write(seqs, "lang", "seq_id",
      "token_ids", width = 2, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val expected = seqs.select(col("lang"), col("seq_id"),
        col("token_ids"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(TrainerShards.listShards(spark, dir).toSet ==
      expected.keySet)
    // the attempt-unique staging names (the zombie-attempt shield)
    // never leak into the published set: only committed .tokens/.idx
    // pairs are visible
    val published = new java.io.File(dir).listFiles().map(_.getName)
    assert(published.forall(n => !n.contains(".attempt-")),
      s"attempt staging leaked into the published dir: " +
        s"${published.toSeq}")
    // only committed pairs + the manifest are visible (dot-hidden
    // local-FS checksum sidecars aside)
    assert(published.filterNot(_.startsWith(".")).forall(n =>
      n.endsWith(TrainerShards.TokensSuffix) ||
        n.endsWith(TrainerShards.IdxSuffix) ||
        n == TrainerShards.ManifestName),
      s"unexpected file in published dir: ${published.toSeq}")
    // the manifest SHIPS WITH the artifact and restates the returned
    // frame: a loader learns counts/width without deriving file sizes
    val mf = TrainerShards.readManifest(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(5))).toMap
    assert(mf.keySet == expected.keySet)
    expected.foreach { case (lang, want) =>
      val (nSeq, nTok, bytes, w) = mf(lang)
      assert(w == 2 && nSeq == want.length &&
        nTok == want.map(_.length.toLong).sum && bytes == nTok * 2,
        s"manifest mismatch for $lang: ${mf(lang)}")
    }
    expected.foreach { case (lang, want) =>
      val (width, got) = TrainerShards.readShard(spark, dir, lang)
      assert(width == 2)
      assert(got == want, s"shard $lang mismatch")
      val (nSeq, nTok, bytes) = manifest(lang)
      assert(nSeq == want.length)
      assert(nTok == want.map(_.length.toLong).sum)
      assert(bytes == nTok * 2)
    }
  }

  test("width-1 zero-merge identity: the tokens blob IS the stratum's " +
      "concatenated document bytes in id order (the x96 identity on " +
      "disk); determinism: two runs write identical files") {
    val seqs = materialize(fixture, seqLen = 32)
    val d1 = tmpDir()
    val d2 = tmpDir()
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 1, d1)
    TrainerShards.write(seqs.repartition(7), "lang", "seq_id",
      "token_ids", 1, d2)
    val texts = fixture.collect()
      .map(r => (r.getString(1), r.getLong(0), r.getString(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).mkString("")).toMap
    texts.foreach { case (lang, concat) =>
      val f1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        d1, TrainerShards.fileStem(lang) + TrainerShards.TokensSuffix))
      assert(f1.sameElements(concat.getBytes("UTF-8")),
        s"$lang blob is not the concatenated document bytes")
      val f2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        d2, TrainerShards.fileStem(lang) + TrainerShards.TokensSuffix))
      assert(f1.sameElements(f2), s"$lang blob differs across runs")
      val i1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        d1, TrainerShards.fileStem(lang) + TrainerShards.IdxSuffix))
      val i2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        d2, TrainerShards.fileStem(lang) + TrainerShards.IdxSuffix))
      assert(i1.sameElements(i2), s"$lang idx differs across runs")
    }
  }

  test("epoch-order sidecars: each .ord is a permutation of the " +
      "shard's positions, byte-deterministic per (seed, epoch) and " +
      "independent across epochs; a checkpoint at step G partitions " +
      "into consumed-prefix/remainder FROM THE FILES ALONE; a shard " +
      "re-write retires stale epoch orders") {
    val seqs = materialize(fixture, seqLen = 8) // small seqLen → many
    val dir = tmpDir()                          // sequences per stratum
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 2, dir)
    TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = 0)
    TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = 1)
    val strata = TrainerShards.listShards(spark, dir)
    assert(strata.nonEmpty)
    val perms = strata.map { s =>
      val n = TrainerShards.readShard(spark, dir, s)._2.length
      val (e0, p0) = TrainerShards.readEpochOrderShard(spark, dir, 0, s)
      val (e1, p1) = TrainerShards.readEpochOrderShard(spark, dir, 1, s)
      assert(e0 == 0 && e1 == 1, "header epoch mismatch")
      assert(p0.sorted == (0L until n.toLong), s"$s epoch 0 is not a " +
        s"permutation of 0..${n - 1}: $p0")
      assert(p1.sorted == (0L until n.toLong))
      if (n > 2) assert(p0 != p1,
        s"$s epochs 0 and 1 drew the SAME order — not independent")
      s -> p0
    }.toMap
    // byte-determinism: re-writing the same epoch publishes identical
    // files (the idempotent-restart property)
    val before = strata.map(s => s -> java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, TrainerShards.epochDirName(0),
        TrainerShards.fileStem(s) + TrainerShards.OrdSuffix))).toMap
    TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = 0)
    strata.foreach { s =>
      val after = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, TrainerShards.epochDirName(0),
          TrainerShards.fileStem(s) + TrainerShards.OrdSuffix))
      assert(before(s).sameElements(after),
        s"$s epoch 0 re-write changed bytes")
    }
    // the distributed read equals the driver reader, rank for rank
    val distributed = TrainerShards.readEpochOrder(spark, dir, 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(distributed == perms,
      "distributed epoch read diverged from the sidecar bytes")
    // x110's partition from files alone: consumed prefix G + remainder
    // are disjoint, exhaustive, and order-preserving — no engine re-run
    val g = 2L
    val remainder = TrainerShards.readEpochRemainder(spark, dir, 0, g)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    strata.foreach { s =>
      val consumed = perms(s).take(g.toInt)
      val rest = remainder.getOrElse(s, Seq.empty)
      assert(rest == perms(s).drop(g.toInt),
        s"$s remainder is not the order-preserved suffix")
      assert((consumed ++ rest).sorted ==
        (0L until perms(s).length.toLong),
        s"$s consumed+remainder is not an exact partition")
    }
    // every remainder position resolves to a real sequence via the
    // distributed shard read — the artifact pair composes
    val rem = TrainerShards.readEpochRemainder(spark, dir, 0, g)
      .select(col("stratum").as("rs"), col("pos"))
    val joined = rem.join(TrainerShards.read(spark, dir),
      col("rs") === col("stratum") && col("pos") === col("seq_idx"))
    assert(joined.count() ==
      perms.values.map(p => math.max(0L, p.length - g)).sum)
    // the composed one-call resume read: (stratum, rank, pos,
    // token_ids) in consumption order, data included — equals the
    // remainder resolved through readShard by hand
    val resumed = TrainerShards.readInEpochOrder(spark, dir, 0, g)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(x => (x._3, x._4)).toSeq).toMap
    strata.foreach { s =>
      val shard = TrainerShards.readShard(spark, dir, s)._2
      val want = perms(s).drop(g.toInt)
        .map(p => (p, shard(p.toInt)))
      assert(resumed.getOrElse(s, Seq.empty) == want,
        s"$s composed resume read diverged from the files")
    }
    // re-writing the SHARD SET retires the whole directory — stale
    // epoch orders (whose counts no longer match) vanish with it
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 2, dir)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir,
        TrainerShards.epochDirName(0))),
      "a shard re-write left a stale epoch order behind")
  }

  test("blend schedule: the published parts state the dense 1..T " +
      "weighted fair interleave (closed form == brute-force virtual-" +
      "time sort), byte-deterministic; cursors + remainder resume the " +
      "BLEND from the files alone; composed read returns the right " +
      "token bytes; weights and bounds validate loudly") {
    val seqs = materialize(fixture, seqLen = 8)
    val dir = tmpDir()
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 2, dir)
    // blend before epoch order is an inconsistent artifact — refused
    val noOrd = intercept[IllegalArgumentException] {
      TrainerShards.writeBlendSchedule(spark, dir, 0,
        Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.5))
    }
    assert(noOrd.getMessage.contains("writeEpochOrder first"))
    TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = 0)
    // weight validation: missing stratum, unknown stratum, sub-milli
    assert(intercept[IllegalArgumentException] {
      TrainerShards.writeBlendSchedule(spark, dir, 0,
        Map("en" -> 2.0, "de" -> 1.0))
    }.getMessage.contains("missing"))
    assert(intercept[IllegalArgumentException] {
      TrainerShards.writeBlendSchedule(spark, dir, 0,
        Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.5, "zz" -> 1.0))
    }.getMessage.contains("absent"))
    assert(intercept[IllegalArgumentException] {
      TrainerShards.writeBlendSchedule(spark, dir, 0,
        Map("en" -> 2.0, "de" -> 0.0004, "fr" -> 1.5))
    }.getMessage.contains("0.001"))

    val wOf = Map("en" -> 2000L, "de" -> 1000L, "fr" -> 1500L)
    TrainerShards.writeBlendSchedule(spark, dir, 0,
      Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.5), stepsPerFile = 4)
    val counts = TrainerShards.listShards(spark, dir)
      .map(s => s -> TrainerShards.readShard(spark, dir, s)._2.length
        .toLong).toMap
    val total = counts.values.sum

    val sched = TrainerShards.readBlendSchedule(spark, dir, 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    // dense global steps, each (stratum, rank) exactly once
    assert(sched.map(_._1).toSeq == (1L to total),
      s"global steps are not dense 1..$total")
    assert(sched.map(t => (t._2, t._3)).toSet ==
      counts.toSeq.flatMap { case (s, n) => (1L to n).map(k => (s, k)) }
        .toSet)
    // the closed form equals the brute-force virtual-time sort:
    // (s1,k1) before (s2,k2) iff k1/w1 < k2/w2 (cross-multiplied,
    // exact), ties by stratum name
    val brute = counts.toSeq
      .flatMap { case (s, n) => (1L to n).map(k => (s, k)) }
      .sortWith { case ((s1, k1), (s2, k2)) =>
        val c = (k1 * wOf(s2)) compare (k2 * wOf(s1))
        if (c != 0) c < 0 else s1 < s2
      }
    assert(sched.map(t => (t._2, t._3)).toSeq == brute,
      "closed-form schedule diverged from the virtual-time sort")
    // artifact shape: parts + manifest, headers carry epoch and the
    // right first_step; concatenated driver reads state the schedule
    val blendDir = java.nio.file.Paths.get(dir,
      TrainerShards.epochDirName(0), TrainerShards.BlendDirName)
    val partFiles = new java.io.File(blendDir.toString).listFiles()
      .map(_.getName).filter(_.endsWith(TrainerShards.BlendSuffix))
      .sorted
    assert(partFiles.length == ((total + 3) / 4).toInt,
      s"expected ceil($total/4) parts, got ${partFiles.toSeq}")
    assert(java.nio.file.Files.exists(
      blendDir.resolve(TrainerShards.BlendManifestName)))
    val names = counts.keys.toSeq.sorted
    val driverSched = partFiles.flatMap { f =>
      val (ep, first, recs) =
        TrainerShards.readBlendPartDriver(spark, dir, 0, f)
      assert(ep == 0, s"$f header epoch $ep")
      recs.zipWithIndex.map { case ((o, r), i) =>
        (first + i, names(o), r)
      }
    }.sortBy(_._1)
    assert(driverSched.toSeq == sched.toSeq,
      "driver part reads diverged from the distributed read")
    // byte-determinism: re-publish → identical part bytes
    val before = partFiles.map(f => f -> java.nio.file.Files
      .readAllBytes(blendDir.resolve(f))).toMap
    TrainerShards.writeBlendSchedule(spark, dir, 0,
      Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.5), stepsPerFile = 4)
    partFiles.foreach { f =>
      assert(before(f).sameElements(
        java.nio.file.Files.readAllBytes(blendDir.resolve(f))),
        s"$f re-write changed bytes")
    }

    // resume the BLEND from the files alone: cursors at G equal the
    // prefix's per-stratum consumption, remainder is the exact suffix
    val g = total / 2
    val prefix = sched.filter(_._1 <= g)
    val cursors = TrainerShards.blendCursors(spark, dir, 0, g)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cursors == names.map(s =>
      s -> prefix.count(_._2 == s).toLong).toMap,
      s"cursors at step $g diverged: $cursors")
    // ranks are dense within the prefix, so max rank == count — the
    // cursor IS each shard's consumed-prefix length (x110 arithmetic)
    names.foreach { s =>
      val pre = prefix.filter(_._2 == s).map(_._3)
      assert(pre.toSeq == (1L to cursors(s)),
        s"$s prefix ranks are not dense: ${pre.toSeq}")
    }
    val rem = TrainerShards.readBlendRemainder(spark, dir, 0, g)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert((prefix ++ rem).toSeq == sched.toSeq,
      "prefix + remainder is not an exact partition of the schedule")
    // the composed resume read: every remaining step resolves through
    // the .ord permutation to the right sequence BYTES
    val resumed = TrainerShards.readInBlendOrder(spark, dir, 0, g)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getSeq[Long](4)))
    assert(resumed.map(_._1).toSet == rem.map(_._1).toSet)
    val shards = names.map(s =>
      s -> TrainerShards.readShard(spark, dir, s)._2).toMap
    val ords = names.map(s =>
      s -> TrainerShards.readEpochOrderShard(spark, dir, 0, s)._2).toMap
    resumed.foreach { case (_, s, rank, pos, ids) =>
      assert(ords(s)(rank.toInt - 1) == pos,
        s"$s rank $rank resolved to pos $pos, .ord says " +
          s"${ords(s)(rank.toInt - 1)}")
      assert(ids == shards(s)(pos.toInt),
        s"$s pos $pos token bytes diverged")
    }

    // corruption fails loudly: a rank beyond the stratum's count
    val victim = blendDir.resolve(partFiles.head)
    val blob = java.nio.file.Files.readAllBytes(victim)
    val patched = blob.clone()
    // first record's rank (u64 LE at header+4): set to total+7 —
    // beyond every stratum's count
    val bad = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(total + 7).array()
    System.arraycopy(bad, 0, patched, TrainerShards.BlendHeaderBytes + 4,
      8)
    java.nio.file.Files.write(victim, patched)
    java.nio.file.Files.deleteIfExists(
      blendDir.resolve("." + partFiles.head + ".crc"))
    val boom = intercept[Exception] {
      TrainerShards.readBlendSchedule(spark, dir, 0).collect()
    }
    assert(exceptionChain(boom).exists(_.contains("scheduled for only")),
      s"out-of-range rank read silently: ${exceptionChain(boom)}")
    java.nio.file.Files.write(victim, blob) // restore
    java.nio.file.Files.deleteIfExists(
      blendDir.resolve("." + partFiles.head + ".crc"))

    // re-running writeEpochOrder swaps the epoch dir and RETIRES the
    // blend with it (the permutation the ranks index into changed)
    TrainerShards.writeEpochOrder(spark, dir, seed = "s2", epoch = 0)
    assert(!java.nio.file.Files.exists(blendDir),
      "an epoch-order re-write left a stale blend behind")
    assert(intercept[IllegalArgumentException] {
      TrainerShards.readBlendSchedule(spark, dir, 0)
    }.getMessage.contains("writeBlendSchedule first"))
  }

  test("blend schedule with source-epochs factors: m = floor(n*f) " +
      "consumption steps per stratum, ranks past the shard wrap " +
      "around into the same epoch permutation, partial consumption " +
      "stops early, a zero-factor stratum sits the epoch out, and " +
      "the closed form still equals the brute-force sort over m") {
    val seqs = materialize(fixture, seqLen = 8)
    val dir = tmpDir()
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 2, dir)
    TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = 0)
    val n = TrainerShards.listShards(spark, dir)
      .map(s => s -> TrainerShards.readShard(spark, dir, s)._2.length
        .toLong).toMap
    val weights = Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.5)
    val wOf = Map("en" -> 2000L, "de" -> 1000L, "fr" -> 1500L)
    val factors = Map("en" -> 1.5, "de" -> 0.4, "fr" -> 0.0)
    // unknown strata in factors refuse loudly
    assert(intercept[IllegalArgumentException] {
      TrainerShards.writeBlendSchedule(spark, dir, 0, weights,
        epochsFactors = factors + ("zz" -> 1.0))
    }.getMessage.contains("absent"))
    // all-zero factors = nothing to schedule — refused, not an empty
    // artifact
    assert(intercept[IllegalArgumentException] {
      TrainerShards.writeBlendSchedule(spark, dir, 0, weights,
        epochsFactors = n.keys.map(_ -> 0.0).toMap)
    }.getMessage.contains("nothing to schedule"))

    TrainerShards.writeBlendSchedule(spark, dir, 0, weights,
      stepsPerFile = 4, epochsFactors = factors)
    val m = n.map { case (s, c) =>
      s -> c * math.floor(factors(s) * 1000).toLong / 1000L
    }
    val total = m.values.sum
    assert(m("fr") == 0 && m("en") > n("en") && m("de") < n("de"),
      s"fixture no longer exercises wrap/partial/sit-out: $m vs $n")
    val sched = TrainerShards.readBlendSchedule(spark, dir, 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(sched.map(_._1).toSeq == (1L to total))
    assert(!sched.exists(_._2 == "fr"),
      "a zero-factor stratum leaked into the schedule")
    m.filter(_._2 > 0).foreach { case (s, ms) =>
      assert(sched.filter(_._2 == s).map(_._3).toSeq == (1L to ms),
        s"$s consumption steps are not dense 1..$ms")
    }
    // closed form == brute-force virtual-time sort over the m's
    val brute = m.toSeq.flatMap { case (s, ms) =>
      (1L to ms).map(k => (s, k))
    }.sortWith { case ((s1, k1), (s2, k2)) =>
      val c = (k1 * wOf(s2)) compare (k2 * wOf(s1))
      if (c != 0) c < 0 else s1 < s2
    }
    assert(sched.map(t => (t._2, t._3)).toSeq == brute)
    // the composed read resolves every step through the WRAPAROUND to
    // the right .ord position and token bytes; overrun ranks re-walk
    // the same permutation
    val ords = n.keys.map(s => s ->
      TrainerShards.readEpochOrderShard(spark, dir, 0, s)._2).toMap
    val shards = n.keys.map(s =>
      s -> TrainerShards.readShard(spark, dir, s)._2).toMap
    val resumed = TrainerShards.readInBlendOrder(spark, dir, 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getSeq[Long](4)))
    assert(resumed.length == total,
      "the wraparound join dropped or duplicated steps")
    resumed.foreach { case (_, s, rank, pos, ids) =>
      val ordRank = ((rank - 1) % n(s)).toInt
      assert(ords(s)(ordRank) == pos,
        s"$s step $rank resolved to pos $pos, .ord wraparound says " +
          s"${ords(s)(ordRank)}")
      assert(ids == shards(s)(pos.toInt))
    }
  }

  test("blend schedule guards: a pathological strata count refuses " +
      "LOUDLY naming the collapse-upstream remedy (the closed form " +
      "is O(|strata|) per step), and an n*factor product that would " +
      "wrap a long refuses before any job runs") {
    val seqs = materialize(fixture, seqLen = 8)
    val dir = tmpDir()
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 2, dir)
    TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = 0)
    val weights = Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.5)
    // 3 strata against maxStrata = 2: the guard itself, exercised
    // without manufacturing 10^4 files — the default bound is the
    // same require on the same listing
    val tooMany = intercept[IllegalArgumentException] {
      TrainerShards.writeBlendSchedule(spark, dir, 0, weights,
        maxStrata = 2)
    }
    assert(tooMany.getMessage.contains("collapse strata upstream") &&
      tooMany.getMessage.contains("maxStrata"),
      s"wrong guard message: ${tooMany.getMessage}")
    // n_s * f_milli wrapping a long: a ~9.3e12-sequence stratum at
    // factor 999.999 (f_milli 999_999) exceeds Long.MaxValue — the
    // guarded arithmetic must refuse, not publish a negative-step
    // schedule (the sizes come from idx sidecars too large to
    // manufacture here, so the shared helper is exercised directly)
    val wraps = intercept[IllegalArgumentException] {
      TrainerShards.consumptionSteps(Array("de"),
        Array(9300000000000L), Array(999999L))
    }
    assert(wraps.getMessage.contains("overflows a long") &&
      wraps.getMessage.contains("de"),
      s"wrong overflow message: ${wraps.getMessage}")
    // and the in-range product is exact, not saturated
    assert(TrainerShards.consumptionSteps(Array("en"),
      Array(7L), Array(1500L)).toSeq == Seq(10L))
  }

  test("run manifest: _RUN.json binds the epoch sequence from the " +
      "published artifacts alone; runCursor resolves a run-global " +
      "checkpoint across epoch boundaries; a trainer checkpointed " +
      "INSIDE the middle epoch resumes the remainder of that epoch " +
      "plus every later one with no engine re-run; per-rank slices " +
      "stay disjoint across the boundary; verifyRun refuses disk " +
      "drift loudly") {
    val seqs = materialize(fixture, seqLen = 8)
    val dir = tmpDir()
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 2, dir,
      provenance = Map("tokenizer_md5" -> "cafe01"))
    val weights = Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.5)
    (0 to 2).foreach { e =>
      TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = e)
      TrainerShards.writeBlendSchedule(spark, dir, e, weights,
        stepsPerFile = 4)
    }
    // binding must cover the directories on disk EXACTLY
    assert(intercept[IllegalArgumentException] {
      TrainerShards.writeRunManifest(spark, dir, Seq(0, 1))
    }.getMessage.contains("disagree"))
    assert(intercept[IllegalArgumentException] {
      TrainerShards.writeRunManifest(spark, dir, Seq(0, 1, 2, 3))
    }.getMessage.contains("disagree"))
    val bound = TrainerShards.writeRunManifest(spark, dir, Seq(0, 1, 2))
      .collect().sortBy(_.getInt(0))
    val t = bound(0).getLong(3)
    assert(bound.map(r => (r.getInt(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq ==
      Seq((0, "s", 1L, t), (1, "s", t + 1, t), (2, "s", 2 * t + 1, t)),
      s"prefix sums wrong: ${bound.mkString(", ")}")
    TrainerShards.verifyRun(spark, dir, deep = true)

    // runCursor edges: before everything, exactly at a boundary, one
    // past it, at the end, past the end
    assert(TrainerShards.runCursor(spark, dir, 0L) == ((0, 0L)))
    assert(TrainerShards.runCursor(spark, dir, t) == ((0, t)))
    assert(TrainerShards.runCursor(spark, dir, t + 1) == ((1, 1L)))
    assert(TrainerShards.runCursor(spark, dir, 3 * t) == ((2, t)))
    assert(TrainerShards.runCursor(spark, dir, 3 * t + 7) == ((2, t)))

    // checkpoint INSIDE the middle epoch: run step G = t + t/2
    val g = t + t / 2
    assert(TrainerShards.runCursor(spark, dir, g) == ((1, t / 2)))
    // per-shard cursors = the middle epoch's blend cursors
    val rc = TrainerShards.runCursors(spark, dir, g).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sorted
    val bc = TrainerShards.blendCursors(spark, dir, 1, t / 2).collect()
      .map(r => (1, r.getString(0), r.getLong(1))).sorted
    assert(rc.toSeq == bc.toSeq)

    // the remainder: epoch 1 past t/2 lifted by t, epoch 2 in full
    // lifted by 2t — dense run steps g+1 .. 3t, and every row equals
    // the per-epoch blend read it composes (files alone, both sides)
    val rem = TrainerShards.readRunRemainder(spark, dir, g).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getString(3), r.getLong(4))).sortBy(_._1)
    assert(rem.map(_._1).toSeq == ((g + 1) to (3 * t)),
      "run steps past the checkpoint are not dense")
    val e1 = TrainerShards.readBlendRemainder(spark, dir, 1, t / 2)
      .collect().map(r => (r.getLong(0) + t, 1, r.getLong(0),
        r.getString(1), r.getLong(2)))
    val e2 = TrainerShards.readBlendSchedule(spark, dir, 2)
      .collect().map(r => (r.getLong(0) + 2 * t, 2, r.getLong(0),
        r.getString(1), r.getLong(2)))
    assert(rem.toSeq == (e1 ++ e2).sortBy(_._1).toSeq,
      "the cross-epoch remainder diverged from its per-epoch legs")

    // the composed read carries the right TOKEN BYTES across the
    // boundary (each epoch's own permutation, wraparound identity)
    val shards = TrainerShards.listShards(spark, dir).map(st =>
      st -> TrainerShards.readShard(spark, dir, st)._2).toMap
    val ords = (0 to 2).flatMap(e =>
      TrainerShards.listShards(spark, dir).map(st =>
        (e, st) -> TrainerShards.readEpochOrderShard(spark, dir, e,
          st)._2)).toMap
    val composed = TrainerShards.readInRunOrder(spark, dir, g)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3),
        r.getLong(4), r.getLong(5), r.getSeq[Long](6)))
    assert(composed.length == rem.length)
    composed.foreach { case (_, e, st, rank, pos, ids) =>
      assert(ords((e, st))((rank - 1).toInt % shards(st).length)
        == pos, s"epoch $e $st rank $rank resolved to wrong pos")
      assert(ids == shards(st)(pos.toInt),
        s"epoch $e $st pos $pos carried wrong bytes")
    }

    // per-rank slices: disjoint, exhaustive, balanced, and the
    // round-robin does NOT reset at the epoch boundary
    val world = 3
    val slices = (0 until world).map(r =>
      TrainerShards.readRunForRank(spark, dir, r, world, afterStep = g)
        .select("run_step").collect().map(_.getLong(0)).toSet)
    assert(slices.map(_.size).sum == rem.length &&
      slices.reduce(_ ++ _).size == rem.length,
      "rank slices overlap or drop steps")
    slices.zipWithIndex.foreach { case (sl, r) =>
      assert(sl.forall(st => (st - 1) % world == r),
        s"rank $r holds a foreign run step")
    }

    // drift refusals: a republished blend with a different mix
    TrainerShards.writeBlendSchedule(spark, dir, 2, weights,
      epochsFactors = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 1.0))
    assert(intercept[IllegalArgumentException] {
      TrainerShards.verifyRun(spark, dir)
    }.getMessage.contains("republished"))
    assert(intercept[IllegalArgumentException] {
      TrainerShards.readRunRemainder(spark, dir, g).collect()
    }.getMessage.contains("republished"))
    // restore the bound blend; a STRAY epoch directory also refuses
    TrainerShards.writeBlendSchedule(spark, dir, 2, weights,
      stepsPerFile = 4)
    TrainerShards.verifyRun(spark, dir)
    TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = 7)
    TrainerShards.writeBlendSchedule(spark, dir, 7, weights)
    assert(intercept[IllegalArgumentException] {
      TrainerShards.verifyRun(spark, dir)
    }.getMessage.contains("disagree"))
  }

  test("extendRunManifest: a newly published epoch appends to the " +
      "binding byte-equivalently to a fresh declaration; an unbound " +
      "stray, a missing epoch, and a double-bind all refuse loudly") {
    val seqs = materialize(fixture, seqLen = 8)
    val dir = tmpDir()
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 2, dir,
      provenance = Map("tok" -> "t9"))
    val weights = Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.5)
    def publish(e: Int): Unit = {
      TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = e)
      TrainerShards.writeBlendSchedule(spark, dir, e, weights)
    }
    publish(0)
    TrainerShards.writeRunManifest(spark, dir, Seq(0))
    // the epoch must exist before it can be bound
    assert(intercept[IllegalArgumentException] {
      TrainerShards.extendRunManifest(spark, dir, 1)
    }.getMessage.contains("no epoch directory"))
    publish(1)
    TrainerShards.extendRunManifest(spark, dir, 1)
    TrainerShards.verifyRun(spark, dir)
    val extended = {
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val in = fs.open(new org.apache.hadoop.fs.Path(dir,
        TrainerShards.RunManifestName))
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    // byte-equivalence: a fresh declaration over [0, 1] writes the
    // same manifest (the extension never forks the artifact meaning)
    TrainerShards.writeRunManifest(spark, dir, Seq(0, 1))
    val fresh = {
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val in = fs.open(new org.apache.hadoop.fs.Path(dir,
        TrainerShards.RunManifestName))
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    assert(extended == fresh,
      "extendRunManifest forked the manifest bytes")
    // double-bind refuses
    assert(intercept[IllegalArgumentException] {
      TrainerShards.extendRunManifest(spark, dir, 1)
    }.getMessage.contains("already bound"))
    // a SECOND unbound stray on disk refuses the append (the caller
    // must resolve drift first)
    publish(5)
    publish(7)
    assert(intercept[IllegalArgumentException] {
      TrainerShards.extendRunManifest(spark, dir, 7)
    }.getMessage.contains("bound to no run"))
  }

  test("racing run-manifest publishers: the generation-token CAS " +
      "makes the loser throw AT COMMIT and leaves the winner's " +
      "binding untouched; a commit-then-crash half-publish is " +
      "refused by verifyRun and heals on re-publish") {
    val seqs = materialize(fixture, seqLen = 8)
    val dir = tmpDir()
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 2, dir,
      provenance = Map("tok" -> "t9"))
    val weights = Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.5)
    TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = 0)
    TrainerShards.writeBlendSchedule(spark, dir, 0, weights)
    TrainerShards.writeRunManifest(spark, dir, Seq(0))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def slurp(name: String): Array[Byte] = {
      val in = fs.open(new org.apache.hadoop.fs.Path(dir, name))
      try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
    }
    // the WINNER: a second publish commits generation 2
    TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = 1)
    TrainerShards.writeBlendSchedule(spark, dir, 1, weights)
    TrainerShards.extendRunManifest(spark, dir, 1)
    assert(TrainerShards.maxRunGeneration(spark, dir) == 2L)
    val winner = slurp(TrainerShards.RunManifestName)
    // the LOSER: a racing publisher that read generation 1 before
    // the winner committed (the stale read replayed deterministically
    // through the explicit-generation commit step) — it must refuse
    // AT COMMIT, leaving both the generation file and the pointer
    // exactly the winner's
    val e = intercept[IllegalStateException] {
      TrainerShards.commitRunGeneration(spark, dir,
        "LOSER BYTES".getBytes("UTF-8"), gen = 2L)
    }
    assert(e.getMessage.contains("concurrent run-manifest publish"))
    assert(java.util.Arrays.equals(slurp("_RUN.2.json"), winner),
      "the loser clobbered the winner's committed generation")
    assert(java.util.Arrays.equals(
      slurp(TrainerShards.RunManifestName), winner),
      "the loser clobbered the pointer")
    TrainerShards.verifyRun(spark, dir)
    // commit-then-crash: generation 3 lands (a DIFFERENT binding)
    // but the pointer never updates — verifyRun refuses the
    // half-publish loudly...
    TrainerShards.commitRunGeneration(spark, dir,
      "HALF-PUBLISHED BINDING".getBytes("UTF-8"), gen = 3L)
    assert(intercept[IllegalArgumentException] {
      TrainerShards.verifyRun(spark, dir)
    }.getMessage.contains("crashed between commit and pointer"))
    // ...and a re-publish heals it (generation 4 + pointer)
    TrainerShards.writeRunManifest(spark, dir, Seq(0, 1))
    assert(TrainerShards.maxRunGeneration(spark, dir) == 4L)
    TrainerShards.verifyRun(spark, dir)
  }

  test("artifact integrity one level up: verifyEpochOrder and " +
      "verifyBlendSchedule pass pristine sets and name flipped " +
      "bytes / retired-generation mismatches; readBlendForRank " +
      "slices are disjoint, exhaustive, and balanced") {
    val seqs = materialize(fixture, seqLen = 8)
    val dir = tmpDir()
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 2, dir)
    TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = 0)
    TrainerShards.writeBlendSchedule(spark, dir, 0,
      Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.5), stepsPerFile = 4)
    // pristine: both verifiers pass and return their inventories
    assert(TrainerShards.verifyEpochOrder(spark, dir, 0).count() == 3)
    assert(TrainerShards.verifyBlendSchedule(spark, dir, 0).count()
      >= 1)
    // DP-rank slices: disjoint, exhaustive, balanced within one step
    val full = TrainerShards.readInBlendOrder(spark, dir, 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val slices = (0 until 3).map { r =>
      TrainerShards.readBlendForRank(spark, dir, 0, r, worldSize = 3)
        .collect()
        .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSet
    }
    assert(slices.map(_.size).sum == full.size &&
      slices.reduce(_ ++ _) == full,
      "rank slices are not an exact partition of the blend")
    assert(slices.map(_.size).max - slices.map(_.size).min <= 1,
      s"rank slices unbalanced: ${slices.map(_.size)}")
    slices.foreach(s1 => slices.foreach(s2 =>
      assert((s1 eq s2) || s1.intersect(s2).isEmpty)))
    // a flipped byte in an .ord fails verifyEpochOrder loudly
    val stem = TrainerShards.fileStem("en")
    val ord = java.nio.file.Paths.get(dir,
      TrainerShards.epochDirName(0), stem + TrainerShards.OrdSuffix)
    val ordBytes = java.nio.file.Files.readAllBytes(ord)
    val patched = ordBytes.clone()
    patched(patched.length - 1) = (patched(patched.length - 1) ^ 0x1)
      .toByte
    java.nio.file.Files.write(ord, patched)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir,
      TrainerShards.epochDirName(0),
      "." + stem + TrainerShards.OrdSuffix + ".crc"))
    val ordBoom = intercept[IllegalArgumentException] {
      TrainerShards.verifyEpochOrder(spark, dir, 0)
    }
    assert(ordBoom.getMessage.contains(stem) &&
      ordBoom.getMessage.contains("md5"), ordBoom.getMessage)
    java.nio.file.Files.write(ord, ordBytes)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir,
      TrainerShards.epochDirName(0),
      "." + stem + TrainerShards.OrdSuffix + ".crc"))
    // an epoch manifest from a RETIRED shard generation (sequence
    // counts no longer matching the live .idx) refuses
    val eManifest = java.nio.file.Paths.get(dir,
      TrainerShards.epochDirName(0), TrainerShards.EpochManifestName)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val eTree = mapper.readTree(
      java.nio.file.Files.readAllBytes(eManifest))
    val eBytes = java.nio.file.Files.readAllBytes(eManifest)
    eTree.get("strata").elements().forEachRemaining { n =>
      val o = n.asInstanceOf[com.fasterxml.jackson.databind.node
        .ObjectNode]
      if (o.get("stratum").asText() == "en")
        o.put("n_sequences", o.get("n_sequences").asLong() + 1)
      ()
    }
    java.nio.file.Files.write(eManifest, mapper.writeValueAsBytes(eTree))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir,
      TrainerShards.epochDirName(0),
      "." + TrainerShards.EpochManifestName + ".crc"))
    assert(intercept[IllegalArgumentException] {
      TrainerShards.verifyEpochOrder(spark, dir, 0)
    }.getMessage.contains("manifest says"))
    java.nio.file.Files.write(eManifest, eBytes)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir,
      TrainerShards.epochDirName(0),
      "." + TrainerShards.EpochManifestName + ".crc"))
    // a flipped byte in a blend part fails verifyBlendSchedule loudly
    val blendDir = java.nio.file.Paths.get(dir,
      TrainerShards.epochDirName(0), TrainerShards.BlendDirName)
    val part = new java.io.File(blendDir.toString).listFiles()
      .map(_.getName).filter(_.endsWith(TrainerShards.BlendSuffix))
      .sorted.head
    val pPath = blendDir.resolve(part)
    val pBytes = java.nio.file.Files.readAllBytes(pPath)
    val pPatched = pBytes.clone()
    pPatched(pPatched.length - 1) =
      (pPatched(pPatched.length - 1) ^ 0x1).toByte
    java.nio.file.Files.write(pPath, pPatched)
    java.nio.file.Files.deleteIfExists(blendDir.resolve("." + part +
      ".crc"))
    val blendBoom = intercept[IllegalArgumentException] {
      TrainerShards.verifyBlendSchedule(spark, dir, 0)
    }
    assert(blendBoom.getMessage.contains(part) &&
      blendBoom.getMessage.contains("md5"), blendBoom.getMessage)
  }

  private def exceptionChain(t: Throwable): Seq[String] =
    if (t == null) Nil
    else Option(t.getMessage).toSeq ++ exceptionChain(t.getCause)

  test("manifest checksums: verifyManifest passes a pristine shard " +
      "set, names the stem on a flipped byte or a missing file, and " +
      "refuses a pre-checksum manifest instead of vacuously passing") {
    val seqs = materialize(fixture, seqLen = 16)
    val dir = tmpDir()
    val manifest = TrainerShards.write(seqs, "lang", "seq_id",
      "token_ids", 2, dir)
    // the returned frame and the shipped manifest agree on checksums,
    // and both equal the actual file bytes
    assert(manifest.columns.toSeq.containsSlice(
      Seq("tokens_md5", "idx_md5")))
    TrainerShards.verifyManifest(spark, dir) // pristine: no throw
    // flip one payload byte in one .tokens file
    val stem = TrainerShards.fileStem("en")
    val tok = java.nio.file.Paths.get(dir,
      stem + TrainerShards.TokensSuffix)
    val blob = java.nio.file.Files.readAllBytes(tok)
    val patched = blob.clone()
    patched(patched.length / 2) = (patched(patched.length / 2) ^ 0x7f)
      .toByte
    java.nio.file.Files.write(tok, patched)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir,
      "." + stem + TrainerShards.TokensSuffix + ".crc"))
    val flipped = intercept[IllegalArgumentException] {
      TrainerShards.verifyManifest(spark, dir)
    }
    assert(flipped.getMessage.contains(stem) &&
      flipped.getMessage.contains("md5"),
      s"flipped byte not named: ${flipped.getMessage}")
    java.nio.file.Files.write(tok, blob)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir,
      "." + stem + TrainerShards.TokensSuffix + ".crc"))
    // a committed file missing entirely (the zombie-commit failure
    // class the rename-first protocol exists to prevent) is loud too
    val idxFile = java.nio.file.Paths.get(dir,
      stem + TrainerShards.IdxSuffix)
    val idxBytes = java.nio.file.Files.readAllBytes(idxFile)
    java.nio.file.Files.delete(idxFile)
    val missing = intercept[IllegalArgumentException] {
      TrainerShards.verifyManifest(spark, dir)
    }
    assert(missing.getMessage.contains("MISSING"),
      s"missing file not named: ${missing.getMessage}")
    java.nio.file.Files.write(idxFile, idxBytes)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir,
      "." + stem + TrainerShards.IdxSuffix + ".crc"))
    // a legacy manifest without checksums refuses
    val mPath = java.nio.file.Paths.get(dir, TrainerShards.ManifestName)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(java.nio.file.Files.readAllBytes(mPath))
    tree.get("strata").elements().forEachRemaining { n =>
      val o = n.asInstanceOf[com.fasterxml.jackson.databind.node
        .ObjectNode]
      o.remove("tokens_md5"); o.remove("idx_md5"); ()
    }
    java.nio.file.Files.write(mPath, mapper.writeValueAsBytes(tree))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir,
      "." + TrainerShards.ManifestName + ".crc"))
    assert(intercept[IllegalArgumentException] {
      TrainerShards.verifyManifest(spark, dir)
    }.getMessage.contains("pre-checksum"))
  }

  test("epoch-order positions are bound-checked at read: a corrupted " +
      "position >= the shard's sequence count fails loudly instead of " +
      "silently dropping a consumption step at the resume join") {
    val seqs = materialize(fixture, seqLen = 16)
    val dir = tmpDir()
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 2, dir)
    TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = 0)
    TrainerShards.readEpochOrder(spark, dir, 0).collect() // pristine ok
    val stem = TrainerShards.fileStem("en")
    val ord = java.nio.file.Paths.get(dir,
      TrainerShards.epochDirName(0), stem + TrainerShards.OrdSuffix)
    val blob = java.nio.file.Files.readAllBytes(ord)
    // overwrite the FIRST position with an out-of-range value (the
    // stratum's own count — positions are 0-based, so count is one
    // past the last valid)
    val n = TrainerShards.readShard(spark, dir, "en")._2.length.toLong
    val bad = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(n).array()
    System.arraycopy(bad, 0, blob, 16, 8)
    java.nio.file.Files.write(ord, blob)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      dir, TrainerShards.epochDirName(0),
      "." + stem + TrainerShards.OrdSuffix + ".crc"))
    val boom = intercept[Exception] {
      TrainerShards.readEpochOrder(spark, dir, 0).collect()
    }
    assert(exceptionChain(boom).exists(_.contains("holds only")),
      s"out-of-range position read silently: ${exceptionChain(boom)}")
    // the composed resume read hits the same wall — a sequence can
    // never silently vanish from an epoch
    val boom2 = intercept[Exception] {
      TrainerShards.readInEpochOrder(spark, dir, 0).collect()
    }
    assert(exceptionChain(boom2).exists(_.contains("holds only")))
  }

  test("atomic publish: a re-write replaces the shard set in one swap " +
      "and leaves no staging or retired residue; stale strata vanish") {
    val dir = tmpDir()
    TrainerShards.write(materialize(fixture, 32), "lang", "seq_id",
      "token_ids", 1, dir)
    assert(TrainerShards.listShards(spark, dir).toSet ==
      Set("en", "de", "fr"))
    // second publish from a reduced corpus: 'fr' must vanish (swap, not
    // merge) and the parent dir must hold no .staging-*/.old-* residue
    TrainerShards.write(
      materialize(fixture.filter(col("lang") =!= "fr"), 32),
      "lang", "seq_id", "token_ids", 1, dir)
    assert(TrainerShards.listShards(spark, dir).toSet ==
      Set("en", "de"))
    val parent = java.nio.file.Paths.get(dir).getParent
    val residue = java.nio.file.Files.list(parent).iterator()
    val bad = Iterator.continually(residue)
      .takeWhile(_.hasNext).map(_.next().getFileName.toString)
      .filter(n => n.startsWith(
        java.nio.file.Paths.get(dir).getFileName.toString + ".staging-")
        || n.startsWith(
          java.nio.file.Paths.get(dir).getFileName.toString + ".old-"))
      .toSeq
    assert(bad.isEmpty, s"publish left residue: $bad")
  }

  test("oversized ids refuse the width loudly; sequences larger than " +
      "one document pack contiguously (straddles cross file positions " +
      "seamlessly)") {
    import spark.implicits._
    val seqs = Seq(("en", 0L, Seq(1L, 2L, 300L)))
      .toDF("lang", "seq_id", "token_ids")
    val e = intercept[Exception] {
      TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 1,
        tmpDir())
    }
    // the kernel's loud per-id width check (surfaced directly or
    // wrapped in a task failure, depending on where codegen folds it)
    def hasWidthMsg(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("fit")) ||
        hasWidthMsg(t.getCause))
    assert(hasWidthMsg(e), s"unexpected failure: $e")
    // straddle continuity: tiny budget forces straddles; the blob must
    // still be the uncut concatenated stream
    val straddled = materialize(fixture, seqLen = 7)
    assert(straddled.filter(size(col("doc_spans")) > 1).count() > 0 ||
      straddled.count() > fixture.count(),
      "fixture failed to produce straddles at seqLen=7")
    val dir = tmpDir()
    TrainerShards.write(straddled, "lang", "seq_id", "token_ids", 1, dir)
    val en = fixture.filter(col("lang") === "en").collect()
      .sortBy(_.getLong(0)).map(_.getString(2)).mkString("")
    val blob = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      dir, TrainerShards.fileStem("en") + TrainerShards.TokensSuffix))
    assert(blob.sameElements(en.getBytes("UTF-8")),
      "straddled sequences broke blob contiguity")
  }

  test("distributed read: TrainerShards.read returns every stratum's " +
      "sequences byte-identically to the driver reference reader, at " +
      "width 2 and width 1, with file-order seq_idx") {
    val seqs = materialize(fixture, seqLen = 32)
    for (width <- Seq(1, 2)) {
      val dir = tmpDir()
      TrainerShards.write(seqs, "lang", "seq_id", "token_ids", width,
        dir)
      val dist = TrainerShards.read(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Long](2))
        .toMap
      val strata = TrainerShards.listShards(spark, dir)
      assert(strata.nonEmpty)
      for (s <- strata) {
        val (w, ref) = TrainerShards.readShard(spark, dir, s)
        assert(w == width)
        ref.zipWithIndex.foreach { case (ids, i) =>
          assert(dist((s, i.toLong)) == ids,
            s"distributed read diverged at ($s, $i), width $width")
        }
      }
      assert(dist.size == strata.map(s =>
        TrainerShards.readShard(spark, dir, s)._2.size).sum)
    }
    // a corrupt idx (bad magic) fails loudly, never mis-slices
    val dir = tmpDir()
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 1, dir)
    val idxPath = java.nio.file.Paths.get(dir,
      TrainerShards.fileStem("en") + TrainerShards.IdxSuffix)
    val bytes = java.nio.file.Files.readAllBytes(idxPath)
    bytes(0) = 'X'.toByte
    java.nio.file.Files.write(idxPath, bytes)
    val e = intercept[Exception] {
      TrainerShards.read(spark, dir).collect()
    }
    // the kernel's "bad magic" refusal surfaces wrapped in Spark's
    // per-file read failure — loud either way, never mis-sliced rows
    def loud(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(m =>
        m.contains("magic") || m.contains("en.idx")) || loud(t.getCause))
    assert(loud(e), s"unexpected failure: $e")
  }

  test("strata with unsafe filesystem characters map to one reversible " +
      "file stem; empty input publishes an empty shard set") {
    import spark.implicits._
    val seqs = Seq(("weird/str atum:1", 0L, Seq(1L, 2L)))
      .toDF("lang", "seq_id", "token_ids")
    val dir = tmpDir()
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 1, dir)
    assert(TrainerShards.listShards(spark, dir) ==
      Seq("weird/str atum:1"))
    val (_, got) = TrainerShards.readShard(spark, dir,
      "weird/str atum:1")
    assert(got == Seq(Seq(1L, 2L)))
    val empty = tmpDir()
    TrainerShards.write(seqs.filter(lit(false)), "lang", "seq_id",
      "token_ids", 1, empty)
    assert(TrainerShards.listShards(spark, empty).isEmpty)
    // an empty set still verifies (manifest declares nothing; the
    // binaryFile glob must not trip on zero matches)
    assert(TrainerShards.verifyManifest(spark, empty).count() == 0)
  }

  test("provenance rides the manifest verbatim: the tokenizer/corpus " +
      "identity a loader must check before trusting the ids " +
      "round-trips; absent provenance reads as empty") {
    import spark.implicits._
    val seqs = Seq(("en", 0L, Seq(1L, 2L)))
      .toDF("lang", "seq_id", "token_ids")
    val dir = tmpDir()
    val prov = Map("tokenizer_md5" -> "abc123",
      "corpus_snapshot" -> "2026-08-16", "pipeline" -> "graft-r15")
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 1, dir,
      provenance = prov)
    assert(TrainerShards.readProvenance(spark, dir) == prov)
    // still verifies with provenance present
    TrainerShards.verifyManifest(spark, dir)
    // default write carries an EMPTY provenance object, not a missing
    // field — and reads back empty
    val plain = tmpDir()
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 1, plain)
    assert(TrainerShards.readProvenance(spark, plain).isEmpty)
    // empty keys refuse
    assert(intercept[IllegalArgumentException] {
      TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 1,
        tmpDir(), provenance = Map("" -> "x"))
    }.getMessage.contains("non-empty"))
  }
}
