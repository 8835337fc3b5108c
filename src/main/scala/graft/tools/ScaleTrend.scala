package graft.tools

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-trend measurement for the headline dedup/ANN/graph/recursive
  * operators: times each at sf0.01, sf0.1, and a SYNTHESIZED sf1
  * (10× sf0.1), recording wall seconds (min across passes),
  * process-CPU seconds (MIN across passes — warm cpu; a cold pass's
  * JIT or in-pass fixture build can never enter the artifact), and
  * result row counts per scale into `scale_trend.json` — the evidence
  * that converts "designed linear" into "measured ≈linear", and the
  * cheap detector for constant-factor cliffs (UnionLoop iteration
  * overhead, capped-LSH cache growth) before a real cluster finds
  * them.
  *
  * sf1 synthesis (from the driver's sf0.1 parquet, never mutated):
  * 10 replicas with id offsets. Document text gets a PER-REPLICA token
  * suffix, so within-replica near-dup structure is preserved exactly
  * (both sides of a pair transform identically) while CROSS-replica
  * token vocabularies are disjoint — shingle Jaccard across replicas
  * is 0, so true pair/cluster counts scale exactly 10×: the workload
  * grows linearly BY CONSTRUCTION and any superlinear runtime is the
  * engine's fault, not the generator's. Embeddings perturb each
  * replica by a deterministic per-(replica, dim) offset (no exact
  * duplicates, no structural requirement); orders offset ids and keep
  * the date range, so q40's recursion depth stays constant while its
  * fact side grows 10× — exactly its designed scale shape.
  *
  * `runMain graft.tools.ScaleTrend [passes]` (default 2; per-query min).
  */
object ScaleTrend {

  private val Stride = 10000000L
  private val Replicas = 10
  private val SynthFiles = 32

  private[tools] def synthesizeSf1(spark: SparkSession, srcDir: String,
      outDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$outDir/_DONE"))) return
    val ks = spark.range(0, Replicas).select(col("id").as("k"))

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    docs.crossJoin(ks)
      .select(
        (col("doc_id") + col("k") * Stride).as("doc_id"),
        when(col("k") === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_r"), col("k")))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      // 32 output files, not 1: the crossJoin inherits the single-file
      // source's one split, and a one-file sf1 corpus makes every
      // map-heavy measurement SERIAL (one input split under the 128 MB
      // maxPartitionBytes default) — wall ratios then measure the
      // layout, not the operator. Real corpora are many files; the
      // round-12 trend run measured par ≈ 1.0 on exactly the map-side
      // BPE rows before this repartition.
      .repartition(SynthFiles)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    emb.crossJoin(ks)
      .select((col("vec_id") + col("k") * Stride).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + ((col("k") * 37 + i * 17) % 97 - lit(48))
            .cast("float") * lit(0.01f)).as("embedding"),
        col("label"))
      .repartition(SynthFiles)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    val orders = spark.read.parquet(s"$srcDir/orders.parquet")
    orders.crossJoin(ks)
      .select((col("o_orderkey") + col("k") * Stride).as("o_orderkey"),
        (col("o_custkey") + col("k") * Stride).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .repartition(SynthFiles)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    synthesizeSf1Lineitem(spark, srcDir, outDir)
    fs.create(new org.apache.hadoop.fs.Path(s"$outDir/_DONE")).close()
  }

  /** lineitem replication for x74 (Z-order key over orderkey/partkey),
    * guarded separately so a synthesis dir written before x74 existed
    * backfills just this table instead of rebuilding everything.
    */
  private[tools] def synthesizeSf1Lineitem(spark: SparkSession, srcDir: String,
      outDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done = new org.apache.hadoop.fs.Path(s"$outDir/_DONE_LINEITEM")
    if (fs.exists(done)) return
    val ks = spark.range(0, Replicas).select(col("id").as("k"))
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    li.crossJoin(ks)
      .select((col("l_orderkey") + col("k") * Stride).as("l_orderkey"),
        (col("l_partkey") + col("k") * Stride).as("l_partkey"),
        col("l_linenumber"), col("l_quantity"))
      .repartition(SynthFiles)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    fs.create(done).close()
  }

  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 2
    val spark = Graft.session("graft-scale-trend")
    spark.sparkContext.setLogLevel("WARN")
    val osBean =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def cpuSec: Double = osBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        b.getProcessCpuTime / 1e9
      case _ => 0.0
    }

    val sf1Dir = s"${System.getProperty("java.io.tmpdir")}/graft_synth_sf1"
    println("=== synthesizing sf1 (10x sf0.1, disjoint replica vocab)")
    synthesizeSf1(spark, "/root/testdata/sf0.1", sf1Dir)
    synthesizeSf1Lineitem(spark, "/root/testdata/sf0.1", sf1Dir)

    val headline = Seq("x3_jaccard_pairs", "x4_minhash_pairs",
      "x60_incremental_lsh", "x62_indexed_incremental",
      "x56_dedup_clusters_star", "x67_seed_distance", "x61_knn_pq",
      "x63_knn_pq_indexed", "q40_recursive_spine",
      "x68_incremental_clusters",
      // round 9: the exact-substring family (duplicated n-gram
      // coverage + removal — x58's per-doc rebuild is the shape a 10x
      // step would expose) and the dHash media-dedup path
      "x57_dup_ngram_coverage", "x58_remove_dup_ngrams",
      "x66_image_hash_pairs",
      // round 9 (late): the new curation/layout/tokenizer families —
      // x73/x74 are map-side + one tiny agg exchange (should stay
      // ~linear in scan cost), x75 trains on the histogram (the sf1
      // synthesis grows the vocab 10x via per-replica suffixes — the
      // honest worst case), x76 encodes distinct words once then
      // probes map-side
      "x72_url_curation", "x73_shuffle_shards", "x74_zorder_layout",
      "x75_bpe_train", "x76_bpe_encode", "x77_domain_quota",
      // round 9 (late): the learned quality classifier — x81 frozen-
      // weights inference is a pure map pass (should track scan cost),
      // x82 trains fresh per scale (iters × one sample pass; the sf1
      // "sample" is the full synthesized corpus — the honest worst
      // case for the per-iteration job overhead)
      "x81_quality_score", "x82_quality_train",
      // round 10: the end-to-end crawl composition (x78 — the row a
      // 100 TB operator actually runs: WARC→extract→dedup→quota, every
      // hand-off measured) and the media legs (x71 audio decode, x80
      // MP4 container metadata — both batched map passes that should
      // track scan cost)
      "x78_crawl_pipeline", "x71_audio_features", "x80_video_meta",
      // round 10 (late): PSL domain resolution (map-side kernel),
      // MJPEG frame decode (persisted fixture; times the codec chain),
      // mixture epochs (map-side explode), classifier calibration
      // (scoring pass + thresholds-row exchange), revision dedup (one
      // max_by group pass), crawl diff (one full-outer join)
      "x83_psl_domains", "x84_video_frames", "x85_source_epochs",
      "x86_quality_calibration", "x87_latest_per_url", "x88_crawl_diff",
      // round 10 (last): Unicode NFC normalization — a compiled map
      // pass with the isNormalized fast path; should track scan cost
      "x89_unicode_nfc",
      // round 11: IDN PSL resolution (map-side kernel + IDNA bridge),
      // byte-BPE training (histogram + driver merge loop — the sf1
      // vocab is the honest 10x worst case), and the byte-BPE encode+
      // decode round trip (distinct-word encode, gated join-back,
      // per-doc reassembly, unmap kernel)
      "x90_idn_domains", "x91_bpe_bytes_train",
      "x92_bpe_bytes_roundtrip",
      // round 11 (late): full-fidelity byte-BPE — GPT-2 space-
      // preserving pre-tokenization, whole-document reconstruction —
      // and its zero-shuffle map-side kernel twin
      "x93_bpe_full_fidelity", "x94_bpe_mapside",
      // round 11 (last): packing budgeted by real tokenizer counts —
      // kernel count projection + per-stratum prefix-sum window
      "x95_pack_token_budget",
      // round 12: materialized training sequences (explode+slice
      // fragments, (strata, seq_id)-keyed reassembly with seqLen-
      // bounded state) and sequence-level decontamination (IdsToText
      // decode + the x29 shingle probe over sequences)
      "x96_materialize_sequences", "x97_sequence_contamination",
      // round 12 (late): separator-aware materialization and the
      // vocab-sized token-frequency profile
      "x98_separator_sequences", "x99_token_frequency",
      // round 12 (last): the FIM corruption map pass and the
      // no-straddle first-fit fold (timed here; its recursive-CTE
      // oracle is minutes at sf1, so check_sf1 skips it — sf0.01/0.1
      // oracle rows stay the correctness evidence)
      "x100_fim_transform", "x101_pack_no_straddle",
      "x102_materialize_no_straddle", "x103_sft_loss_mask",
      // round 12 (post-refresh): packed SFT (first-fit fold + assembly
      // with mask/positions riding) and the DPO pair map pass
      "x104_packed_sft", "x105_preference_pairs",
      "x106_tokenizer_fertility",
      // round 12 (final): length-grouped batching (two windows),
      // sqrt-temperature mixture sampling (strata apportionment +
      // one rank window), best-of-n pairs (one max_by/min_by agg),
      // and the mid-epoch shuffle resume (one shard-keyed window)
      "x107_length_batches", "x108_temperature_sample",
      "x109_best_of_n", "x110_resume_shuffle",
      // round 12 (post-final): DSIR importance weights — two
      // bucket-bounded model aggs + broadcast term join + doc sum
      "x111_dsir_weights",
      // round 12 (post-final): BPE token-window chunking — pure map
      "x112_token_windows_bpe",
      // round 13: composed IVF-PQ index (build + probed compressed
      // query), trainer-shard write→binaryFile read-back pair,
      // window-free temperature sampling (hash-rate gate)
      "x113_knn_ivfpq_indexed", "x114_trainer_shards",
      "x115_temperature_approx", "x116_shard_readback",
      // round 14: epoch consumption-order sidecars (one stratum-keyed
      // exchange + distributed .ord read-back)
      "x117_epoch_order",
      // round 15: the cross-stratum blend schedule (map-side
      // closed-form global step + one part-keyed exchange + the
      // distributed part read-back joined to the .ord level)
      "x118_blend_schedule",
      // round 16: the run-level artifact — cross-epoch resume read
      // (two blends + two .ord levels + the prefix-sum offset union)
      // — and the Unigram Viterbi encode kernel (pure map-side)
      "x120_run_resume", "x121_unigram_encode",
      "x122_wordpiece_encode",
      // round 17: the distributed decode roundtrips (pure map-side
      // encode∘decode compositions) and the two tokenizer TRAINERS
      // (distributed histogram/seed + driver merge-loop/EM, then the
      // same roundtrip)
      "x123_unigram_roundtrip", "x124_wordpiece_roundtrip",
      "x125_wordpiece_train_roundtrip", "x126_unigram_train_roundtrip",
      "x127_wordpiece_pair_roundtrip",
      // round 18: the truncation/padding pair surface and the
      // offsets kernel (both pure map-side projections — their scale
      // shape is the scan)
      "x128_wordpiece_truncation", "x129_wordpiece_offsets",
      "x130_unigram_offsets", "x131_unigram_pair_truncation",
      "x132_chunk_spans",
      // round 18 (late): the byte-level lineage's assembled surface —
      // pair trunc/pad books, offsets kernel, provenance chunks (all
      // pure map-side; x135 is output-row-dominated like x132)
      "x133_bpe_pair_truncation", "x134_bpe_offsets",
      "x135_bpe_chunk_spans", "x136_llama3_shape",
      // round 18 (late): batch-longest padding — ONE 1-row max
      // exchange + broadcast + pure projection — and the cleanup
      // decode chain (pure map-side)
      "x137_batch_longest_pad", "x138_wordpiece_cleanup")
    val scales = Seq(
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1",
      "sf1" -> sf1Dir)

    def num(x: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(x))
    val out = new StringBuilder("{\n")
    out.append(""" "cpu_note":"cpu_sec is WARM (min across passes; a """ +
      """cold pass's JIT/fixture build cannot enter the artifact). """ +
      """Read cpu ratios against par (cpu/wall): at local[32] an """ +
      """expanding active-core count inflates cpu-seconds ~4-5x via """ +
      """memory-bandwidth contention - matched-parallelism evidence """ +
      """in CPU_TREND_ATTRIBUTION.md",""")
    out.append("\n")
    out.append(s""" "replicas":$Replicas,"passes":$passes,"scales":{""")
    var firstScale = true
    for ((label, dir) <- scales) {
      if (!firstScale) out.append(",")
      firstScale = false
      out.append(s"""\n  "$label":{""")
      var firstQ = true
      for (name <- headline) {
        // untimed setup: persist x68's prior-state fixture so the
        // timed runs measure the maintenance operator alone
        if (name == "x68_incremental_clusters")
          graft.queries.Extensions.x68Fixture(spark, dir)
        val runs = (0 until passes).map { _ =>
          spark.catalog.clearCache()
          val (w0, c0) = (System.nanoTime(), cpuSec)
          val rows = graft.SparkEntry.queries(name)(spark, dir).count()
          ((System.nanoTime() - w0) / 1e9, cpuSec - c0, rows)
        }
        val best = runs.minBy(_._1)
        // WARM cpu: the MIN across passes, independently of which
        // pass won wall — the x84 lesson generalized: a cold pass
        // (JIT + in-pass fixture/cache build) can win wall while
        // carrying hundreds of cpu-seconds of one-time work, and a
        // trend artifact recording that cpu reads as a bogus
        // superlinear per-row ratio (round 16's x112/x99/x93 family)
        val warmCpu = runs.map(_._2).min
        if (!firstQ) out.append(",")
        firstQ = false
        out.append(s"""\n   "$name":{"wall_sec":${num(best._1)},""" +
          s""""cpu_sec":${num(warmCpu)},""" +
          s""""par":${num(warmCpu / math.max(best._1, 1e-9))},""" +
          s""""rows":${best._3}}""")
        println(f"$label%-7s $name%-26s wall=${best._1}%8.2fs " +
          f"cpu=$warmCpu%8.2fs rows=${best._3}")
      }
      // BPE training throughput at a production-shaped merge count:
      // 1000 merges through the driver merge loop — the merges/sec
      // figure the per-merge distributed loop could never deliver
      // (2 Spark jobs × 1000 merges of scheduling overhead). The
      // fixture corpus has only 31 distinct words (nowhere near 1000
      // merges of pair mass), so the measurement widens the vocabulary
      // DETERMINISTICALLY with the sf1-synthesis device: every word
      // gets a per-document numeric suffix, giving a ~30k-word vocab —
      // the shape of a real tokenizer-training corpus. Includes the
      // histogram build, so it is the cost a user actually pays.
      val bpeRuns = (0 until passes).map { _ =>
        spark.catalog.clearCache()
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("text").isNotNull)
          .select(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_"), (col("doc_id") % 997).cast("string")))
            .as("text"))
        val (w0, c0) = (System.nanoTime(), cpuSec)
        val merges = graft.operators.Bpe.train(docs, "text",
          numMerges = 1000, minCount = 1L)
        ((System.nanoTime() - w0) / 1e9, cpuSec - c0, merges.size)
      }
      val bpeBest = bpeRuns.minBy(_._1)
      val mps = bpeBest._3 / bpeBest._1
      out.append(s""",\n   "bpe_train_1k_merges":{""" +
        s""""wall_sec":${num(bpeBest._1)},"cpu_sec":${num(bpeBest._2)},""" +
        s""""merges":${bpeBest._3},"merges_per_sec":${num(mps)}}""")
      println(f"$label%-7s bpe_train_1k_merges        " +
        f"wall=${bpeBest._1}%8.2fs merges=${bpeBest._3} " +
        f"merges/s=$mps%8.1f")
      // the BYTE-level twin at the same merge count and widened vocab:
      // byte symbols mean longer symbol sequences per word (UTF-8
      // bytes, not chars) — the honest extra pair mass a real
      // GPT-2-style training pays
      val bpeByteRuns = (0 until passes).map { _ =>
        spark.catalog.clearCache()
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("text").isNotNull)
          .select(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_"), (col("doc_id") % 997).cast("string")))
            .as("text"))
        val (w0, c0) = (System.nanoTime(), cpuSec)
        val merges = graft.operators.Bpe.trainBytes(docs, "text",
          numMerges = 1000, minCount = 1L)
        ((System.nanoTime() - w0) / 1e9, cpuSec - c0, merges.size)
      }
      val bb = bpeByteRuns.minBy(_._1)
      val bbMps = bb._3 / bb._1
      out.append(s""",\n   "bpe_bytes_train_1k_merges":{""" +
        s""""wall_sec":${num(bb._1)},"cpu_sec":${num(bb._2)},""" +
        s""""merges":${bb._3},"merges_per_sec":${num(bbMps)}}""")
      println(f"$label%-7s bpe_bytes_train_1k_merges  " +
        f"wall=${bb._1}%8.2fs merges=${bb._3} " +
        f"merges/s=$bbMps%8.1f")
      out.append("}")
    }
    out.append("\n}}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("scale_trend.json"),
      out.toString.getBytes("UTF-8"))
    println("=== wrote scale_trend.json")
    spark.stop()
  }
}
