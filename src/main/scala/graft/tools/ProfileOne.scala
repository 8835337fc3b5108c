package graft.tools

/** Dev tool: time a single SparkEntry query (wall + process-CPU per
  * pass) at any SF dir, for per-query scale attribution without
  * running the whole ScaleTrend harness.
  * `runMain graft.tools.ProfileOne <sfDir> <passes> <queryName> [...]`
  * Passing the ScaleTrend sf1 dir synthesizes it first if absent.
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2)
    val spark = graft.core.Graft.session("graft-profile-one")
    spark.sparkContext.setLogLevel("WARN")
    val sf1Dir =
      s"${System.getProperty("java.io.tmpdir")}/graft_synth_sf1"
    if (dir == sf1Dir) {
      ScaleTrend.synthesizeSf1(spark, "/root/testdata/sf0.1", sf1Dir)
      ScaleTrend.synthesizeSf1Lineitem(spark, "/root/testdata/sf0.1",
        sf1Dir)
    }
    val osBean =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def cpuSec: Double = osBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        b.getProcessCpuTime / 1e9
      case _ => 0.0
    }
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    for (n <- names; p <- 1 to passes) {
      val t0 = System.nanoTime()
      val c0 = cpuSec
      val g0 = gcMs
      val cnt = graft.SparkEntry.queries(n)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = cpuSec - c0
      val gc = (gcMs - g0) / 1e3
      println(f"PROFILE $n pass $p: wall $wall%.2f s cpu $cpu%.2f s " +
        f"par ${cpu / math.max(wall, 1e-9)}%.2f gc $gc%.2f s rows $cnt")
    }
    spark.stop()
  }
}
