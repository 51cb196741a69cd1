package graft

/** Single-query bench + plan dump — the drift-diagnosis tool the
  * PLANS.md ledger runs on. `Bench` measures the whole 113-query
  * surface in one JVM, which is the right round-over-round number but
  * the wrong instrument for diagnosing ONE query's drift: neighbors'
  * checkpoint blocks, JIT state and GC history all leak into a single
  * reading. This main runs exactly one named query in a fresh JVM —
  * warmup pass at sf0.001, then N timed passes at the target SF — and
  * prints per-pass times, min/median, and the formatted physical plan.
  *
  * Usage: runMain graft.BenchOne <queryName> [passes=5] [sfDir]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: BenchOne <queryName> [passes] [sfDir]"))
    val passes = if (args.length > 1) args(1).toInt else 5
    val sfDir = if (args.length > 2) args(2)
    else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = GraftSession.create()

    val warmDir = {
      val d = "/root/testdata/sf0.001"
      if (new java.io.File(d).exists()) d else sfDir
    }
    fn(spark, warmDir).count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    val times = (1 to passes).map { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      println(f"pass $i: $s%.3f s ($n rows)")
      s
    }
    val sorted = times.sorted
    println(f"$name @ $sfDir: min=${sorted.head}%.3f s median=${sorted(sorted.length / 2)}%.3f s over $passes passes")
    println(fn(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
