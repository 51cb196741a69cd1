package graft.queries

import graft.GraftSession

/** Diagnostic main (BenchOne's sibling): the novel-ANN serving
  * recall-vs-nprobe curve for one corpus — the measurement behind the
  * serving-nprobe rule in [[ExtQueries.novelCandidates]]. Prints one
  * line per probed-cell count; the stored index builds once (first
  * iteration) and every later point is probe-side only.
  *
  * Usage: runMain graft.queries.IvfProbeSweep [sfDir] [nprobe...]
  */
object IvfProbeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probes =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(2, 4, 6, 8, 12, 16)
    val spark = GraftSession.create()
    probes.foreach { m =>
      val r = ExtQueries.annNovelRecallAt(spark, sfDir, Some(m)).collect()(0)
      println(s"SWEEP nprobe=$m n_queries=${r.getLong(0)} " +
        s"n_matched=${r.getLong(1)} recall=${r.getDouble(2)}")
    }
    spark.stop()
  }
}
