package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the r9-verdict sf1 matrix: tiles the
  * driver-generated sf0.1 tables 10× into `target/sf1`, preserving
  * every fixture contract the queries rely on (source names, key
  * modulo classes, dimension tables, schema byte-for-byte) while
  * keeping the replicas HONESTLY DISTINCT where identity would be
  * pathological:
  *
  *  - document text in replica i>0 is a deterministic per-(replica,
  *    doc) Fisher–Yates word shuffle — token/length distributions
  *    (Zipf, Heaps, quality gates) are preserved exactly, but shingle
  *    sets decorrelate, so the corpus does not become an all-dups
  *    fixture where every doc has 9 near-copies;
  *  - embeddings in replica i>0 are cyclically rotated — an isometry
  *    (norms and within-replica cosine structure preserved) that
  *    decorrelates cross-replica neighborhoods;
  *  - fact keys offset by (max+1)·i; FK columns follow their replica;
  *    region/nation stay fixed (dimensions don't scale).
  *
  * Each table lands as a SINGLE `<table>.parquet` file (the driver's
  * layout, readable by both Spark and the DuckDB oracle).
  */
object GenScale {

  private def shuffleWords(text: String, seed: Long): String = {
    val words = text.split(" ", -1)
    val rnd = new scala.util.Random(seed)
    var k = words.length - 1
    while (k > 0) {
      val j = rnd.nextInt(k + 1)
      val tmp = words(k); words(k) = words(j); words(j) = tmp
      k -= 1
    }
    words.mkString(" ")
  }

  /** Write as ONE parquet FILE at `$out/$name.parquet` (not a
    * directory): Spark writes the single-part directory, then the part
    * file is moved up and the scaffolding removed.
    */
  private def writeOne(spark: SparkSession, df: DataFrame, out: String, name: String): Unit = {
    val tmp = s"$out/_gen_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(out).getFileSystem(conf)
    val part = fs.globStatus(new Path(s"$tmp/part-*.parquet"))(0).getPath
    val dest = new Path(s"$out/$name.parquet")
    fs.delete(dest, false)
    if (!fs.rename(part, dest)) sys.error(s"rename $part -> $dest failed")
    fs.delete(new Path(tmp), true)
    println(s"[gen] $name -> $dest")
  }

  final case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  final case class Emb(vec_id: Long, embedding: Seq[Float], label: Int)

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "target/sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.create()
    import spark.implicits._

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).collect()(0).getLong(0) + 1L
    val rep = spark.range(reps).select(col("id").as("_rep"))
    def tiled(df: DataFrame, offsets: Map[String, Long]): DataFrame = {
      val crossed = df.crossJoin(rep)
      val shifted = offsets.foldLeft(crossed) { case (d, (c, m)) =>
        d.withColumn(c, col(c) + col("_rep") * m)
      }
      shifted.drop("_rep").select(df.columns.map(col).toIndexedSeq: _*)
    }

    // dimensions: unchanged
    writeOne(spark, t("region"), out, "region")
    writeOne(spark, t("nation"), out, "nation")

    val mCust = maxOf(t("customer"), "c_custkey")
    val mSupp = maxOf(t("supplier"), "s_suppkey")
    val mPart = maxOf(t("part"), "p_partkey")
    val mOrd = maxOf(t("orders"), "o_orderkey")
    writeOne(spark, tiled(t("customer"), Map("c_custkey" -> mCust)), out, "customer")
    writeOne(spark, tiled(t("supplier"), Map("s_suppkey" -> mSupp)), out, "supplier")
    writeOne(spark, tiled(t("part"), Map("p_partkey" -> mPart)), out, "part")
    writeOne(spark, tiled(t("orders"),
      Map("o_orderkey" -> mOrd, "o_custkey" -> mCust)), out, "orders")
    writeOne(spark, tiled(t("lineitem"),
      Map("l_orderkey" -> mOrd, "l_partkey" -> mPart, "l_suppkey" -> mSupp)),
      out, "lineitem")

    val mEv = maxOf(t("events"), "event_id")
    val mUser = maxOf(t("events"), "user_id")
    writeOne(spark, tiled(t("events"),
      Map("event_id" -> mEv, "user_id" -> mUser)), out, "events")

    val nReps = reps
    val mDoc = maxOf(t("documents"), "doc_id")
    val docs = t("documents").as[Doc].flatMap { d =>
      (0 until nReps).iterator.map { i =>
        if (i == 0) d
        else {
          val text = shuffleWords(d.text, 1000000007L * i + d.doc_id)
          Doc(d.doc_id + i * mDoc, text, d.lang, d.source, text.length.toLong)
        }
      }
    }
    writeOne(spark, docs.toDF(), out, "documents")

    val mVec = maxOf(t("embeddings"), "vec_id")
    val emb = t("embeddings").as[Emb].flatMap { e =>
      (0 until nReps).iterator.map { i =>
        if (i == 0) e
        else {
          val dim = e.embedding.length
          val shift = (i * 7) % dim
          val rot = Seq.tabulate(dim)(k => e.embedding((k + shift) % dim))
          Emb(e.vec_id + i * mVec, rot, e.label)
        }
      }
    }
    writeOne(spark, emb.toDF(), out, "embeddings")

    spark.stop()
  }
}
