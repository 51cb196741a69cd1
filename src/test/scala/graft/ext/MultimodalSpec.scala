package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "an image like payload with enough bytes"),
      (1L, "audio payload text"),
      (2L, "video payload text here"),
      (3L, "x")
    ).toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
  }

  test("withPayload: binary column + modality metadata, deterministic") {
    val m = Multimodal.withPayload(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[String]("modality"), r.getAs[Array[Byte]]("payload"))))
      .toMap
    assert(m(0L)._1 == "image" && m(1L)._1 == "audio" && m(2L)._1 == "video" && m(3L)._1 == "image")
    assert(new String(m(1L)._2, "UTF-8") == "audio payload text")
  }

  test("typed mapPartitions decoder agrees with its declarative SQL twin") {
    val typed = Multimodal.extractFeatures(spark, Multimodal.withPayload(docs))
      .collect().map(f => f.doc_id -> ((f.n_bytes, f.width, f.height, f.sample_rate, f.checksum))).toMap
    // the declarative twin from ExtQueries, restricted to the same docs
    val b0 = ascii(substring(col("text"), 1, 1))
    val b1 = ascii(substring(col("text"), 2, 1))
    val checksum = expr(
      "aggregate(sequence(1, length(text)), 0L, (acc, i) -> (acc * 131 + ascii(substring(text, i, 1))) % 1000000007)")
    val declared = docs.select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image").when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        length(col("text")).cast("long").as("n_bytes"), b0.as("b0"), b1.as("b1"), checksum.as("ck"))
      .collect().map { r =>
        val (m, b0v, b1v) = (r.getAs[String]("modality"), r.getAs[Int]("b0"), r.getAs[Int]("b1"))
        val (w, h, sr) = m match {
          case "image" => ((b0v % 40 + 1) * 16, (b1v % 30 + 1) * 16, 0)
          case "audio" => (0, 0, (b0v % 6 + 1) * 8000)
          case _       => ((b1v % 40 + 1) * 16, (b0v % 30 + 1) * 16, 0)
        }
        r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_bytes"), w, h, sr, r.getAs[Long]("ck")))
      }.toMap
    assert(typed == declared)
  }
}
