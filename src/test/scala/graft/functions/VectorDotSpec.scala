package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Similarity

class VectorDotSpec extends SparkSpec {

  test("vector_dot is bit-identical to the declarative zip_with/aggregate fold") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val df = Seq.tabulate(50) { i =>
      (i.toLong, Array.fill(64)(rng.nextFloat() * 2 - 1), Array.fill(64)(rng.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
    val both = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotDeclarative(col("a"), col("b")).as("declarative"))
    // bitwise equality (not epsilon): same in-order double accumulation
    assert(both.filter(col("native") =!= col("declarative")).count() == 0)
  }

  test("vector_dot nulls: mismatched lengths, null element, null array") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (2L, Array(1.0f), Array(3.0f, 4.0f))).toDF("id", "a", "b")
    val out = df.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(11.0))
    assert(out(2L).isEmpty) // length mismatch -> NULL, like zip_with padding
    // SQL registration (usable from spark.sql too)
    assert(spark.sql("SELECT vector_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
      .collect().head.getDouble(0) == 2.0)
  }
}
