package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DateType, DoubleType, IntegerType}

class TransformSpec extends SparkSpec {
  import Transform._

  private def raw = {
    import spark.implicits._
    Seq(("1", "2.345", "2020-03-07"), ("2", "2.355", "2020-12-31"))
      .toDF("cnt", "occ", "date")
  }

  test("castTypes applies int/rounded-double/date and skips absent fields") {
    val out = castTypes(raw, Seq(
      CastSpec(ToInt, Seq("cnt", "not_there")),
      CastSpec(ToRounded(2), Seq("occ")),
      CastSpec(ToDate, Seq("date"))))
    assert(out.schema("cnt").dataType == IntegerType)
    assert(out.schema("occ").dataType == DoubleType)
    assert(out.schema("date").dataType == DateType)
    // Spark round = HALF_UP, matching the reference (SURVEY §2.2 P9)
    val occs = out.select("occ").collect().map(_.getDouble(0)).toSet
    assert(occs == Set(2.35, 2.36))
  }

  test("castTypes ToRounded: HALF_UP law vs the JDK BigDecimal reference (300 seeded + edges)") {
    import spark.implicits._
    // the reference's DecimalN semantics (transform_functions.py:32-39)
    // is java.math HALF_UP on the double's shortest decimal repr —
    // Spark's round(double, n) goes through BigDecimal.valueOf the
    // same way, so the law must hold exactly, including the classic
    // x.xx5 cases whose nearest double sits below the literal
    val rng = new scala.util.Random(42)
    val vals = Seq.fill(300)(f"${(rng.nextInt(2000000) - 1000000) / 1000.0}%.6f") ++
      Seq("1.005", "2.675", "-1.005", "0.125", "-0.125", "999.994999")
    val out = castTypes(vals.toDF("v"),
        Seq(CastSpec(ToRounded(2), Seq("v"))))
      .collect().map(_.getDouble(0))
    val expect = vals.map(s => java.math.BigDecimal.valueOf(s.toDouble)
      .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue)
    assert(out.toSeq == expect, out.toSeq.zip(expect).filter(p => p._1 != p._2).take(5).toString)
  }

  test("upperFirstCols / lowerCols are inverse-ish metadata renames") {
    val up = upperFirstCols(raw)
    assert(up.columns.toSeq == Seq("Cnt", "Occ", "Date"))
    assert(lowerCols(up).columns.toSeq == Seq("cnt", "occ", "date"))
  }

  test("withDateParts derives int Year and zero-padded string Month") {
    val out = withDateParts(raw.withColumn("date", col("date").cast(DateType)), "date")
    val rows = out.select("Year", "Month").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSet == Set((2020, "03"), (2020, "12")))
  }

  test("fillNumericNulls zeroes numeric nulls only") {
    import spark.implicits._
    val df = Seq((Some(1), Option.empty[Int], "x"), (None, Some(5), "y"))
      .toDF("a", "b", "s")
    val out = fillNumericNulls(df)
    assert(out.collect().map(r => (r.getInt(0), r.getInt(1))).toSet == Set((1, 0), (0, 5)))
  }
}
