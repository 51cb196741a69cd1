package graft.sources

import java.sql.DriverManager

import graft.SparkSpec
import graft.ops.Upsert

/** S9 live round-trip (reference `load_functions.py:2-60`): the staged
  * upsert is executed END TO END against a real embedded JDBC database
  * (Derby, already on the Spark classpath) — staging written through
  * the option map `jdbcStagedWriteOptions` builds, then the generated
  * postActions run over a live connection, exactly what the reference's
  * warehouse connector does after its staging load. The resulting
  * target table must equal `ops.Upsert.lwwUpsert`'s in-Spark result,
  * closing the gap between "generates the right SQL" and "the SQL
  * works".
  *
  * Identifiers are uppercase throughout: Spark's JDBC writer quotes
  * column names as given, while the generated postActions reference
  * them unquoted (Derby then uppercases) — uppercase keeps the two
  * resolution paths on the same name, as they would be on a
  * case-insensitive warehouse.
  */
class JdbcStagedUpsertSpec extends SparkSpec {

  private val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val url = "jdbc:derby:memory:graftS9;create=true"

  test("generated postActions against live Derby == lwwUpsert") {
    import spark.implicits._
    val target = Seq(
      (1L, 10L, "t1"), (2L, 10L, "t2"), (3L, 10L, "t3")
    ).toDF("ID", "VER", "VAL")
    val staging = Seq(
      (2L, 10L, "s2"), // tie on VER -> staging wins (>= delete rule)
      (3L, 5L, "s3"),  // strictly older -> target survives
      (4L, 10L, "s4")  // new key -> inserted
    ).toDF("ID", "VER", "VAL")

    val props = new java.util.Properties()
    props.setProperty("driver", DerbyDriver)
    target.write.mode("overwrite").jdbc(url, "TARGET", props)

    // staging load through the exact option map a warehouse caller builds
    val postActions = RawZone.stagedUpsertSql("STAGING", "TARGET", Seq("ID"), Some("VER"))
    val opts = RawZone.jdbcStagedWriteOptions(url, "STAGING", postActions)
    staging.write.format("jdbc")
      .options(opts).option("driver", DerbyDriver)
      .mode("overwrite").save()

    // the connector's warehouse side: run the postActions on a live
    // connection (split back on the ';' terminators the generator emits)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      opts("postActions").split(';').map(_.trim).filter(_.nonEmpty).foreach(st.execute)
    } finally conn.close()

    val live = spark.read.jdbc(url, "TARGET", props).orderBy("ID").collect().toSeq
    val expected = Upsert.lwwUpsert(target, staging, Seq("ID"), Some("VER"))
      .orderBy("ID").collect().toSeq
    assert(live == expected, s"live Derby result $live != lwwUpsert $expected")

    // S5/S6 live: the pushdown-query option shape (`jdbcQueryOptions`)
    // ships the whole statement to the database — the reference pushes
    // `select max(_SK_METRICS_FACT)` to its warehouse the same way
    // (main.py:252-271). The remote MAX must equal the in-Spark MAX.
    val remoteMax = spark.read.format("jdbc")
      .options(RawZone.jdbcQueryOptions(url, "SELECT MAX(VER) AS MAX_VER FROM TARGET"))
      .option("driver", DerbyDriver)
      .load()
    import org.apache.spark.sql.functions.max
    val sparkMax = Upsert.lwwUpsert(target, staging, Seq("ID"), Some("VER"))
      .agg(max("VER").as("MAX_VER"))
    assert(remoteMax.collect().toSeq == sparkMax.collect().toSeq)
  }
}
