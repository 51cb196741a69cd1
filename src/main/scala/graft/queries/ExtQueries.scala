package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extension query set (SURVEY.md §7.3 step 5): dedup, similarity
  * search, text analysis, multimodal plumbing, event windows.
  * Populated operator-by-operator; see graft.ext.*.
  */
object ExtQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map()
  val oracleSql: Map[String, String] = Map()
}
