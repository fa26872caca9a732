package graft.queries

import graft.io.Tables
import graft.ops.Profile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The column census over `documents`, oracle-checked on its exact
  * fields (rows, nulls, min/max — the HLL estimate is engine-specific
  * by nature and is dropped from the oracle row; ProfileSpec bounds it).
  * All profiled columns are BIGINT/VARCHAR, so the string rendering of
  * min/max is engine-identical.
  */
object ProfileQueries {

  val Cols = Seq("doc_id", "lang", "source", "n_chars")

  def x1Profile(s: SparkSession, dir: String): DataFrame =
    Profile.columns(Tables.documents(s, dir), Cols)
      .select("column", "n_rows", "n_null", "min", "max")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_profile" -> (x1Profile _)
  )

  val oracle: Map[String, String] = Map(
    "x1_profile" -> Cols.map { c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  count(*) - count($c) AS n_null,
         |  min($c)::VARCHAR AS min, max($c)::VARCHAR AS max
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")
  )
}
