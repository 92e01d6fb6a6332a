package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The queries map is assembled from graft.queries.* via [[QueryRegistry]];
  * every entry is one operator demo from SURVEY.md §2 with (where
  * SQL-expressible) a DuckDB oracle over the same testdata tables.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-style pricing summary — scan → filter → hash agg → sort. */
  def entry(spark: SparkSession): DataFrame =
    QueryRegistry.byName("q01_pricing_summary").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryRegistry.all.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin.trim)).toMap
}
