package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every capability the engine ships, in SURVEY §7.3 order followed by
    * the LLM-pipeline extensions. */
  def specs: Seq[QuerySpec] =
    (ops.Parity.all :+ etl.StarSchema.spec :+ etl.StarSchema.summarySpec :+
      sources.Io.writeRoundtrip :+ sources.Io.jdbcRoundtrip :+
      sources.Io.orcRoundtrip :+ sources.Io.csvRoundtrip :+
      sources.Io.jsonRoundtrip) ++
      ops.Behavior.all ++
      ops.Extended.all ++ ops.AsOf.all ++ ops.Bucketed.all ++ ops.Etl.all ++
      ops.Graph.all ++ ops.Relational.all ++ ops.Sketches.all ++
      report.Analytics.all ++
      llm.TextOps.all ++ llm.Dedup.all ++ llm.Similarity.all ++
      llm.Multimodal.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    etl.StarSchema.spec.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
