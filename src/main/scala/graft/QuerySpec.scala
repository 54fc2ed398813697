package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark implementation plus (when
  * SQL-expressible) the ANSI-SQL oracle the driver runs in DuckDB over the
  * same parquet tables. `oracle == None` → driver records a rows-only
  * check (reserved for ops whose semantics don't project onto SQL).
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
