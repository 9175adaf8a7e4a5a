package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {

  /** One registered operator/query: the Spark program plus (when
    * SQL-expressible) a DuckDB oracle over the same parquet tables.
    * Column names must match between the two — the driver's compare sorts
    * columns by name before hashing values. */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  object Q {
    def apply(name: String, oracle: String)(
        fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, Some(oracle))
    def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, None)
  }
}
