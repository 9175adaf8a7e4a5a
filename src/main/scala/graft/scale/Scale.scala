package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: the knobs a 1000-executor deployment needs that small
  * tests don't force — skew-salted joins and partitioned storage layout.
  * Semantics-preserving (specs assert equivalence to the plain forms);
  * the point is the shuffle shape.
  */
object Scale {

  /** Skew-salted equi join of a skewed fact against a dimension: the fact
    * key is salted into `saltBuckets` sub-keys and the dim side is
    * replicated once per bucket, so one hot key spreads over
    * `saltBuckets` reducers instead of melting a single one. AQE's skew
    * handling covers sort-merge joins at runtime; explicit salting remains
    * the tool for hash-partitioned aggregations downstream of the join or
    * deliberately pinned partitioning.
    *
    * Equivalent to `fact.join(dim, factKey === dimKey, "inner")` for
    * non-null keys.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    val salted = fact.withColumn("__salt",
      pmod(hash(col(factKey), monotonically_increasing_id()),
        lit(saltBuckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted
      .join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Bucketed table layout: pre-shuffle the data once at write time so
    * every later equi-join/aggregation on the bucket key is co-located —
    * repeated joins pay zero exchanges (the dominant cost at 100 TB).
    * Bucket counts must match across tables meant to join. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Date-partitioned parquet layout: the 100 TB posture for fact tables —
    * writes land under `path/<partitionCol>=.../part-*.parquet` so date
    * filters prune whole directories (dynamic partition pruning applies to
    * joins on the partition key). */
  def writePartitionedByDay(df: DataFrame, tsCol: String,
      path: String): Unit =
    df.withColumn("__day", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("__day")
      .parquet(path)
}
