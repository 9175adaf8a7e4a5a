package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Partition-pruned fact layouts + dynamic partition pruning
  * (VERDICT r6 "What's missing" #1 / next-round #2).
  *
  * The 100 TB posture for the reference's own query family
  * (reference sql/queries.sql:1-33 — date-ranged aggregates over the
  * fact table) is a DATE-PARTITIONED fact: writes land under
  * `o_month=<yyyymm>/part-*.parquet`, so
  *
  *   - a static month predicate prunes whole directories at PLAN time
  *     (the scan's `PartitionFilters`, zero data read outside the
  *     range — [[qPartitionPruned]]), and
  *   - a join against a filtered dimension prunes at RUN time via
  *     dynamic partition pruning (Spark inserts a
  *     `dynamicpruningexpression` subquery reusing the dim's broadcast
  *     — [[qDppJoin]]).
  *
  * Both are plan-guarded in PlanShapeSpec: a regression that silently
  * reads all 80 month directories fails the spec even though the
  * ANSWER would still be right. The oracle reads the ORIGINAL flat
  * `orders` table — so each gate also proves the partitioned
  * write+read round trip loses and invents nothing.
  *
  * At 100 TB: partition by day (not month) and combine with the
  * in-file clustering of `q_zorder_layout`; the write pattern below
  * (repartition by the partition column before partitionBy) is what
  * keeps output files at one-per-directory-per-task instead of
  * `shuffle.partitions × directories` small files — the #1 operational
  * failure of naive partitioned writes at scale. */
object PartitionOps {

  /** yyyymm month key of the order timestamp, Spark spelling. */
  private def monthKey(c: org.apache.spark.sql.Column) =
    (year(to_date(c)) * 100 + month(to_date(c))).cast("int")

  /** yyyymm month key, DuckDB spelling (same arithmetic). */
  private val MonthSql =
    "year(CAST(o_orderdate AS DATE))*100 + month(CAST(o_orderdate AS DATE))"

  // private[graft]: PartitionLayoutCacheSpec clears it to simulate a
  // fresh JVM hitting an already-built layout (the lost-race path)
  private[graft] val built = scala.collection.mutable.Set.empty[String]

  /** Length+mtime fingerprint of a source parquet file: keys the cached
    * layout directory so a CHANGED source table gets a fresh layout
    * instead of silently reusing a stale one (ADVICE r7 #3). The two
    * values are concatenated LOSSLESSLY (ADVICE r8: the earlier
    * len*31+mtime fold let a +31-byte length change cancel a −1 ms
    * mtime change); for a directory-shaped source the child count folds
    * in too, so add/remove-a-file rewrites can't alias a same-len
    * same-mtime root. */
  private def sourceFingerprint(s: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val kids = if (st.isDirectory) fs.listStatus(p).length else -1
    s"${java.lang.Long.toHexString(st.getLen)}_" +
      s"${java.lang.Long.toHexString(st.getModificationTime)}_$kids"
  }

  /** Build (once per source-fingerprint per JVM; reused across JVMs) a
    * month-partitioned layout of `table` under the JVM temp dir and
    * return its path. The pre-write `repartition(partCol)` co-locates
    * each month in one task so every partition directory gets ONE file —
    * without it each of the 32 shuffle tasks writes a sliver into each
    * directory (the classic small-files mistake of partitioned writes).
    *
    * Cross-JVM safety (ADVICE r7 #3): the layout is built in a private
    * `.build-<uuid>` staging dir and atomically RENAMED into place, so a
    * concurrent JVM (sbt forked test + bench) can never observe — or
    * overwrite-race — a half-written layout. If the rename loses the
    * race (dst already populated, local-FS rename of a dir onto a
    * non-empty dir fails), the winner's equivalent layout (same source
    * fingerprint) is used and the staging dir is discarded. */
  private[graft] def partitionedLayoutDir(s: SparkSession, d: String,
      table: String, partCol: String,
      key: org.apache.spark.sql.Column): String = synchronized {
    val safe = d.replaceAll("[^A-Za-z0-9.]", "_")
    val fp = sourceFingerprint(s, s"$d/$table.parquet")
    val dir =
      s"${sys.props("java.io.tmpdir")}/graft_part/${table}_${safe}_$fp"
    if (!built(dir)) {
      val target = new org.apache.hadoop.fs.Path(dir)
      val fs = target.getFileSystem(s.sparkContext.hadoopConfiguration)
      val success = new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")
      if (!fs.exists(success)) {
        val tmp = new org.apache.hadoop.fs.Path(
          dir + ".build-" + java.util.UUID.randomUUID().toString)
        Tables.load(s, d, table)
          .withColumn(partCol, key)
          .repartition(col(partCol))
          .write.mode("overwrite").partitionBy(partCol)
          .parquet(tmp.toString)
        fs.mkdirs(target.getParent)
        if (fs.exists(target) || !fs.rename(tmp, target)) {
          fs.delete(tmp, true)
          require(fs.exists(success),
            s"partitioned layout $dir unusable after lost build race")
        }
      }
      built += dir
    }
    dir
  }

  private[graft] def partitionedOrdersDir(s: SparkSession,
      d: String): String =
    partitionedLayoutDir(s, d, "orders", "o_month",
      monthKey(col("o_orderdate")))

  /** Ship-month-partitioned lineitem — the reference's OWN fact table in
    * the 100 TB layout (VERDICT r7 next #2: the layout trio proved the
    * machinery on `orders`, but q1–q4 — the queries a migrating user
    * actually runs — still read the flat fact). l_shipdate is a
    * timestamp, so the month key is direct year/month extraction. */
  private[graft] def partitionedLineitemDir(s: SparkSession,
      d: String): String =
    partitionedLayoutDir(s, d, "lineitem", "l_month",
      (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("int"))

  private[graft] def partitionedLineitem(s: SparkSession,
      d: String): DataFrame =
    s.read.parquet(partitionedLineitemDir(s, d))

  /** The partitioned fact as a DataFrame (schema: orders + o_month). */
  private[graft] def partitionedOrders(s: SparkSession,
      d: String): DataFrame =
    s.read.parquet(partitionedOrdersDir(s, d))

  private def centsSum = sum(round(col("o_totalprice") * 100, 0)
    .cast("long")).as("total_cents")

  /** STATIC partition pruning: a quarter's order volume off the
    * month-partitioned layout. The month predicate is a partition
    * filter — the scan lists 3 of 80 directories and reads no other
    * byte (PlanShapeSpec asserts `PartitionFilters` carries the bounds
    * and the data filter stays empty). The oracle computes the same
    * quarter from the flat table. */
  val qPartitionPruned: Q = Q("q_partition_pruned",
    s"""SELECT o_month, COUNT(*) AS n_orders,
       |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
       |         AS total_cents
       |FROM (SELECT CAST($MonthSql AS INT) AS o_month, o_totalprice
       |      FROM orders)
       |WHERE o_month BETWEEN 199601 AND 199603
       |GROUP BY o_month ORDER BY o_month""".stripMargin) { (s, d) =>
    partitionedOrders(s, d)
      .filter(col("o_month").between(199601, 199603))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"), centsSum)
      .orderBy("o_month")
  }

  /** DYNAMIC partition pruning: monthly order volume restricted to the
    * months in which customer 7 ordered — the months aren't knowable at
    * plan time, so Spark prunes the partitioned scan at RUN time with a
    * `dynamicpruningexpression` fed by the dim side's broadcast
    * (~9 of 80 directories actually read; PlanShapeSpec asserts the
    * dynamic filter is ON the scan). This is the TPC-DS
    * fact⋈date_dim-with-predicate shape, the single biggest scan-cost
    * lever on a date-partitioned 100 TB fact. */
  val qDppJoin: Q = Q("q_dpp_join",
    s"""WITH f AS (SELECT CAST($MonthSql AS INT) AS o_month, o_totalprice
       |           FROM orders),
       |dim AS (SELECT DISTINCT CAST($MonthSql AS INT) AS o_month
       |        FROM orders WHERE o_custkey = 7)
       |SELECT f.o_month, COUNT(*) AS n_orders,
       |       CAST(SUM(CAST(ROUND(f.o_totalprice*100) AS BIGINT)) AS BIGINT)
       |         AS total_cents
       |FROM f JOIN dim ON f.o_month = dim.o_month
       |GROUP BY f.o_month ORDER BY f.o_month""".stripMargin) { (s, d) =>
    val dim = Tables.load(s, d, "orders")
      .filter(col("o_custkey") === 7)
      .select(monthKey(col("o_orderdate")).as("o_month"))
      .distinct()
    partitionedOrders(s, d)
      .join(dim, "o_month")
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"), centsSum)
      .orderBy("o_month")
  }

  /** Build (idempotently per session) the bucketed orders/customer
    * tables for `d`: both bucketed ×8 on the customer key via
    * [[graft.scale.Scale.writeBucketed]] (one pre-shuffle at write
    * time), so every later equi-join on that key is co-located. Tables
    * are sfDir-suffixed — two scale factors never collide — and land in
    * the session warehouse (gitignored). */
  private[graft] def ensureBucketed(s: SparkSession,
      d: String): (String, String) = synchronized {
    val safe = d.replaceAll("[^A-Za-z0-9]", "_")
    val (to, tc) = (s"b_orders$safe", s"b_customer$safe")
    if (!s.catalog.tableExists(to) || !s.catalog.tableExists(tc)) {
      // the catalog is per-session but the warehouse DIRECTORY outlives
      // the JVM: a fresh session with a stale location gets
      // LOCATION_ALREADY_EXISTS from saveAsTable — drop both table and
      // leftover directory before writing
      Seq(to, tc).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir") + "/" + t.toLowerCase)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
      graft.scale.Scale.writeBucketed(
        Tables.load(s, d, "orders"), to, "o_custkey", buckets = 8)
      graft.scale.Scale.writeBucketed(
        Tables.load(s, d, "customer"), tc, "c_custkey", buckets = 8)
    }
    (to, tc)
  }

  /** CO-LOCATED join over the bucketed layout — the third leg of the
    * physical-layout story next to [[qPartitionPruned]] (directory
    * pruning) and [[qDppJoin]] (runtime pruning): both sides were
    * pre-shuffled ×8 on the customer key AT WRITE TIME, so the
    * per-customer join+rollup plans a SortMergeJoin with ZERO hash
    * exchanges (PlanShapeSpec asserts SelectedBucketsCount and the
    * absence of Exchange hashpartitioning). The `merge` hint keeps the
    * plan on SMJ — a broadcast join would also skip the exchange but
    * proves nothing about the layout; at 100 TB neither side of a
    * fact⋈fact join broadcasts, and this bucket-aligned SMJ is exactly
    * the plan that survives. The oracle reads the FLAT tables, so the
    * gate also proves the bucketed write+read round trip. */
  val qBucketedJoin: Q = Q("q_bucketed_join",
    """SELECT o_custkey,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |         AS total_cents,
      |       MIN(c_mktsegment) AS segment
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val (to, tc) = ensureBucketed(s, d)
    s.table(to).hint("merge")
      .join(s.table(tc).hint("merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), centsSum,
        min("c_mktsegment").as("segment"))
      .orderBy("o_custkey")
  }

  /** Reference Q1 (weekly units, reference sql/queries.sql:1-5) run the
    * way a migrated user runs it at 100 TB: against the ship-month-
    * partitioned fact with a half-year month predicate that prunes at
    * PLAN time — the scan lists 6 month directories and reads no other
    * byte (PlanShapeSpec asserts `PartitionFilters` carries the bounds).
    * Aggregation semantics are IDENTICAL to `q1_weekly_units`
    * (Monday-start week truncation, integer unit sums); the oracle
    * computes the same range from the FLAT lineitem, so the gate also
    * proves the partitioned write+read round trip loses and invents
    * nothing. Weeks straddling a month boundary surface with partial
    * sums on both engines — the predicate is on the month key, applied
    * identically before truncation. */
  val qWeeklyUnitsPruned: Q = Q("q1_weekly_units_pruned",
    """SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS semana,
      |       CAST(SUM(l_quantity) AS BIGINT) AS unidades
      |FROM lineitem
      |WHERE year(l_shipdate)*100 + month(l_shipdate)
      |      BETWEEN 199601 AND 199606
      |GROUP BY 1 ORDER BY semana""".stripMargin) { (s, d) =>
    partitionedLineitem(s, d)
      .filter(col("l_month").between(199601, 199606))
      .groupBy(to_date(date_trunc("week", col("l_shipdate")))
        .as("semana"))
      .agg(sum("l_quantity").cast("long").as("unidades"))
      .orderBy("semana")
  }

  val all: Seq[Q] =
    Seq(qPartitionPruned, qDppJoin, qBucketedJoin, qWeeklyUnitsPruned)
}
