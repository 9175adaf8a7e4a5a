package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.io.Tables

/** Warehouse-maintenance and sampling operators: MERGE-style upsert,
  * snapshot CDC diff, weighted priority sampling, and a Pareto-frontier
  * (skyline) scan.
  *
  * The reference maintains its warehouse by WHOLESALE rebuild (reference
  * src/job.py:296-299 re-runs the DDL and reloads every table); the first
  * two operators here are the incremental generalisation a 100 TB
  * deployment needs — apply a keyed delta (MERGE) and derive a keyed
  * change log (CDC diff) — each a single shuffle-on-key full-outer join,
  * never a table rewrite. Determinism discipline as everywhere in the
  * registry: integer cents, md5-derived hashing, single divisions,
  * totally ordered outputs.
  */
object CdcOps {

  private def cents = round(col("o_totalprice") * 100, 0).cast("long")

  /** Per-customer order state (n, cents, last_day) over a date slice. */
  private def custState(
      s: org.apache.spark.sql.SparkSession, d: String,
      lo: Option[String], hi: Option[String]) = {
    val day = to_date(col("o_orderdate"))
    val base = Tables.load(s, d, "orders")
    val sliced = (lo, hi) match {
      case (Some(a), Some(b)) =>
        base.filter(day >= lit(a).cast("date") && day < lit(b).cast("date"))
      case (Some(a), None) => base.filter(day >= lit(a).cast("date"))
      case (None, Some(b)) => base.filter(day < lit(b).cast("date"))
      case _ => base
    }
    sliced.groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(cents).cast("long").as("cents"),
        max(day).as("last_day"))
  }

  /** MERGE INTO semantics (upsert): a per-customer target state built
    * from the pre-2000 order snapshot, merged with the post-2000 delta —
    * matched keys update (counts add, last_day advances), source-only
    * keys insert, target-only keys survive untouched, and the action
    * taken is part of the output (the audit column a MERGE job emits).
    *
    * Shape: both sides pre-aggregate to one row per key (map-side
    * partial), then ONE full-outer shuffle join on the merge key. At
    * 100 TB this is the whole point versus the reference's rebuild: the
    * shuffle moves per-KEY state, not per-ROW history, and the delta
    * side is a day's increment, not seven years of facts. No window, no
    * global sort except the reporting orderBy. */
  val qMergeUpsert: Q = Q("q_merge_upsert",
    """WITH t AS (SELECT o_custkey AS custkey, COUNT(*)::BIGINT AS n,
      |             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
      |                  AS BIGINT) AS cents,
      |             MAX(CAST(o_orderdate AS DATE)) AS last_day
      |           FROM orders
      |           WHERE CAST(o_orderdate AS DATE) < DATE '2000-01-01'
      |           GROUP BY 1),
      |s AS (SELECT o_custkey AS custkey, COUNT(*)::BIGINT AS n,
      |        CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |          AS cents,
      |        MAX(CAST(o_orderdate AS DATE)) AS last_day
      |      FROM orders
      |      WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01'
      |      GROUP BY 1)
      |SELECT COALESCE(t.custkey, s.custkey) AS custkey,
      |       CASE WHEN t.custkey IS NULL THEN 'insert'
      |            WHEN s.custkey IS NULL THEN 'keep'
      |            ELSE 'update' END AS action,
      |       CAST(COALESCE(t.n, 0) + COALESCE(s.n, 0) AS BIGINT) AS n_orders,
      |       CAST(COALESCE(t.cents, 0) + COALESCE(s.cents, 0) AS BIGINT)
      |         AS cents,
      |       CASE WHEN s.last_day IS NULL THEN t.last_day
      |            WHEN t.last_day IS NULL THEN s.last_day
      |            WHEN s.last_day >= t.last_day THEN s.last_day
      |            ELSE t.last_day END AS last_day
      |FROM t FULL JOIN s ON t.custkey = s.custkey
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val t = custState(s, d, None, Some("2000-01-01"))
      .select(col("custkey").as("tk"), col("n").as("tn"),
        col("cents").as("tc"), col("last_day").as("tl"))
    val src = custState(s, d, Some("2000-01-01"), None)
      .select(col("custkey").as("sk"), col("n").as("sn"),
        col("cents").as("sc"), col("last_day").as("sl"))
    t.join(src, col("tk") === col("sk"), "full_outer")
      .select(
        coalesce(col("tk"), col("sk")).as("custkey"),
        when(col("tk").isNull, "insert")
          .when(col("sk").isNull, "keep")
          .otherwise("update").as("action"),
        (coalesce(col("tn"), lit(0L)) + coalesce(col("sn"), lit(0L)))
          .cast("long").as("n_orders"),
        (coalesce(col("tc"), lit(0L)) + coalesce(col("sc"), lit(0L)))
          .cast("long").as("cents"),
        when(col("sl").isNull, col("tl"))
          .when(col("tl").isNull, col("sl"))
          .when(col("sl") >= col("tl"), col("sl"))
          .otherwise(col("tl")).as("last_day"))
      .orderBy("custkey")
  }

  /** CDC change log between two keyed snapshots: per-customer activity
    * state in 1996 vs 1997 (windows where keys genuinely appear AND
    * disappear, so all three ops occur), emitted as (op, old, new) change
    * rows — insert / delete / update, unchanged keys suppressed. This is
    * the derive-the-delta inverse of [[qMergeUpsert]] (apply-the-delta):
    * together they are the incremental pipeline the reference's wholesale
    * rebuild (reference src/job.py:296-299) would grow into at scale.
    *
    * Same 100 TB shape as the merge: two keyed pre-aggregates, one
    * full-outer shuffle join, change detection is a per-row predicate. */
  val qCdcLog: Q = Q("q_cdc_log",
    """WITH a AS (SELECT o_custkey AS custkey, COUNT(*)::BIGINT AS n,
      |             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
      |                  AS BIGINT) AS cents
      |           FROM orders
      |           WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |             AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
      |           GROUP BY 1),
      |b AS (SELECT o_custkey AS custkey, COUNT(*)::BIGINT AS n,
      |        CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |          AS cents
      |      FROM orders
      |      WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |        AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      |      GROUP BY 1)
      |SELECT COALESCE(a.custkey, b.custkey) AS custkey,
      |       CASE WHEN a.custkey IS NULL THEN 'insert'
      |            WHEN b.custkey IS NULL THEN 'delete'
      |            ELSE 'update' END AS op,
      |       a.n AS old_n, a.cents AS old_cents,
      |       b.n AS new_n, b.cents AS new_cents
      |FROM a FULL JOIN b ON a.custkey = b.custkey
      |WHERE a.custkey IS NULL OR b.custkey IS NULL
      |   OR a.n <> b.n OR a.cents <> b.cents
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val a = custState(s, d, Some("1996-01-01"), Some("1997-01-01"))
      .select(col("custkey").as("ak"), col("n").as("old_n"),
        col("cents").as("old_cents"))
    val b = custState(s, d, Some("1997-01-01"), Some("1998-01-01"))
      .select(col("custkey").as("bk"), col("n").as("new_n"),
        col("cents").as("new_cents"))
    a.join(b, col("ak") === col("bk"), "full_outer")
      .filter(col("ak").isNull || col("bk").isNull ||
        col("old_n") =!= col("new_n") || col("old_cents") =!= col("new_cents"))
      .select(coalesce(col("ak"), col("bk")).as("custkey"),
        when(col("ak").isNull, "insert")
          .when(col("bk").isNull, "delete")
          .otherwise("update").as("op"),
        col("old_n"), col("old_cents"), col("new_n"), col("new_cents"))
      .orderBy("custkey")
  }

  /** INCREMENTAL VIEW MAINTENANCE, proven against full recompute: a
    * bucketed aggregate view (customers, orders, cents per custkey-mod-10
    * bucket) over the keyed customer state is maintained from the OLD
    * snapshot's view plus the [[qCdcLog]] change rows — never touching
    * the new snapshot wholesale — and the oracle computes the NEW
    * snapshot's view directly. The hash gate is therefore the
    * self-maintainability theorem for count/sum aggregates (Gupta &
    * Mumick's materialized-view maintenance): view(old) ⊎ δ(changes) ≡
    * view(new), bit for bit.
    *
    * At 100 TB this is the difference between reading yesterday's 100 TB
    * again and reading a day's delta: the maintenance side touches only
    * the view (bucket-sized) and the change rows (activity-sized). Per
    * change row the adjustment is +new−old (update), +new (insert),
    * −old (delete) — pure integer sums with map-side combine; the merge
    * is a full-outer join on the bounded bucket key. */
  val qMvMaintain: Q = Q("q_mv_maintain",
    """WITH b AS (SELECT o_custkey AS custkey, COUNT(*)::BIGINT AS n,
      |        CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |          AS cents
      |      FROM orders
      |      WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |        AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      |      GROUP BY 1)
      |SELECT custkey % 10 AS bucket, COUNT(*)::BIGINT AS n_customers,
      |       CAST(SUM(n) AS BIGINT) AS total_n,
      |       CAST(SUM(cents) AS BIGINT) AS total_cents
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    def view(state: org.apache.spark.sql.DataFrame) =
      state.groupBy((col("custkey") % 10).as("bucket"))
        .agg(count(lit(1)).cast("long").as("n_customers"),
          sum("n").cast("long").as("total_n"),
          sum("cents").cast("long").as("total_cents"))
    val oldView = view(custState(s, d,
      Some("1996-01-01"), Some("1997-01-01")))
    // the qCdcLog change rows (derived delta), re-aggregated per bucket
    val delta = qCdcLog.fn(s, d)
      .groupBy((col("custkey") % 10).as("bucket"))
      .agg(
        sum(when(col("op") === "insert", 1L)
          .when(col("op") === "delete", -1L).otherwise(0L))
          .as("d_customers"),
        sum(coalesce(col("new_n"), lit(0L))
          - coalesce(col("old_n"), lit(0L))).as("d_n"),
        sum(coalesce(col("new_cents"), lit(0L))
          - coalesce(col("old_cents"), lit(0L))).as("d_cents"))
    oldView.join(delta, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        (coalesce(col("n_customers"), lit(0L))
          + coalesce(col("d_customers"), lit(0L))).as("n_customers"),
        (coalesce(col("total_n"), lit(0L))
          + coalesce(col("d_n"), lit(0L))).cast("long").as("total_n"),
        (coalesce(col("total_cents"), lit(0L))
          + coalesce(col("d_cents"), lit(0L))).cast("long")
          .as("total_cents"))
      .filter(col("n_customers") > 0)
      .orderBy("bucket")
  }

  /** SYSTEMATIC sampling (fixed-interval, the fourth sampling design
    * next to mixture/stratified/πps): order the frame by a content hash
    * (so the interval walk is decorrelated from any natural ordering),
    * then keep every ⌊N/100⌋-th rank — the classic survey design with
    * exactly-known inclusion pattern and ~100 output rows at any N.
    * Ranks come from [[graft.text.TextOps.globalRankByRange]] (range
    * slices + broadcast offsets, no global sort); the step is one
    * integer division of the broadcast count. Hash ordering is the
    * engine's md5-mod-P with the orderkey tiebreak — both engines
    * reproduce the identical walk. */
  val qSystematicSample: Q = Q("q_systematic_sample",
    """WITH v AS (SELECT o_orderkey,
      |        ('0x'||substring(md5(CAST(o_orderkey AS VARCHAR)),1,8))::BIGINT
      |          % 2147483647 AS hv,
      |        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      |      FROM orders),
      |r AS (SELECT o_orderkey, hv, cents,
      |        CAST(ROW_NUMBER() OVER (ORDER BY hv, o_orderkey) AS BIGINT)
      |          AS rnk,
      |        CAST(COUNT(*) OVER () AS BIGINT) AS n
      |      FROM v)
      |SELECT rnk, o_orderkey, cents
      |FROM r WHERE (rnk - 1) % GREATEST(n // 100, 1) = 0
      |ORDER BY rnk""".stripMargin) { (s, d) =>
    val v = Tables.load(s, d, "orders")
      .select(col("o_orderkey"),
        graft.functions.TextHash.hash32(col("o_orderkey").cast("string"))
          .as("hv"),
        cents.as("cents"))
    graft.text.TextOps.globalRankByRange(v,
        Seq(col("hv").asc, col("o_orderkey").asc))
      .filter((col("rnk") - 1) %
        greatest(expr("n_total div 100"), lit(1L)) === 0)
      .select(col("rnk"), col("o_orderkey"), col("cents"))
      .orderBy("rnk")
  }

  /** Weighted sampling without replacement — sequential Poisson sampling
    * (Ohlsson 1998): each part draws a deterministic uniform u from the
    * engine hash, its priority is ξ = u / w (weight = retail price in
    * cents), and the sample is the k smallest ξ. Heavier items get
    * smaller ξ, so inclusion probability is approximately proportional
    * to weight — the standard one-pass πps design.
    *
    * Everything is integer: ξ is scaled to ⌊hv·10⁶ / w⌋ (hv < 2³¹ keeps
    * the product < 2⁵¹), so both engines order identically — no log(), no
    * RNG state. The k-smallest is `orderBy(ξ).limit(k)`:
    * TakeOrderedAndProject, a per-partition bounded heap merged at the
    * driver — mergeable and one-pass, which is what makes this THE
    * weighted-sample shape for 100 TB (a global sort would shuffle the
    * world to keep 50 rows). */
  val qWeightedSample: Q = Q("q_weighted_sample",
    s"""WITH p0 AS (SELECT p_partkey, CAST(p_partkey AS VARCHAR) AS pk,
       |              CAST(ROUND(p_retailprice*100) AS BIGINT) AS w_cents
       |            FROM part),
       |pri AS (SELECT p_partkey, w_cents,
       |          (${TextHash.hash32Sql("pk")}) * 1000000 // w_cents AS xi
       |        FROM p0)
       |SELECT p_partkey, w_cents, CAST(xi AS BIGINT) AS xi
       |FROM pri ORDER BY xi, p_partkey LIMIT 50""".stripMargin) { (s, d) =>
    Tables.load(s, d, "part")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100, 0).cast("long").as("w_cents"),
        TextHash.hash32(col("p_partkey").cast("string")).as("hv"))
      .select(col("p_partkey"), col("w_cents"),
        expr("CAST(hv * 1000000 div w_cents AS BIGINT)").as("xi"))
      .orderBy("xi", "p_partkey")
      .limit(50)
  }

  /** Pareto frontier (skyline) on (price, size): parts for which no other
    * part is at-most-equal on both dimensions and strictly better on one.
    *
    * The scalable spelling is a distributed strict-prefix MIN, not the
    * O(n²) NOT-EXISTS the oracle uses at sf0.01:
    *   1. aggregate min(size) per distinct price — shuffle on price, a
    *      data-scaled key;
    *   2. strict-prefix min over price order by the engine's two-level
    *      scan (range partitions → local window per pid → per-pid minima,
    *      a #partitions-row aggregate whose running min broadcasts back)
    *      — the same machinery as [[graft.text.TextOps.qPackChunks]]'s
    *      prefix sum, so parallelism is bounded by cluster width, never
    *      by the price domain;
    *   3. a price group survives iff its min size beats every cheaper
    *      group's; within a surviving group exactly the min-size rows are
    *      on the frontier (ties all survive — dominance is strict).
    * The final join back to part rows keys on price: broadcastable when
    * the frontier is small, hash-shuffled otherwise — AQE's call. */
  val qSkyline: Q = Q("q_skyline",
    """SELECT p.p_partkey, p.p_retailprice AS price,
      |       CAST(p.p_size AS BIGINT) AS psize
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE (q.p_retailprice < p.p_retailprice AND q.p_size <= p.p_size)
      |     OR (q.p_retailprice <= p.p_retailprice AND q.p_size < p.p_size))
      |ORDER BY price, p_partkey""".stripMargin) { (s, d) =>
    skylineOf(Tables.load(s, d, "part")
      .select(col("p_partkey"), col("p_retailprice").as("price"),
        col("p_size").cast("long").as("psize")))
      .orderBy("price", "p_partkey")
  }

  /** The distributed skyline core behind [[qSkyline]], on any
    * (p_partkey, price, psize) frame. Factored out so CdcOpsSpec can
    * drive it with synthetic frames against the quadratic dominance
    * definition. `slices` pins the range fan-out for tiny spec inputs
    * (production leaves it to AQE, as in
    * [[graft.text.TextOps.priorByPrefixSum]]). */
  private[graft] def skylineOf(
      parts: org.apache.spark.sql.DataFrame,
      slices: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    val perPrice = parts.groupBy("price").agg(min("psize").as("msize"))
    // two-level strict-prefix min over ascending price
    val parted = slices.fold(perPrice.repartitionByRange(col("price")))(n =>
        perPrice.repartitionByRange(n, col("price")))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy("pid").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("local_min", min("msize").over(wLocal))
    // running min over the BOUNDED per-pid aggregate (#partitions rows —
    // scales with cluster width, not data; same posture as the pack/rank
    // prefix scans)
    val wOff = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy("pid").agg(min("msize").as("slice_min"))
      .withColumn("off_min", min("slice_min").over(wOff))
      .select("pid", "off_min")
    val surviving = local.join(broadcast(offsets), Seq("pid"))
      .withColumn("cheaper_min", least(col("local_min"), col("off_min")))
      .filter(col("cheaper_min").isNull || col("msize") < col("cheaper_min"))
      .select(col("price").as("fprice"), col("msize"))
    parts.join(surviving,
        col("price") === col("fprice") && col("psize") === col("msize"))
      .select("p_partkey", "price", "psize")
  }

  val all: Seq[Q] =
    Seq(qMergeUpsert, qCdcLog, qMvMaintain, qWeightedSample,
      qSystematicSample, qSkyline)
}
