package graft

import org.apache.spark.sql.functions._

import graft.curate.Curation
import graft.io.Tables
import graft.queries.{RefQueries, RelOps}

/** Property-style invariants (SURVEY.md §5): results must not depend on
  * physical layout, and curation must be a projection-stable fixpoint. */
class PropertySpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|"))

  test("aggregates are partition-count invariant") {
    val li = Tables.load(spark, sf001, "lineitem")
    val base = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").cast("long").as("u"))
    Seq(1, 7, 64).foreach { n =>
      val re = li.repartition(n).groupBy("l_returnflag")
        .agg(sum("l_quantity").cast("long").as("u"))
      assert(canon(re).sameElements(canon(base)), s"partitions=$n")
    }
  }

  test("top-k is a prefix of the full sort under the tiebreak") {
    val full = RelOps.qTopkOrders.fn(spark, sf001) // limit 10
    val sorted = Tables.load(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_cents"))
      .orderBy(desc("price_cents"), asc("o_orderkey"))
      .limit(30).collect().take(10)
    assert(full.collect().map(_.toSeq).toSeq ==
      sorted.map(_.toSeq).toSeq)
  }

  test("as-of composition equals brute-force argmax on random streams") {
    import spark.implicits._
    // deterministic pseudo-random event stream: per user, interleaved
    // left (purchases) and right (clicks) instants with collisions —
    // including left.t == right.t (inclusive semantics) and duplicate
    // right instants (pre-aggregation tiebreak)
    val rnd = new scala.util.Random(11)
    val users = 0L until 7L
    val rights = users.flatMap(u => (0 until 30).map(i =>
      (u, rnd.between(0L, 50L), 1000L + u * 100 + i)))
    val lefts = users.flatMap(u => (0 until 20).map(i =>
      (u, rnd.between(0L, 55L), 2000L + u * 100 + i)))
    val rightsDf = rights.toDF("user_id", "t", "event_id")
      .groupBy("user_id", "t").agg(max("event_id").as("click_id"))
    val leftsDf = lefts.toDF("user_id", "t", "event_id")
    // the operator's union + window composition
    val tagged = rightsDf
      .select(col("user_id"), col("t"), lit(0).as("side"),
        col("click_id"), lit(null).cast("long").as("event_id"))
      .unionByName(leftsDf.select(col("user_id"), col("t"),
        lit(1).as("side"), lit(null).cast("long").as("click_id"),
        col("event_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t", "side", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val got = tagged
      .withColumn("cf", last(when(col("side") === 0,
        struct(col("t").as("ct"), col("click_id"))), ignoreNulls = true)
        .over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("cf.click_id").as("click_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // brute force: for each left row, the right row with max t <= left.t
    // (inclusive), tie-broken by the pre-aggregated max event_id
    val rightAgg = rights.groupBy(r => (r._1, r._2))
      .map { case ((u, t), rs) => (u, t, rs.map(_._3).max) }.toSeq
    val naive = lefts.map { case (u, lt, id) =>
      val cands = rightAgg.filter(r => r._1 == u && r._2 <= lt)
      id -> (if (cands.isEmpty) -1L
             else cands.maxBy(r => (r._2, r._3))._3)
    }.toMap
    assert(got == naive)
  }

  test("grid-bucketed interval join equals the quadratic overlap join") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // random intervals spanning 0..400 days with lengths 0..40 — many
    // cross multiple 16-day cells, exercising the owner-cell dedup
    val as = (0 until 120).map(i =>
      (i.toLong, rnd.between(0L, 400L))).map { case (k, s0) =>
      (k, s0, s0 + rnd.between(0L, 40L)) }
    val bs = (0 until 120).map(i =>
      (1000L + i, rnd.between(0L, 400L))).map { case (k, s0) =>
      (k, s0, s0 + rnd.between(0L, 40L)) }
    val g = 16L
    def cells(df: org.apache.spark.sql.DataFrame, p: String) =
      df.toDF(s"${p}_key", s"${p}_s", s"${p}_e")
        .select(col(s"${p}_key"), col(s"${p}_s"), col(s"${p}_e"),
          explode(sequence(expr(s"${p}_s div $g"),
            expr(s"${p}_e div $g"))).as("cell"))
    val joined = cells(as.toDF(), "a").join(cells(bs.toDF(), "b"),
        Seq("cell"))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        col("cell") === expr(s"greatest(a_s, b_s) div $g"))
      .select("a_key", "b_key")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // owner-cell rule must dedup exactly: no pair twice, no pair missing
    assert(joined.length == joined.distinct.length, "duplicate pairs")
    val naive = for {
      (ak, s1, e1) <- as; (bk, s2, e2) <- bs
      if s1 <= e2 && s2 <= e1
    } yield (ak, bk)
    assert(joined.toSet == naive.toSet)
    assert(joined.nonEmpty)
  }

  test("to_date('yyyy/MM/dd') round-trips generated dates") {
    val rnd = new scala.util.Random(7)
    val dates = (1 to 200).map { _ =>
      java.time.LocalDate.ofEpochDay(rnd.between(0L, 25000L))
    }
    import spark.implicits._
    val df = dates.map(_.toString).toDF("iso")
      .withColumn("d0", to_date(col("iso")))
      .withColumn("raw", date_format(col("d0"), "yyyy/MM/dd"))
      .withColumn("d1", Curation.parseSlashedDate(col("raw")))
    assert(df.filter(col("d0") =!= col("d1")).count() == 0)
  }

  test("mixture allocation: sum == budget and quota property on random inputs") {
    import spark.implicits._
    // largest-remainder invariants: exact budget, and every source within
    // one token of its real-valued quota B*w/Sw (Hamilton's method)
    val rng = new scala.util.Random(8)
    for (trial <- 1 to 5) {
      val n = 1 + rng.nextInt(40)
      val budget = 1L + rng.nextInt(1000000)
      val tc = (0 until n)
        .map(i => (f"s$i%03d", 1L + rng.nextInt(1 << 20)))
        .toDF("source", "tokens")
      val rows = graft.text.TextOps.mixtureAlloc(tc, budget).collect()
      assert(rows.map(_.getLong(3)).sum == budget, s"trial $trial")
      val sw = rows.map(_.getLong(2)).sum.toDouble
      rows.foreach { r =>
        val quota = budget * r.getLong(2) / sw
        assert(math.abs(r.getLong(3) - quota) < 1.0,
          s"trial $trial source ${r.getString(0)}: " +
            s"alloc ${r.getLong(3)} vs quota $quota")
      }
    }
  }

  test("query results are deterministic across runs") {
    val a = RefQueries.q4WeekdaySeasonality.fn(spark, sf001).collect()
    val b = RefQueries.q4WeekdaySeasonality.fn(spark, sf001).collect()
    assert(a.sameElements(b))
  }

  test("winnowing: brute-force parity and the shared-run guarantee") {
    import spark.implicits._
    import graft.dedup.Dedup
    val P = 2147483647L
    val B = 131L
    val k = Dedup.WinnowK
    val w = Dedup.WinnowW
    val shift = Dedup.WinnowShift
    // deterministic token streams; doc pairs (2g, 2g+1) share a planted
    // run of exactly w + k − 1 tokens (the guarantee threshold) at
    // DIFFERENT offsets, surrounded by unrelated noise
    def tok(seed: Long, j: Int): String = s"t${(seed * 31 + j * 17) % 23}"
    val docsSeq = (0L until 20L).map { i =>
      val base = (0 until 30).map(j => tok(i, j))
      val planted = (0 until (w + k - 1)).map(j => s"s${i / 2}x$j")
      val at = (i % 5).toInt + 3
      (i, (base.take(at) ++ planted ++ base.drop(at)).mkString(" "))
    }
    val got = Dedup.winnowSelect(docsSeq.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (id, v) => id -> v.map(_._2).toSet }
    // plain-Scala reimplementation of the whole chain
    def hash32(s: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
      val hex = md5.digest(s.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % P
    }
    val brute = docsSeq.map { case (id, text) =>
      val th = text.split(" ").map(hash32)
      val wh =
        if (th.length < k) Array.empty[Long]
        else th.sliding(k).map(_.reduceLeft((a, b) => (a * B + b) % P))
          .toArray
      val cks = wh.zipWithIndex.map { case (h, p) => h * shift + p }
      val starts =
        if (wh.length >= w) 0 to wh.length - w
        else if (wh.nonEmpty) 0 to 0
        else 1 to 0
      id -> starts
        .map(i => cks.slice(i, math.min(i + w, cks.length)).min).toSet
    }.toMap
    assert(got == brute)
    // SIGMOD'03 guarantee: a shared token run of length ≥ w + k − 1 ⇒ a
    // shared fingerprint HASH (positions differ across the pair; the
    // hash part must intersect)
    val hashes = brute.map { case (id, v) => id -> v.map(_ / shift) }
    (0L until 10L).foreach { g =>
      assert((hashes(2 * g) intersect hashes(2 * g + 1)).nonEmpty,
        s"planted pair $g shares no fingerprint")
    }
  }
}
