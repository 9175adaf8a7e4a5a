package graft

import graft.queries.SqlTwins

/** Every registered operator must be reachable through the SQL-string
  * surface: a Spark-SQL twin producing row-for-row the same result as the
  * DataFrame program (or a documented skip). */
class SqlTwinsSpec extends SparkSpec {

  test("registry integrity: unique names, oracle keys, driver maps") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      names.diff(names.distinct).mkString(","))
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
    // a duplicate name would silently shadow a query in the driver's map
    assert(SparkEntry.queries.size == names.size)
    // the documented ledger (NOTES.md/COVERAGE.md) must stay exact: r2
    // verdict #4 caught a drift. Bump this alongside the docs per query.
    assert(names.size == 224,
      s"registry has ${names.size} queries; update NOTES.md and this pin")
    assert(SparkEntry.oracleSql.size == 224,
      s"${SparkEntry.oracleSql.size} oracle-gated; update NOTES.md + pin")
  }

  test("every registered query has a SQL twin or a documented skip") {
    SparkEntry.registry.foreach { q =>
      assert(SqlTwins.twin(q.name).isDefined || SqlTwins.skips.contains(q.name),
        s"${q.name} has neither a twin nor a skip reason")
    }
    // skips must reference real queries, with a non-empty reason
    val names = SparkEntry.registry.map(_.name).toSet
    SqlTwins.skips.foreach { case (n, reason) =>
      assert(names.contains(n) && reason.nonEmpty, n)
    }
  }

  test("SQL twins match the DataFrame programs row-for-row") {
    SqlTwins.registerViews(spark, sf001)
    val failures = SparkEntry.registry.flatMap { q =>
      SqlTwins.twin(q.name).flatMap { sql =>
        try {
          val df = q.fn(spark, sf001)
          val tw = spark.sql(sql)
          val sameCols = df.columns.toSeq == tw.columns.toSeq
          val a = df.collect().map(_.toString).sorted.toSeq
          val b = tw.collect().map(_.toString).sorted.toSeq
          if (sameCols && a == b) None
          else Some(q.name -> (s"cols $sameCols rows ${a.size}/${b.size} " +
            s"firstDiff=${a.zip(b).find(p => p._1 != p._2)}"))
        } catch {
          case e: Exception =>
            Some(q.name -> e.toString.linesIterator.take(3).mkString(" "))
        }
      }
    }
    assert(failures.isEmpty,
      failures.map { case (n, m) => s"$n: $m" }.mkString("\n"))
  }
}
