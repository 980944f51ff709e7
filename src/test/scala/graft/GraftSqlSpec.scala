package graft

class GraftSqlSpec extends SparkSpec {

  test("q12b: HLL estimates land within 5% of q12's exact counts at sf0.01 and sf0.1") {
    // the accuracy contract, now driver-oracled too: the query itself
    // emits the ≤5% verdict booleans the DuckDB oracle pins to TRUE —
    // this spec checks them at BOTH gate SFs plus exact-count agreement
    // with q12 (same column wiring)
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val exact = operators.RelationalOps.distinctCount(spark, dir).collect()(0)
      val r = operators.RelationalOps.approxDistinct(spark, dir).collect()(0)
      assert(r.getAs[Long]("exact_parts") === exact.getLong(0), dir)
      assert(r.getAs[Long]("exact_orders") === exact.getLong(2), dir)
      assert(r.getAs[Boolean]("parts_within_5pct"), s"$dir parts HLL drifted past 5%")
      assert(r.getAs[Boolean]("orders_within_5pct"), s"$dir orders HLL drifted past 5%")
    }
  }

  test("q14b: the percentile sketch honors its rank-error contract at sf0.01 and sf0.1") {
    // same device as q12b: the query emits verdict booleans the oracle
    // pins TRUE; here they assert the GK sketch landed inside its
    // contracted ±1/accuracy rank window around each exact percentile
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val exact = operators.RelationalOps.percentiles(spark, dir).collect()
        .map(r => r.getAs[String]("l_returnflag") ->
          (r.getAs[Double]("median_qty"), r.getAs[Double]("p90_qty"))).toMap
      val rows = operators.RelationalOps.approxPercentiles(spark, dir).collect()
      assert(rows.length === exact.size, dir)
      rows.foreach { r =>
        val flag = r.getAs[String]("l_returnflag")
        // exact columns agree with q14 (same percentile kernel)
        assert(r.getAs[Double]("median_qty") === exact(flag)._1, s"$dir $flag")
        assert(r.getAs[Double]("p90_qty") === exact(flag)._2, s"$dir $flag")
        assert(r.getAs[Boolean]("median_within"), s"$dir $flag: sketch median out of window")
        assert(r.getAs[Boolean]("p90_within"), s"$dir $flag: sketch p90 out of window")
      }
    }
  }

  test("SQL surface: joins + native functions through spark.sql") {
    GraftSql.registerAll(spark, sf)
    val top = spark.sql(
      """SELECT n_name, COUNT(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3""".stripMargin).collect()
    assert(top.length === 3 && top(0).getLong(1) > 0)

    // native expressions resolve by name in SQL
    val cos = spark.sql(
      """SELECT a.vec_id, graft_dot(
        |  transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |  transform(a.embedding, x -> CAST(x AS DOUBLE))) AS selfdot
        |FROM embeddings a LIMIT 1""".stripMargin).collect()(0)
    assert(cos.getDouble(1) > 0.0)

    val h = spark.sql("SELECT graft_charhash(text) AS h FROM documents LIMIT 1").collect()(0)
    assert(h.getLong(0) >= 0)
  }

  test("operator catalog composable from SQL via registerQueries") {
    GraftSql.registerAll(spark, sf)
    GraftSql.registerQueries(spark, sf)
    // an operator view joined back to a lake table, all in SQL
    val joined = spark.sql(
      """SELECT d.lang, COUNT(*) AS n
        |FROM q40_dedup_exact q JOIN documents d ON q.doc_id = d.doc_id
        |GROUP BY d.lang""".stripMargin).collect()
    assert(joined.nonEmpty && joined.map(_.getLong(1)).sum > 0)
    // every LAZY operator is visible; eager ones (whose construction runs
    // jobs) are deferred by default so registration itself is free
    val views = spark.catalog.listTables().collect().map(_.name).toSet
    assert((SparkEntry.queries.keySet -- GraftSql.eagerQueries).subsetOf(views))
    GraftSql.eagerQueries.foreach(q => assert(!views.contains(q),
      s"eager operator $q must not register (and execute) by default"))
    // opting in registers the full catalog
    GraftSql.registerQueries(spark, sf, includeEager = true)
    val all = spark.catalog.listTables().collect().map(_.name).toSet
    assert(SparkEntry.queries.keySet.subsetOf(all))
  }

  test("operator views compose with each other: curation signals joined in SQL") {
    GraftSql.registerAll(spark, sf)
    GraftSql.registerQueries(spark, sf)
    // three operator views + the custom aggregate, one ad-hoc SQL query —
    // the "switch your dashboards over" scenario: language ID x quality
    // score x dup-ngram rate per doc, then the worst documents per lang
    val out = spark.sql(
      """SELECT l.lang_pred AS lang,
        |  graft_topk(d.dup_rate, l.doc_id, q.n_tokens, 2) AS top
        |FROM q47_langid l
        |JOIN q48_quality_score q ON l.doc_id = q.doc_id
        |JOIN q57_dup_ngram_rate d ON l.doc_id = d.doc_id
        |GROUP BY l.lang_pred
        |ORDER BY lang""".stripMargin)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val top = r.getSeq[org.apache.spark.sql.Row](1)
      assert(top.nonEmpty && top.size <= 2)
      // scores are rates in [0,1] and sorted best(=highest) first
      val scores = top.map(_.getDouble(0))
      assert(scores.forall(s => s >= 0.0 && s <= 1.0) && scores == scores.sorted.reverse)
    }
  }
}
