package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL API surface: fixture tables registered as temp views and queried
  * through spark.sql must agree with the DataFrame builders — users of the
  * engine get both entry points (SURVEY.md §7.1 queries/Declared note).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def registerViews(): Unit =
    Tables.names.foreach { t =>
      Tables.table(spark, TestSpark.Sf0001, t).createOrReplaceTempView(t)
    }

  test("spark.sql over registered views matches the DataFrame builders") {
    registerViews()
    val cases = Seq(
      "q01_filter_project" ->
        """SELECT c_custkey, c_name FROM customer
          |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,
      "q02_distinct" ->
        """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "q09_topk" ->
        """SELECT c_custkey, c_name,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |GROUP BY c_custkey, c_name
          |ORDER BY total_spent DESC, c_custkey LIMIT 10""".stripMargin,
      "q11_rollup" ->
        """SELECT n_regionkey, n_nationkey, count(*) AS n FROM nation
          |GROUP BY ROLLUP(n_regionkey, n_nationkey)
          |ORDER BY n_regionkey ASC NULLS FIRST, n_nationkey ASC NULLS FIRST"""
          .stripMargin)
    cases.foreach { case (name, sql) =>
      val viaSql = spark.sql(sql)
      val viaDf = SparkEntry.queries(name)(spark, TestSpark.Sf0001)
      assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty,
        s"$name: SQL surface diverges from the DataFrame builder")
    }
  }

  test("custom expressions are callable from SQL") {
    graft.functions.VectorFunctions.register(spark)
    graft.functions.SketchFunctions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0) == 11.0)
    assert(spark.sql("SELECT graft_minhash(array('a b c', 'b c d'), 8) AS mh")
      .head().getSeq[Long](0).length == 8)
    assert(spark.sql("SELECT graft_simhash(array('a b c')) AS s").count() == 1)
    assert(spark.sql(
      "SELECT graft_band_codes(array(1.0D, 0.0D), array(array(1.0D, 0.0D)), 1) AS c")
      .head().getSeq[Long](0) == Seq(1L))
  }

  test("wrong-arity SQL calls fail with the signature, not an index error") {
    graft.functions.VectorFunctions.register(spark)
    graft.functions.SketchFunctions.register(spark)
    def messageOf(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    val m = messageOf("SELECT graft_dot(array(1.0D))")
    assert(m.contains("graft_dot(a, b)"),
      s"expected the signature in the error, got: $m")
    assert(messageOf("SELECT graft_minhash(array('a'))")
      .contains("graft_minhash(sh, n)"))
    assert(messageOf("SELECT graft_simhash()")
      .contains("graft_simhash(sh)"))
    assert(messageOf("SELECT graft_band_codes(array(1.0D))")
      .contains("graft_band_codes(vec, planes, bits)"))
  }

  test("polygon source is reachable from pure SQL via CREATE TEMPORARY VIEW") {
    val root = java.nio.file.Files.createTempDirectory("polygon-sql")
    val dir = root.resolve("SQLT/minute--1--adjusted")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("page-0000.json"),
      """{"status":"OK","results":[
        |{"t":1000,"o":1.0,"h":2.0,"l":0.5,"c":1.5,"v":10.0,"vw":1.2,"n":2},
        |{"t":2000,"o":2.0,"h":3.0,"l":1.5,"c":2.5,"v":20.0,"vw":2.2,"n":3}],
        |"next_url":null}""".stripMargin)
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW sql_bars
         |USING polygon OPTIONS (path '${root.toString}')""".stripMargin)
    val rows = spark.sql(
      """SELECT ticker, timespan, multiplier, t, c FROM sql_bars
        |WHERE adjusted ORDER BY t""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSeq == Seq(("SQLT", "minute", 1, 1000L), ("SQLT", "minute", 1, 2000L)))
  }

  test("catalog surface: views are listed and describable") {
    registerViews()
    val tables = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Tables.names.toSet.subsetOf(tables))
    assert(spark.sql("DESCRIBE lineitem").count() > 0)
    assert(spark.sql("EXPLAIN SELECT count(*) FROM events").count() > 0)
  }
}
