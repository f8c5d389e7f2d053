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

  test("catalog surface: views are listed and describable") {
    registerViews()
    val tables = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Tables.names.toSet.subsetOf(tables))
    assert(spark.sql("DESCRIBE lineitem").count() > 0)
    assert(spark.sql("EXPLAIN SELECT count(*) FROM events").count() > 0)
  }
}
