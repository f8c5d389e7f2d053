package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + structural checks for every declared query at sf0.001. Value
  * correctness is owned by the DuckDB oracle gate (tools/check_oracle.py /
  * the driver's t2); these tests lock that every query builds, runs, returns
  * rows, and has stable column names (the oracle compare is name-keyed).
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("driver contract: names are unique, oracles subset of queries") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size, s"duplicate query names in $names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.allDefs) {
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = q.build(spark, TestSpark.Sf0001)
      val n = df.count()
      assert(n > 0, s"${q.name} returned no rows")
      // column names must be stable and lowercase_snake (oracle is name-keyed)
      df.columns.foreach { c =>
        assert(c.matches("[a-z][a-z0-9_]*"), s"${q.name}: bad column name '$c'")
      }
    }
  }
}
