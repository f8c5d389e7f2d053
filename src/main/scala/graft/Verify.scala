package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also emits verify_meta.json so the correctness artifact is
  * self-describing: the scale factor it ran at, which queries are declared
  * no-oracle BY DESIGN (engine-specific results) as opposed to broken, and a
  * machine-checked engine-side bound for each of those — e.g. the HLL
  * estimate must sit within its error bound of the exact distinct computed
  * in the same result.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [queryName...] — names filter the dump for local
    // iteration; the driver passes exactly two args (all queries).
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    val dumpErrors = scala.collection.mutable.Map.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        dumpErrors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally graft.core.GraftCaches.releaseAll(spark) // graft-owned persists
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // engine-side checks for the declared-no-oracle queries (only those
    // selected and successfully dumped)
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    val engineChecks = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def checkable(name: String): Boolean =
      selected.contains(name) && !dumpErrors.contains(name)
    if (checkable("q19_approx_distinct")) {
      // KMV bound: the k=256 k-minimum-values estimator's stderr is
      // ~1/sqrt(k-2) ≈ 6.3%; ~2.5 sigma is the declared hard bound.
      // exact_parts rides in the same result row. (The query is ALSO
      // oracle-backed — this check guards the estimator's ACCURACY, which
      // a hash-exact replay alone cannot.)
      val bound = 0.15
      val maxRel = spark.read.parquet(s"$outDir/q19_approx_distinct")
        .select(max(abs(col("approx_parts") - col("exact_parts"))
          .cast("double") / col("exact_parts")).as("m"))
        .head().getDouble(0)
      engineChecks("q19_approx_distinct") =
        s"""{"check": "kmv_within_bound", "max_rel_err": ${num(maxRel)}, """ +
          s""""bound": ${num(bound)}, "passed": ${maxRel <= bound}}"""
    }
    if (checkable("txt_quantiles_approx")) {
      // the geometric-histogram sketch's answer must sit within the
      // declared relative error of the exact quantile computed in the same
      // result row; the construction guarantees ≤1/(2M)≈1.6% per value, so
      // 10% is a loose hard ceiling. (Also oracle-backed — this check
      // guards ACCURACY, the replay guards determinism.)
      val bound = 0.10
      val maxRel = spark.read.parquet(s"$outDir/txt_quantiles_approx")
        .select(max(abs(col("q_approx") - col("q_exact")) /
          greatest(col("q_exact"), lit(1.0))).as("m"))
        .head().getDouble(0)
      engineChecks("txt_quantiles_approx") =
        s"""{"check": "approx_quantile_within_bound", "max_rel_err": ${num(maxRel)}, """ +
          s""""bound": ${num(bound)}, "passed": ${maxRel <= bound}}"""
    }
    val noOracle = (selected.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted
    val meta =
      s"""{"sf_dir": ${q(sfDir)},
         |"spark_version": ${q(spark.version)},
         |"queries_selected": ${selected.size},
         |"oracle_backed": ${selected.keySet.count(SparkEntry.oracleSql.contains)},
         |"dump_errors": ${dumpErrors.toSeq.sorted.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")},
         |"no_oracle_by_design": ${noOracle.map(q).mkString("[", ", ", "]")},
         |"engine_checks": ${engineChecks.map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ", ", "}")}}""".stripMargin
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"), meta)
    spark.stop()
  }
}
