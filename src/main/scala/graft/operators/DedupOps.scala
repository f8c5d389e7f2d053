package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact, n-gram
  * Jaccard, MinHash+LSH, and SimHash near-dup detection over `documents`.
  *
  * Scale design: the only all-pairs computation is inside LSH buckets /
  * shared-shingle groups, never across the whole corpus. MinHash signatures
  * are computed with higher-order array expressions (no explode until the
  * band step), so the per-row cost is bounded and codegen-friendly. At
  * 100 TB the band→bucket join is the single shuffle; skewed buckets (very
  * common shingles) are the thing to watch — the Jaccard variant caps
  * candidate generation by a document-frequency filter for that reason.
  */
object DedupOps {

  /** 3-word shingle set of a document, after shared tokenization. */
  def withShingles(df: DataFrame): DataFrame =
    df.withColumn("w", TextOps.words(col("text")))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", expr(
        """array_distinct(transform(sequence(0, size(w) - 3),
          |  i -> concat_ws(' ', element_at(w, i + 1), element_at(w, i + 2),
          |                 element_at(w, i + 3))))""".stripMargin))

  private val duckShingles =
    """SELECT doc_id,
      |  list_distinct(list_transform(range(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |FROM (SELECT doc_id,
      |        list_filter(string_split_regex(lower(text), '\s+'),
      |                    x -> len(x) > 0) AS w
      |      FROM documents)
      |WHERE len(w) >= 3""".stripMargin

  /** Exact pairwise Jaccard on (doc_a, doc_b) with shingle arrays present. */
  private def jaccard(inter: Column, sa: Column, sb: Column): Column =
    inter.cast("double") / (sa + sb - inter)

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: hash-groupBy on normalized content (the reference's
    // drop_duplicates contract, polygon-etl-container/src/reference_endpoints_etl.py:56,
    // restated README.md:20). One shuffle on the fingerprint.
    QueryDef.sqlBacked(
      "dedup_exact",
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY 1
        |ORDER BY canonical_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))
          .cast("binary")).as("fp"))
        .agg(min(col("doc_id")).as("canonical_id"),
             count(lit(1)).as("n_copies"))
        .orderBy(col("canonical_id"))
    },

    // N-gram Jaccard near-dup, exact, on a deterministic 1/10 sample:
    // candidate pairs via shared-shingle self-join (complete for jaccard>0),
    // then exact intersection/union arithmetic. Oracle-backed.
    QueryDef.sqlBacked(
      "dedup_ngram_jaccard",
      s"""WITH d2 AS ($duckShingles AND doc_id % 10 = 0),
         |  sz AS (SELECT doc_id, len(sh) AS n FROM d2),
         |  ex AS (SELECT doc_id, unnest(sh) AS s FROM d2),
         |  pairs AS (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac
         |FROM pairs
         |JOIN sz sa ON sa.doc_id = doc_a
         |JOIN sz sb ON sb.doc_id = doc_b
         |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val sh = withShingles(Tables.documents(s, d).filter(col("doc_id") % 10 === 0))
        .select(col("doc_id"), col("sh"))
      val sz = sh.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
      val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      val pairs = ex.as("a").join(ex.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(sz.as("sa"), col("sa.doc_id") === col("doc_a"))
        .join(sz.as("sb"), col("sb.doc_id") === col("doc_b"))
        .withColumn("jac", jaccard(col("inter"), col("sa.n"), col("sb.n")))
        .filter(col("jac") >= 0.2)
        .select(col("doc_a"), col("doc_b"), col("jac"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // MinHash + LSH near-dup over the FULL corpus — the scale path.
    // 64 minhashes (seeded xxhash64 over the shingle set, computed as one
    // higher-order expression: no explode, no shuffle), 16 bands × 4 rows,
    // bucket self-join on (band, signature), exact-Jaccard verification of
    // candidates only. Threshold 0.5. Hash functions are engine-specific →
    // rows-only oracle; correctness is locked by DedupSpec (planted dups)
    // and by containment in dedup_ngram_jaccard on the sampled subset.
    QueryDef.rowsOnly("dedup_minhash_lsh") { (s, d) =>
      minhashLsh(Tables.documents(s, d), threshold = 0.5)
    },

    // SimHash near-dup: 64-bit signature from token hashes, banded into 4
    // 16-bit chunks (guarantees detection at hamming distance ≤ 3).
    QueryDef.rowsOnly("dedup_simhash") { (s, d) =>
      simhash(Tables.documents(s, d), maxHamming = 3)
    }
  )

  /** MinHash-LSH candidate generation + exact verification. Returns
    * (doc_a, doc_b, jac) for pairs with Jaccard ≥ threshold.
    */
  def minhashLsh(documents: DataFrame, threshold: Double,
                 numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sh = withShingles(documents).select(col("doc_id"), col("sh"))
    // signature: mh[i] = min over shingles of xxhash64(i, shingle)
    val signed = sh.withColumn("mh", expr(
      s"""transform(sequence(0, ${numHashes - 1}),
         |  i -> array_min(transform(sh, t -> xxhash64(i, t))))""".stripMargin))
    val banded = signed.select(col("doc_id"), col("sh"),
      posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}), b -> xxhash64(
           |  ${(1 to rowsPerBand).map(r => s"element_at(mh, $rowsPerBand * b + $r)").mkString(", ")}))"""
          .stripMargin)).as(Seq("band", "sig")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jac", jaccard(col("inter"),
        size(col("sh_a")).cast("long"), size(col("sh_b")).cast("long")))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming. Banding into
    * (maxHamming + 1) chunks guarantees any qualifying pair shares a chunk.
    */
  def simhash(documents: DataFrame, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val chunkBits = 64 / chunks
    // Features are 3-word shingles, not words: on a small vocabulary every
    // document shares most WORDS (signatures collapse), while shingle sets
    // stay discriminative.
    val sig = withShingles(documents)
      .withColumn("th", expr("transform(sh, t -> xxhash64(t))"))
      .withColumn("sig", expr(
        """aggregate(sequence(0, 63), bigint(0), (acc, j) ->
          |  acc + if(aggregate(th, bigint(0),
          |             (sv, h) -> sv + 2 * getbit(h, j) - 1) > 0,
          |           shiftleft(bigint(1), j), bigint(0)))""".stripMargin))
      .select(col("doc_id"), col("sig"))
    val banded = sig.select(col("doc_id"), col("sig"),
      posexplode(expr(
        s"""transform(sequence(0, ${chunks - 1}),
           |  c -> (shiftright(sig, c * $chunkBits) & ${(1L << chunkBits) - 1}))"""
          .stripMargin)).as(Seq("chunk_idx", "chunk")))
    banded.as("a").join(banded.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
