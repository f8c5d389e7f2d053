package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language identification, document
  * fingerprinting. All are narrow per-row projections — they parallelize
  * trivially and keep whole-stage codegen (no UDFs; built-in string/array
  * expressions only), so the same plan runs at 100 TB with zero shuffles
  * except the final declared ORDER BY.
  */
object TextOps {

  /** Whitespace tokens, lower-cased, empties dropped — shared definition so
    * Spark and the DuckDB oracle agree on tokenization exactly.
    */
  def words(c: Column): Column =
    filter(split(lower(c), "\\s+"), w => length(w) > 0)

  /** BPE-ish token regex: runs of alphanumerics OR single non-space symbols. */
  val TokenRe = "[a-z0-9]+|[^a-z0-9\\s]"

  /** Geometric-grid snap for the approx-quantile sketch, over a BIGINT
    * column named by `c`: octave e = floor(log2 v), the [2^e, 2^(e+1))
    * octave split into 32 equal buckets, value replaced by the bucket
    * MIDPOINT carried ×64 so every intermediate stays integer (u/64 is
    * the snapped value; |u − 64·v| ≤ 2^e, i.e. relative error ≤ 1/64 —
    * PropertySpec proves the bound over random longs up to 2^55).
    * PRECONDITION: v < 2^57 — the ×64 midpoint carry reaches 127·2^e and
    * wraps BIGINT above that (Spark wraps silently, DuckDB throws, so the
    * cross-engine replay would diverge too). Character/token counts sit
    * ten orders of magnitude below the cap; a caller sketching an
    * unbounded-domain column must range-check first. Non-positive values
    * pass through exactly (×64). Shared by txt_quantiles_approx and its
    * test so the formula cannot drift. Requires a sibling `e` column =
    * length(bin(c)) − 1.
    */
  private[graft] def geoSnapSql(c: String): String =
    s"""CASE WHEN $c <= 0 THEN $c * 64
       |  ELSE shiftleft(1L, e) * (64 +
       |    2 * ((($c - shiftleft(1L, e)) * 32)
       |         div shiftleft(1L, e)) + 1) END""".stripMargin

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "it")

  /** Tiny per-language stopword profiles (public-knowledge heuristic set). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "zh" -> Seq("de5", "shi4", "bu4", "wo3", "le5", "zai4", "you3"))

  val defs: Seq[QueryDef] = Seq(

    // Token counting: whitespace tokens + BPE-ish regex tokens + raw length.
    QueryDef.sqlBacked(
      "txt_tokens",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |                       x -> len(x) > 0)) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]'))
        |       AS BIGINT) AS n_re_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(words(col("text"))).cast("long").as("n_ws_tokens"),
          regexp_count(lower(col("text")), lit(TokenRe)).cast("long").as("n_re_tokens"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Quality scoring: stopword ratio, mean word length, punctuation ratio,
    // composite score. Every double is derived from exact integer counts by
    // the identical arithmetic on both sides → bit-exact.
    QueryDef.sqlBacked(
      "txt_quality",
      s"""WITH t AS (
         |  SELECT doc_id, length(text) AS n_chars,
         |    list_filter(string_split_regex(lower(text), '\\s+'),
         |                x -> len(x) > 0) AS w,
         |    len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS n_punct
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tok,
         |  len(list_filter(w, x -> x IN (${Stopwords.map("'" + _ + "'").mkString(",")})))
         |    / CAST(len(w) AS DOUBLE) AS stop_ratio,
         |  CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w)
         |    AS mean_word_len,
         |  n_punct / CAST(n_chars AS DOUBLE) AS punct_ratio,
         |  0.5 * (len(list_filter(w, x -> x IN (${Stopwords.map("'" + _ + "'").mkString(",")})))
         |           / CAST(len(w) AS DOUBLE))
         |    + 0.3 * least(1.0, len(w) / 50.0)
         |    + 0.2 * (1.0 - n_punct / CAST(n_chars AS DOUBLE)) AS quality_score
         |FROM t
         |WHERE len(w) > 0
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      qualityProjection(Tables.documents(s, d)).orderBy(col("doc_id"))
    },

    // Language ID: stopword-profile voting over whitespace tokens. Oracle:
    // the same profiles (generated from LangProfiles, single source of
    // truth) scored as distinct-stopword hits, argmax with the same
    // (score, lang)-struct tie-break via ORDER BY sc DESC, l DESC.
    QueryDef.sqlBacked(
      "txt_langid", {
        val structs = LangProfiles.map { case (lang, profile) =>
          val arr = profile.map(w => s"'$w'").mkString("[", ",", "]")
          s"struct_pack(sc := len(list_filter($arr, p -> list_contains(w, p))), l := '$lang')"
        }.mkString(",\n    ")
        s"""WITH d AS (SELECT doc_id, lang,
           |    list_filter(string_split_regex(lower(text), '\\s+'),
           |                x -> len(x) > 0) AS w
           |  FROM documents),
           |s AS (SELECT doc_id, lang, unnest([
           |    $structs
           |  ]) AS c
           |  FROM d),
           |p AS (SELECT doc_id, lang, c.l AS predicted
           |  FROM s
           |  QUALIFY row_number() OVER (PARTITION BY doc_id
           |                             ORDER BY c.sc DESC, c.l DESC) = 1)
           |SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
           |FROM p GROUP BY 1, 2
           |ORDER BY 1, 2""".stripMargin
      }) { (s, d) =>
      val docs = Tables.documents(s, d).withColumn("w", words(col("text")))
      val scored = LangProfiles.foldLeft(docs) { case (df, (lang, profile)) =>
        df.withColumn(s"score_$lang",
          size(array_intersect(col("w"), array(profile.map(lit): _*))))
      }
      // argmax via greatest over (score, lang) structs — deterministic
      // tie-break on lang name descending encoded in the struct comparison.
      val structs = LangProfiles.map { case (lang, _) =>
        struct(col(s"score_$lang").as("s"), lit(lang).as("l"))
      }
      scored
        .withColumn("predicted", greatest(structs: _*).getField("l"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    },

    // Deterministic train/val/test assignment — the split step of every
    // training-data pipeline. The bucket is a multiplicative integer hash
    // of doc_id, written as the IDENTICAL sign-preserving expression on
    // both sides (% is sign-preserving in Spark and DuckDB alike, the
    // pre-reduction mod 1000003 keeps the product far from BIGINT overflow
    // — DuckDB errors on overflow where Spark wraps — and the +100 fold
    // lands negative ids in [0, 100) the same way in both engines);
    // 80/10/10. At 100 TB this is a stateless projection any executor
    // computes locally — no shuffle, no lookup table, and the assignment is
    // stable under reprocessing (same id → same split). For adversarial id
    // spaces swap in xxhash64 (engine-specific, so the portable-arithmetic
    // variant is what the oracle checks).
    QueryDef.sqlBacked(
      "txt_sample_split",
      """SELECT doc_id,
        |  CAST(((doc_id % 1000003) * 40503 % 100 + 100) % 100 AS BIGINT)
        |    AS bucket,
        |  CASE WHEN ((doc_id % 1000003) * 40503 % 100 + 100) % 100 < 80
        |         THEN 'train'
        |       WHEN ((doc_id % 1000003) * 40503 % 100 + 100) % 100 < 90
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val bucket =
        ((col("doc_id") % 1000003L) * 40503L % 100L + 100L) % 100L
      Tables.documents(s, d)
        .select(col("doc_id"), bucket.cast("long").as("bucket"),
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    },

    // EXACT stratified split: within every language, documents rank by the
    // same deterministic hash (a reproducible shuffle) and the first 80% /
    // next 10% / rest split — so per-stratum proportions are EXACT, where
    // the global hash split (txt_sample_split) only holds them in
    // expectation and can starve a small language. The rank is a window
    // over each stratum; at crawl scale strata are languages (bounded
    // cardinality) and the per-stratum ordering is the price of exact
    // proportions — use the hash split when expectation suffices.
    QueryDef.sqlBacked(
      "txt_stratified_split",
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY (doc_id % 1000003) * 40503 % 65536, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN rk * 10 <= n * 8 THEN 'train'
        |       WHEN rk * 10 <= n * 9 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM r
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      stratifiedSplit(Tables.documents(s, d), "lang")
    },

    // Corpus-wide vocabulary top-k — the heavy-hitter pass of vocab/BPE
    // building. Scale shape: explode is a narrow generator, the count is a
    // partial-then-final hash aggregate (map-side combine bounds the
    // shuffle at |vocab| per partition, not |corpus|), and the top-k is
    // TakeOrderedAndProject — k rows per partition cross to the driver.
    // Tie-break (n DESC, word ASC) is total, so the oracle is exact.
    QueryDef.sqlBacked(
      "txt_vocab_topk",
      """SELECT w AS word, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                    x -> len(x) > 0)) AS w
        |      FROM documents)
        |GROUP BY w
        |ORDER BY n DESC, word
        |LIMIT 20""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(words(col("text"))).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)
    },

    // Repetition scoring — the Gopher-rule quality signal: fraction of
    // duplicate tokens and duplicate bigrams per document (high values mark
    // boilerplate/spam for filtering). Ratios derive from exact integer
    // counts by identical arithmetic on both sides → bit-exact. Narrow
    // per-row projection, zero shuffles at any scale.
    QueryDef.sqlBacked(
      "txt_repetition",
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> len(x) > 0) AS w
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, w,
        |    list_transform(range(len(w) - 1), i -> w[i + 1] || ' ' || w[i + 2])
        |      AS big
        |  FROM t WHERE len(w) >= 2)
        |SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_tok,
        |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_tok,
        |  1.0 - len(list_distinct(w)) / CAST(len(w) AS DOUBLE) AS dup_tok_ratio,
        |  1.0 - len(list_distinct(big)) / CAST(len(big) AS DOUBLE)
        |    AS dup_bigram_ratio
        |FROM b
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("w", words(col("text")))
        .filter(size(col("w")) >= 2)
        .withColumn("big", expr(
          "transform(sequence(0, size(w) - 2), " +
            "i -> concat(element_at(w, i + 1), ' ', element_at(w, i + 2)))"))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_tok"),
          size(array_distinct(col("w"))).cast("long").as("n_distinct_tok"),
          (lit(1.0) - size(array_distinct(col("w"))) /
            size(col("w")).cast("double")).as("dup_tok_ratio"),
          (lit(1.0) - size(array_distinct(col("big"))) /
            size(col("big")).cast("double")).as("dup_bigram_ratio"))
        .orderBy(col("doc_id"))
    },

    // Document fingerprinting: content hash of whitespace-normalized text.
    // md5 is identical across engines → exact oracle.
    QueryDef.sqlBacked(
      "txt_fingerprint",
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")).cast("binary")).as("fp"))
        .orderBy(col("doc_id"))
    },

    // EXACT grouped quantiles of document length, percentile_cont
    // semantics. NOT Spark's `percentile` aggregate — that buffers every
    // value of a group in one reducer, a scale-killer for a popular
    // language at crawl scale. Instead the distribution is compacted to a
    // (lang, length) HISTOGRAM first (shuffle bounded by the value domain,
    // map-side partial counts), and the interpolated quantile is read off
    // cumulative ranks — see exactQuantiles. The oracle is DuckDB's
    // quantile_cont, the same linear interpolation.
    QueryDef.sqlBacked(
      "txt_quantiles",
      """WITH qq AS (
        |  SELECT lang,
        |    unnest(CAST([0.25, 0.5, 0.75, 0.9, 0.99] AS DOUBLE[])) AS p,
        |    unnest(quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9, 0.99])) AS q
        |  FROM documents GROUP BY lang)
        |SELECT lang, p, round(q, 6) AS q FROM qq
        |ORDER BY lang, p""".stripMargin) { (s, d) =>
      exactQuantiles(Tables.documents(s, d), "n_chars", "lang",
        Seq(0.25, 0.5, 0.75, 0.9, 0.99))
    },

    // WINSORIZATION — outlier clamping at per-group exact percentiles
    // (the robust-statistics data-cleaning step: cap, don't drop): each
    // value clamped into its language's [p05, p95]. Composes the
    // histogram-compacted exactQuantiles (shuffle bounded by the value
    // domain) with a broadcast threshold join and a codegen clamp —
    // nothing new shuffles. Exactness: the bounds are the SAME rounded
    // interpolated quantiles txt_quantiles already proves hash-exact,
    // and least/greatest on identical doubles is bit-stable.
    QueryDef.sqlBacked(
      "txt_winsorize",
      """WITH q AS (
        |  SELECT lang, round(quantile_cont(n_chars, 0.05), 6) AS lo,
        |         round(quantile_cont(n_chars, 0.95), 6) AS hi
        |  FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |  least(greatest(CAST(d.n_chars AS DOUBLE), q.lo), q.hi)
        |    AS n_chars_w
        |FROM documents d JOIN q USING (lang)
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      winsorize(Tables.documents(s, d), "n_chars", "lang",
        pLo = 0.05, pHi = 0.95)
    },

    // QUALITY DECILES — curriculum bucketing: each doc's within-language
    // quality decile (1 = worst, 10 = best), the label a staged training
    // run orders its data by. ntile is SQL-standard on both engines
    // (earlier buckets take the extra rows) and the (q6, doc_id) order
    // is total, so the assignment is deterministic and hash-exact.
    // One shuffle by language; the rank never leaves its stratum.
    QueryDef.sqlBacked(
      "txt_deciles",
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    list_filter(string_split_regex(lower(text), '\\s+'),
         |                x -> len(x) > 0) AS w,
         |    len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS n_punct,
         |    length(text) AS n_chars
         |  FROM documents),
         |q AS (SELECT doc_id, lang,
         |    CAST(floor((
         |      0.5 * (len(list_filter(w, x -> x IN (${Stopwords.map("'" + _ + "'").mkString(",")})))
         |               / CAST(len(w) AS DOUBLE))
         |        + 0.3 * least(1.0, len(w) / 50.0)
         |        + 0.2 * (1.0 - n_punct / CAST(n_chars AS DOUBLE))
         |      ) * 1000000) AS BIGINT) AS q6
         |  FROM t WHERE len(w) > 0)
         |SELECT doc_id, lang, q6,
         |  ntile(10) OVER (PARTITION BY lang ORDER BY q6, doc_id) AS decile
         |FROM q
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      qualityDeciles(Tables.documents(s, d))
    },

    // Per-group top-k (top documents per language by length, total
    // tie-break). The rank filter compiles to WindowGroupLimit (locked in
    // PlanSpec): each partition keeps a k-row heap per group BEFORE the
    // window sort — per-group state is k rows, not the group, so a popular
    // language cannot create a single-task sort at crawl scale.
    QueryDef.sqlBacked(
      "txt_top_docs",
      """SELECT lang, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 3
        |ORDER BY lang, n_chars DESC, doc_id""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), col("n_chars"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .orderBy(col("lang"), col("n_chars").desc, col("doc_id"))
    },

    // Quality-weighted deterministic downsampling: keep probability scales
    // with document length (stand-in for any quality score), decided by a
    // stateless multiplicative hash of doc_id — the same doc always gets
    // the same decision, so incremental reprocessing never flips samples
    // (the property rand() lacks). Pure projection + filter: zero shuffle
    // at any scale; both engines evaluate identical integer arithmetic.
    QueryDef.sqlBacked(
      "txt_weighted_sample",
      """SELECT doc_id, n_chars,
        |  round(least(1.0, n_chars / 2000.0), 6) AS keep_w
        |FROM documents
        |WHERE ((doc_id % 1000003) * 48271 % 1000000) / 1000000.0
        |      < least(1.0, n_chars / 2000.0)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val u = ((col("doc_id") % 1000003L) * 48271L % 1000000L) / 1000000.0
      val w = least(lit(1.0), col("n_chars") / 2000.0)
      Tables.documents(s, d)
        .filter(u < w)
        .select(col("doc_id"), col("n_chars"), round(w, 6).as("keep_w"))
        .orderBy(col("doc_id"))
    },

    // The CONTINUOUS-domain APPROXIMATE quantile path: a deterministic
    // GEOMETRIC-HISTOGRAM sketch (the q-digest/moment-sketch idea in its
    // simplest portable form). Values are snapped to a geometric grid —
    // e = floor(log2 v) off the bit length, then the [2^e, 2^(e+1)) octave
    // split into M=32 equal buckets, each represented by its midpoint
    // (carried ×2M so every intermediate stays a BIGINT) — and the exact
    // interpolated quantile is read off the compressed histogram. Sketch
    // size is bounded by the VALUE DOMAIN (≤ 64 octaves × M buckets per
    // group — mergeable partial counts, constant memory however many rows),
    // and relative value error is ≤ 1/(2M) ≈ 1.6% by construction
    // (observed ≤1.5% at every fixture SF). Unlike approx_percentile's
    // Greenwald-Khanna sketch, every step is integer arithmetic both
    // engines replay bit-identically — so this query is hash-exact AND
    // still carries the exact quantile alongside with the error bound
    // machine-checked in verify_meta. The final /2M is a power-of-two
    // double division (exact) applied AFTER the shared round(…, 6), so
    // the two engines' doubles cannot drift.
    QueryDef.sqlBacked(
      "txt_quantiles_approx",
      """WITH g AS (
        |  SELECT lang, CASE WHEN n_chars <= 0 THEN n_chars * 64
        |    ELSE (CAST(1 AS BIGINT) << e) * (64 +
        |      2 * (((n_chars - (CAST(1 AS BIGINT) << e)) * 32)
        |           // (CAST(1 AS BIGINT) << e)) + 1) END AS u
        |  FROM (SELECT lang, n_chars,
        |          length(printf('%b', n_chars)) - 1 AS e
        |        FROM documents WHERE n_chars IS NOT NULL)),
        |qa AS (
        |  SELECT lang,
        |    unnest(CAST([0.25, 0.5, 0.75, 0.9, 0.99] AS DOUBLE[])) AS p,
        |    unnest(quantile_cont(u, [0.25, 0.5, 0.75, 0.9, 0.99])) AS q
        |  FROM g GROUP BY lang),
        |qe AS (
        |  SELECT lang,
        |    unnest(CAST([0.25, 0.5, 0.75, 0.9, 0.99] AS DOUBLE[])) AS p,
        |    unnest(quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9, 0.99])) AS q
        |  FROM documents GROUP BY lang)
        |SELECT lang, p, round(qe.q, 6) AS q_exact,
        |  round(qa.q, 6) / 64 AS q_approx
        |FROM qe JOIN qa USING (lang, p)
        |ORDER BY lang, p""".stripMargin) { (s, d) =>
      val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
      val docs = Tables.documents(s, d)
      val exact = exactQuantiles(docs, "n_chars", "lang", ps)
        .withColumnRenamed("q", "q_exact")
      val g = docs.filter(col("n_chars").isNotNull)
        .withColumn("e", (length(bin(col("n_chars"))) - 1).cast("int"))
        .withColumn("u", expr(geoSnapSql("n_chars")))
      val approx = exactQuantiles(g, "u", "lang", ps)
        .select(col("lang"), col("p"), (col("q") / 64).as("q_approx"))
      exact.join(approx, Seq("lang", "p"))
        .orderBy(col("lang"), col("p"))
    },

    // TF-IDF top terms per document — the keyword-extraction / salient-term
    // signal (used for topic labeling, near-dup triage, retrieval pruning).
    // Exactness: idf = pln(N) − pln(df) from the PORTABLE ln over exact
    // integers (the txt_lm_xent move — no libm anywhere), so both engines
    // hold bit-identical doubles; the ranking happens on those unrounded
    // doubles with a term tie-break, and only the OUTPUT is rounded.
    // Scale: tf is ONE corpus shuffle on (doc_id, term) with map-side
    // combine; df and its log are vocab-bounded partial aggregates off tf
    // (the transcendental work is O(vocab)); scoring joins tf to the df
    // table on the term key (Zipf-skewed — AQE skew-join); per-doc top-k
    // compiles to WindowGroupLimit (k-row heap per group, no full sort).
    QueryDef.sqlBacked(
      "txt_tfidf",
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |                          x -> len(x) > 0)) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfz AS (
         |  SELECT term, e, (m - 1.0) / (m + 1.0) AS z FROM (
         |    SELECT term, e, CAST(df AS DOUBLE) /
         |             CAST(CAST(1 AS BIGINT) << e AS DOUBLE) AS m
         |    FROM (SELECT term, df, length(printf('%b', df)) - 1 AS e
         |          FROM (SELECT term, count(*) AS df FROM tf GROUP BY 1)))),
         |dfp AS (SELECT term, e * ${CorpusOps.Ln2} + ${CorpusOps.lnPoly("z")} AS lndf
         |        FROM dfz),
         |nz AS (
         |  SELECT e, (m - 1.0) / (m + 1.0) AS z FROM (
         |    SELECT e, CAST(n AS DOUBLE) /
         |             CAST(CAST(1 AS BIGINT) << e AS DOUBLE) AS m
         |    FROM (SELECT n, length(printf('%b', n)) - 1 AS e
         |          FROM (SELECT count(*) AS n FROM documents)))),
         |np AS (SELECT e * ${CorpusOps.Ln2} + ${CorpusOps.lnPoly("z")} AS lnn
         |       FROM nz),
         |sc AS (
         |  SELECT tf.doc_id, tf.term, tf.tf,
         |    tf.tf * ((SELECT lnn FROM np) - dfp.lndf) AS score
         |  FROM tf JOIN dfp USING (term)),
         |r AS (SELECT doc_id, term, tf, score,
         |        row_number() OVER (PARTITION BY doc_id
         |          ORDER BY score DESC, term) AS rk
         |      FROM sc)
         |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, CAST(tf AS BIGINT) AS tf,
         |  round(score, 6) AS score
         |FROM r WHERE rk <= 5
         |ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
      tfidfTopTerms(Tables.documents(s, d), k = 5)
        .orderBy(col("doc_id"), col("rk"))
    },

    // Inverted index — the retrieval-side artifact (term → sorted posting
    // list + df/cf stats). The df-cap is the at-scale design decision: a
    // stopword's posting list is the whole corpus (a single giant skewed
    // array no real engine materializes raw — impact-ordered truncation /
    // stop-listing is standard IR practice), so terms with df > 4N/5 keep
    // their exact df/cf stats but a NULL posting string. The cap is exact
    // integer cross-multiplication (df·capDen <= N·capNum). Postings are
    // sorted doc_ids joined into a canonical string so the hash compare is
    // representation-independent. The fixture vocabulary's df fraction
    // concentrates at ~0.77·N as N grows, so the 4/5 cap trips at the
    // smaller fixtures (5 terms at sf0.001, 1 at sf0.01) and the cap path
    // is additionally pinned by a deterministic spec corpus — no single
    // fraction splits a pack this tight at every SF.
    QueryDef.sqlBacked(
      "txt_inverted_index",
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                          x -> len(x) > 0)) AS term
        |  FROM documents),
        |pd AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT term, CAST(count(*) AS BIGINT) AS df,
        |  CAST(sum(tf) AS BIGINT) AS cf,
        |  CASE WHEN count(*) * 5 <= (SELECT n FROM n) * 4
        |       THEN array_to_string(list_sort(list(doc_id)), ',') END AS postings
        |FROM pd
        |GROUP BY term
        |ORDER BY term""".stripMargin) { (s, d) =>
      invertedIndex(Tables.documents(s, d), capNum = 4, capDen = 5)
        .orderBy(col("term"))
    },

    // Cross-document BOILERPLATE removal (the C4/MassiveText span-dedup
    // move): tile each document into non-overlapping fixed-length token
    // chunks, count each chunk's document frequency across the corpus, and
    // flag chunks that recur in >= minDf documents — navigation chrome,
    // license footers, templated headers. Per doc: chunk count, flagged
    // count, and the token count that SURVIVES removal. All-integer
    // contract (counts only) → hash-exact. Scale: chunk df is one
    // partial-aggregated shuffle; the blacklist is bounded by
    // total_chunks / minDf and broadcasts back (the ngram df-cap's
    // blacklist pattern — never a window, never a corpus-array join).
    QueryDef.sqlBacked(
      "txt_boilerplate",
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             x -> len(x) > 0) AS w
        |  FROM documents),
        |ex AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range((len(w) + 1) // 2),
        |      i -> array_to_string(list_slice(w, i * 2 + 1, i * 2 + 2), ' ')))
        |      AS chunk,
        |    unnest(list_transform(range((len(w) + 1) // 2),
        |      i -> least(2, len(w) - i * 2))) AS n_tok
        |  FROM d WHERE len(w) > 0),
        |df AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM ex GROUP BY 1),
        |bl AS (SELECT chunk FROM df WHERE df >= 25)
        |SELECT e.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(*) FILTER (WHERE b.chunk IS NOT NULL) AS BIGINT)
        |    AS n_flagged_chunks,
        |  CAST(coalesce(sum(e.n_tok) FILTER (WHERE b.chunk IS NULL), 0)
        |    AS BIGINT) AS kept_tokens
        |FROM ex e LEFT JOIN bl b USING (chunk)
        |GROUP BY e.doc_id
        |ORDER BY e.doc_id""".stripMargin) { (s, d) =>
      boilerplateSpans(Tables.documents(s, d), chunkLen = 2, minDf = 25)
        .orderBy(col("doc_id"))
    },

    // Per-language QUALITY GATE — the curation filter that actually drops
    // documents: rank every doc by the composite quality score WITHIN its
    // language and keep those above the bottom quartile. A global cut
    // would silently gut low-resource languages whose score distribution
    // sits lower; per-stratum ranking is the standard fix (same reasoning
    // as txt_stratified_split). The keep test cross-multiplies
    // (rank·100 > n·25) so no percentile interpolation or division enters;
    // scores are the bit-identical doubles of txt_quality's contract and
    // doc_id breaks ties, so both engines walk one deterministic order.
    // Scale: one shuffle by lang; per-language sorted rank, no global sort
    // (the final ORDER BY is the declared-output convention).
    QueryDef.sqlBacked(
      "txt_quality_gate",
      s"""WITH t AS (
         |  SELECT doc_id, lang, length(text) AS n_chars,
         |    list_filter(string_split_regex(lower(text), '\\s+'),
         |                x -> len(x) > 0) AS w,
         |    len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS n_punct
         |  FROM documents),
         |q AS (SELECT doc_id, lang,
         |    0.5 * (len(list_filter(w, x -> x IN (${Stopwords.map("'" + _ + "'").mkString(",")})))
         |             / CAST(len(w) AS DOUBLE))
         |      + 0.3 * least(1.0, len(w) / 50.0)
         |      + 0.2 * (1.0 - n_punct / CAST(n_chars AS DOUBLE))
         |      AS quality_score
         |  FROM t WHERE len(w) > 0),
         |r AS (SELECT doc_id, lang, quality_score,
         |    row_number() OVER (PARTITION BY lang
         |                       ORDER BY quality_score, doc_id) AS q_rank,
         |    count(*) OVER (PARTITION BY lang) AS n_lang
         |  FROM q)
         |SELECT doc_id, lang, CAST(q_rank AS BIGINT) AS q_rank,
         |  CAST(n_lang AS BIGINT) AS n_lang, quality_score
         |FROM r WHERE q_rank * 100 > n_lang * 25
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      qualityGate(Tables.documents(s, d), pctNum = 25, pctDen = 100)
        .orderBy(col("doc_id"))
    },

    // DATACARD — the corpus report a dataset release ships: per
    // (lang, source) stratum plus ROLLUP margins, document/token/char
    // volumes and mean quality. Exactness: quality means are sums of
    // INTEGERIZED scores (floor(q·1e6) as BIGINT — order-independent, the
    // float-sum trap the memory notes) divided once at the end by
    // identical operands. Scale: a pure partial-aggregated rollup —
    // result is bounded by |lang|·|source| strata, one shuffle.
    QueryDef.sqlBacked(
      "txt_datacard",
      s"""WITH t AS (
         |  SELECT doc_id, lang, source, length(text) AS n_chars,
         |    list_filter(string_split_regex(lower(text), '\\s+'),
         |                x -> len(x) > 0) AS w,
         |    len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS n_punct
         |  FROM documents),
         |q AS (SELECT doc_id, lang, source, len(w) AS n_tok, n_chars,
         |    CAST(floor((
         |      0.5 * (len(list_filter(w, x -> x IN (${Stopwords.map("'" + _ + "'").mkString(",")})))
         |               / CAST(len(w) AS DOUBLE))
         |        + 0.3 * least(1.0, len(w) / 50.0)
         |        + 0.2 * (1.0 - n_punct / CAST(n_chars AS DOUBLE))
         |      ) * 1000000) AS BIGINT) AS q6
         |  FROM t WHERE len(w) > 0)
         |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum(q6) AS DOUBLE) / count(*) / 1000000 AS mean_quality
         |FROM q
         |GROUP BY ROLLUP(lang, source)
         |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin) { (s, d) =>
      datacard(Tables.documents(s, d))
    },

    // HEAVY HITTERS — frequent-word detection WITHOUT a full-vocabulary
    // shuffle: a per-partition Misra-Gries summary (k-1 counters) emits a
    // guaranteed SUPERSET of the global heavy hitters — if freq(w) > n/k
    // corpus-wide then freq_p(w) > n_p/k in at least one partition
    // (pigeonhole over the partition sums), and k-1 counters never evict
    // a local item above that bar — then an exact recount of the
    // candidate set alone (broadcast semi-join, aggregate bounded by
    // partitions × k) yields EXACT counts: sketch error never reaches the
    // output, so the oracle is the plain exact GROUP BY ... HAVING.
    // txt_vocab_topk shuffles every distinct word; on an open crawl
    // vocabulary that shuffle is the cost this operator deletes — the
    // corpus is scanned exactly twice, map-only, and the only shuffled
    // rows are the bounded candidate set (the total token count rides the
    // candidate pass as one row per partition).
    QueryDef.sqlBacked(
      "txt_heavy_hitters",
      """WITH w AS (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                  x -> len(x) > 0)) AS word FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM w)
        |SELECT word, CAST(count(*) AS BIGINT) AS n
        |FROM w, tot
        |GROUP BY word, tot.n_total
        |HAVING count(*) * 30 > tot.n_total
        |ORDER BY n DESC, word""".stripMargin) { (s, d) =>
      heavyHitters(Tables.documents(s, d), k = 30)
    },

    // DATA-QUALITY EXPECTATIONS — the validation gate a corpus release
    // runs before shipping (the Deequ/Great-Expectations stage as one
    // declarative aggregate): row-count floor, no empty text, key
    // uniqueness, language domain, cross-column consistency
    // (n_chars == length(text)). ONE aggregation pass computes every
    // observation (countDistinct included — exact), then the per-rule
    // rows are a constant-size in-plan explode; nothing is collected.
    // All observations are exact BIGINTs → hash-exact oracle.
    QueryDef.sqlBacked(
      "txt_dq_report",
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS empty_text,
        |  CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS dup_ids,
        |  CAST(sum(CASE WHEN lang IS NULL OR lang NOT IN
        |                ('en','de','fr','es','zh')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS bad_lang,
        |  CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
        |       AS BIGINT) AS bad_chars
        |  FROM documents)
        |SELECT rule, observed, bound, passed FROM (
        |  SELECT 'lang_in_domain' AS rule, bad_lang AS observed,
        |         CAST(0 AS BIGINT) AS bound, bad_lang = 0 AS passed FROM a
        |  UNION ALL SELECT 'n_chars_matches_text', bad_chars,
        |         CAST(0 AS BIGINT), bad_chars = 0 FROM a
        |  UNION ALL SELECT 'no_empty_text', empty_text,
        |         CAST(0 AS BIGINT), empty_text = 0 FROM a
        |  UNION ALL SELECT 'row_count_min', n,
        |         CAST(100 AS BIGINT), n >= 100 FROM a
        |  UNION ALL SELECT 'unique_doc_id', dup_ids,
        |         CAST(0 AS BIGINT), dup_ids = 0 FROM a)
        |ORDER BY rule""".stripMargin) { (s, d) =>
      dqReport(Tables.documents(s, d))
    }
  )

  /** Corpus datacard rollup — see the txt_datacard QueryDef. */
  def datacard(docs: DataFrame): DataFrame =
    qualityProjection(docs)
      .select(col("doc_id"), col("n_tok"), col("quality_score"))
      .join(docs.select(col("doc_id"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars")), "doc_id")
      .withColumn("q6", floor(col("quality_score") * 1e6).cast("long"))
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("q6")).cast("double") / count(lit(1)) / 1e6)
          .as("mean_quality"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)

  /** Per-language bottom-percentile quality filter — see the
    * txt_quality_gate QueryDef. Returns survivors with their within-
    * language rank and stratum size so the caller can audit the cut.
    *
    * SCALE CAVEAT — this is the ORACLE form: the per-language rank window
    * sorts each stratum on one task chain, and a 100 TB corpus has only a
    * handful of languages — the single-task-window trap. Production runs
    * `qualityGateByThreshold`, which replaces the rank with a histogram-
    * compacted order statistic (shuffle bounded by the integerized score
    * DOMAIN, never the corpus) and brackets this gate's kept set exactly.
    */
  def qualityGate(docs: DataFrame, pctNum: Int = 25,
                  pctDen: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pctNum >= 0 && pctDen > 0, "cut percentile must be a fraction")
    val q = qualityProjection(docs)
      .select(col("doc_id"), col("quality_score"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val wRank = Window.partitionBy(col("lang"))
      .orderBy(col("quality_score"), col("doc_id"))
    val wLang = Window.partitionBy(col("lang"))
    q.withColumn("q_rank", row_number().over(wRank).cast("long"))
      .withColumn("n_lang", count(lit(1)).over(wLang))
      .filter(col("q_rank") * pctDen > col("n_lang") * pctNum)
      .select(col("doc_id"), col("lang"), col("q_rank"), col("n_lang"),
        col("quality_score"))
  }

  /** The 100 TB quality gate: the same per-language bottom-percentile cut
    * computed VALUE-level from a histogram of integerized scores instead
    * of a per-stratum rank window. Per language, t = the smallest q6 whose
    * cumulative count crosses the cut (the order statistic the rank form
    * drops at); docs with q6 > t are kept. No per-stratum sort ever sees
    * corpus-sized data: the histogram groupBy is bounded by the score
    * DOMAIN (≤1e6 buckets/language), its cumulative window runs over that
    * histogram, and the threshold frame (one row per language) broadcasts
    * into a codegen filter.
    *
    * Boundary contract vs the rank form (QuantileFunnelSpec): ties AT the
    * threshold value have no doc_id tie-break at value level, so
    * kept(q6 > t) ⊆ kept_rank ⊆ kept(q6 ≥ t) — this operator returns the
    * strict (conservative) side; pass `keepThresholdValue = true` for the
    * inclusive side.
    */
  def qualityGateByThreshold(docs: DataFrame, pctNum: Int = 25,
                             pctDen: Int = 100,
                             keepThresholdValue: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = qualityProjection(docs)
      .select(col("doc_id"), col("quality_score"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("q6", floor(col("quality_score") * 1e6).cast("long"))
    val hist = q.groupBy(col("lang"), col("q6")).agg(count(lit(1)).as("c"))
    val byV = Window.partitionBy(col("lang")).orderBy(col("q6"))
    val thr = hist
      .withColumn("cum", sum(col("c")).over(byV))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("lang"))))
      .filter(col("cum") * pctDen > col("n") * pctNum)
      .groupBy(col("lang")).agg(min(col("q6")).as("t"))
    q.join(broadcast(thr), Seq("lang"))
      .filter(if (keepThresholdValue) col("q6") >= col("t")
              else col("q6") > col("t"))
      .select(col("doc_id"), col("lang"), col("quality_score"))
  }

  /** Term → (df, cf, sorted posting string) — see the txt_inverted_index
    * QueryDef. Two-pass plan so an over-cap term's corpus-sized doc list
    * is NEVER collected (the ngram df-cap blacklist move): pass 1 is the
    * vocab-bounded df/cf aggregate off the persisted (term, doc, tf)
    * frame; the under-cap term set (vocab-bounded) semi-joins to gate
    * pass 2's collect_list, so per-term aggregate state is bounded by the
    * cap — a stopword contributes one stats row and zero posting entries.
    * The semi join carries no broadcast hint: a small vocabulary broadcasts
    * under AQE anyway, while a crawl-scale open vocabulary (probe regime:
    * millions of terms) must shuffle — hint-forcing would OOM the driver.
    */
  def invertedIndex(docs: DataFrame, capNum: Int = 4, capDen: Int = 5): DataFrame = {
    val perDoc = graft.core.GraftCaches.acquire(docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf")))
    val n = docs.agg(count(lit(1)).as("n"))
    val stats = perDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      .crossJoin(broadcast(n))
    val underCap = stats
      .filter(col("df") * capDen <= col("n") * capNum).select(col("term"))
    val postings = perDoc
      .join(underCap, Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(sort_array(collect_list(col("doc_id"))).as("plist"))
    stats.join(postings, Seq("term"), "left")
      .select(col("term"), col("df").cast("long").as("df"),
        col("cf").cast("long").as("cf"),
        expr("array_join(transform(plist, x -> cast(x AS string)), ',')")
          .as("postings"))
  }

  /** Cross-document boilerplate spans — see the txt_boilerplate QueryDef
    * for semantics and the scale argument. The tiling is arithmetic over
    * the shared `words` tokenization (chunk i covers tokens
    * [i·chunkLen+1, (i+1)·chunkLen], last chunk short), so Spark and the
    * oracle cannot disagree on chunk boundaries. The exploded chunk frame
    * persists for the duration (df pass + flag join share it); the
    * blacklist broadcast is bounded by total_chunks / minDf.
    */
  def boilerplateSpans(docs: DataFrame, chunkLen: Int = 8,
                       minDf: Long = 25L): DataFrame = {
    require(chunkLen > 0 && minDf > 1, "chunkLen and minDf must be positive")
    val nChunks = ((size(col("w")) + lit(chunkLen - 1)) / lit(chunkLen))
      .cast("int")
    val ex = graft.core.GraftCaches.acquire(docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .withColumn("i", explode(sequence(lit(0), nChunks - 1)))
      .select(col("doc_id"),
        concat_ws(" ",
          slice(col("w"), col("i") * chunkLen + 1, lit(chunkLen))).as("chunk"),
        least(lit(chunkLen), size(col("w")) - col("i") * chunkLen)
          .cast("long").as("n_tok")))
    val bl = ex.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("chunk"), lit(1).as("flagged"))
    ex.join(broadcast(bl), Seq("chunk"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(col("flagged")).as("n_flagged_chunks"),
        coalesce(sum(when(col("flagged").isNull, col("n_tok"))), lit(0L))
          .as("kept_tokens"))
  }

  /** Per-document top-k terms by TF-IDF — see the txt_tfidf QueryDef for
    * the exactness and scale contract. N counts ALL documents (empty docs
    * included) so the idf denominator is corpus-stable.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfp = CorpusOps.withPln(
        tf.groupBy(col("term")).agg(count(lit(1)).as("df")), "df", "lndf")
      .select(col("term"), col("lndf"))
    val np = CorpusOps.withPln(docs.agg(count(lit(1)).as("n")), "n", "lnn")
      .select(col("lnn"))
    val sc = tf.join(dfp, "term")
      .crossJoin(broadcast(np)) // one scalar row: ln(N)
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf").cast("double") * (col("lnn") - col("lndf"))).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    sc.select(col("doc_id"), col("term"), col("tf"), col("score"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("term"),
        col("tf").cast("long").as("tf"), round(col("score"), 6).as("score"))
  }

  /** Exact per-stratum 80/10/10 split — see the txt_stratified_split
    * QueryDef. Integer cross-multiplication (rk·10 ≤ n·8) keeps the
    * thresholds exact for every stratum size; the hash order is the same
    * portable multiplicative shuffle the global split uses, so the
    * assignment is stable under reprocessing.
    */
  def stratifiedSplit(docs: DataFrame, stratumCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(pmod((col("doc_id") % 1000003L) * 40503L, lit(65536L)), col("doc_id"))
    docs
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(stratumCol))))
      .select(col("doc_id"), col(stratumCol),
        when(col("rk") * 10 <= col("n") * 8, "train")
          .when(col("rk") * 10 <= col("n") * 9, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style quality scoring as a pure projection over (doc_id, text)
    * — stateless and shuffle-free, so the SAME builder runs on a batch
    * corpus and on a streaming ingest (StreamingSpec parity); the declared
    * query adds only an ORDER BY, which a stream cannot carry.
    */
  def qualityProjection(docs: DataFrame): DataFrame = {
    val stopArr = array(Stopwords.map(lit): _*)
    docs
      .withColumn("w", words(col("text")))
      .filter(size(col("w")) > 0)
      .withColumn("n_tok", size(col("w")).cast("long"))
      .withColumn("n_stop",
        size(filter(col("w"), x => array_contains(stopArr, x))).cast("long"))
      .withColumn("n_punct",
        regexp_count(lower(col("text")), lit("[^a-z0-9\\s]")).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_word_chars",
        expr("aggregate(w, bigint(0), (a, x) -> a + length(x))"))
      .select(col("doc_id"), col("n_tok"),
        (col("n_stop") / col("n_tok")).as("stop_ratio"),
        (col("n_word_chars").cast("double") / col("n_tok")).as("mean_word_len"),
        (col("n_punct") / col("n_chars").cast("double")).as("punct_ratio"),
        (lit(0.5) * (col("n_stop") / col("n_tok"))
          + lit(0.3) * least(lit(1.0), col("n_tok") / 50.0)
          + lit(0.2) * (lit(1.0) - col("n_punct") / col("n_chars").cast("double")))
          .as("quality_score"))
  }

  /** Exact percentile_cont over a DISCRETE value column, computed from a
    * compacted histogram instead of per-group value buffers: groupBy
    * (group, value) count → cumulative ranks over the histogram → the two
    * rows bracketing each target rank → linear interpolation. Every stage
    * is shuffle-bounded by the histogram size (distinct values per group),
    * never the row count; the rank windows run over the compacted
    * histogram, not the data. The exact-quantile analogue of what
    * approx_percentile trades away — use it when the domain is discrete
    * (lengths, counts, token budgets), approx_percentile for continuous.
    *
    * percentile_cont: target rank r = 1 + p(n-1) over the sorted values
    * (1-indexed); result = v[floor(r)] + (r - floor(r)) · (v[ceil(r)] -
    * v[floor(r)]).
    */
  def exactQuantiles(df: DataFrame, valueCol: String, groupCol: String,
                     ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null values would sort ahead of every real value in the cumulative
    // rank and silently shift all quantiles — exclude them, matching
    // SQL aggregate semantics (percentile_cont ignores NULLs)
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val byV = Window.partitionBy(groupCol).orderBy("v")
    val whole = Window.partitionBy(groupCol)
    val cum = hist
      .withColumn("end", sum("c").over(byV))
      .withColumn("start", col("end") - col("c") + 1)
      .withColumn("n", sum("c").over(whole))
    val bracket = cum
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("r", lit(1.0) + col("p") * (col("n") - 1).cast("double"))
      .withColumn("lo", floor(col("r")))
      .withColumn("hi", least(ceil(col("r")), col("n")))
      .filter(col("lo").between(col("start"), col("end")) ||
              col("hi").between(col("start"), col("end")))
    bracket.groupBy(col(groupCol), col("p"))
      .agg(
        min(when(col("lo").between(col("start"), col("end")), col("v"))).as("vlo"),
        min(when(col("hi").between(col("start"), col("end")), col("v"))).as("vhi"),
        first(col("r")).as("r"))
      .select(col(groupCol), col("p"),
        round(col("vlo") + (col("r") - floor(col("r"))) * (col("vhi") - col("vlo")), 6)
          .as("q"))
      .orderBy(col(groupCol), col("p"))
  }

  /** Within-language quality deciles — see the txt_deciles QueryDef. */
  def qualityDeciles(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    qualityProjection(docs)
      .select(col("doc_id"), col("quality_score"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("q6", floor(col("quality_score") * 1e6).cast("long"))
      .withColumn("decile", ntile(10).over(Window.partitionBy(col("lang"))
        .orderBy(col("q6"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("lang"), col("q6"), col("decile"))
      .orderBy(col("doc_id"))
  }

  /** Winsorization — see the txt_winsorize QueryDef. Clamps `valueCol`
    * into its group's [pLo, pHi] exact percentiles; the thresholds come
    * from `exactQuantiles` (histogram-compacted, domain-bounded shuffle)
    * and broadcast back as one row per group.
    */
  def winsorize(df: DataFrame, valueCol: String, groupCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo < pHi, "winsorize needs pLo < pHi")
    val qs = exactQuantiles(df, valueCol, groupCol, Seq(pLo, pHi))
    val bounds = qs.groupBy(col(groupCol)).agg(
      min(when(col("p") === pLo, col("q"))).as("lo"),
      min(when(col("p") === pHi, col("q"))).as("hi"))
    df.select(col("doc_id"), col(groupCol), col(valueCol))
      .join(broadcast(bounds), groupCol)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol).cast("double"), col("lo")), col("hi")))
      .select(col("doc_id"), col(groupCol), col(valueCol),
        col(s"${valueCol}_w"))
      .orderBy(col("doc_id"))
  }

  /** Data-quality expectation report — see the txt_dq_report QueryDef.
    * Returns one (rule, observed, bound, passed) row per expectation,
    * where `observed` is the exact violation count (or the measured
    * value for floor rules). A failing gate is `filter(!passed)` — a
    * pipeline aborts the release when it is non-empty. Scale: one
    * aggregation pass over the corpus with map-side partials (the
    * countDistinct expands to a two-phase exact aggregate); the report
    * itself is a constant-size in-plan explode, never a collect.
    */
  def dqReport(docs: DataFrame, minRows: Long = 100L,
               langDomain: Seq[String] =
                 Seq("en", "de", "fr", "es", "zh")): DataFrame = {
    val a = docs.agg(
      count(lit(1)).as("n"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("empty_text"),
      (count(lit(1)) - countDistinct(col("doc_id"))).as("dup_ids"),
      sum(when(col("lang").isNull || !col("lang").isin(langDomain: _*), 1L)
        .otherwise(0L)).as("bad_lang"),
      sum(when(col("n_chars") =!= length(col("text")), 1L)
        .otherwise(0L)).as("bad_chars"))
    def rule(name: String, observed: Column, bound: Column,
             passed: Column) =
      struct(lit(name).as("rule"), observed.cast("long").as("observed"),
        bound.cast("long").as("bound"), passed.as("passed"))
    a.select(explode(array(
        rule("row_count_min", col("n"), lit(minRows), col("n") >= minRows),
        rule("no_empty_text", col("empty_text"), lit(0L),
          col("empty_text") === 0),
        rule("unique_doc_id", col("dup_ids"), lit(0L), col("dup_ids") === 0),
        rule("lang_in_domain", col("bad_lang"), lit(0L),
          col("bad_lang") === 0),
        rule("n_chars_matches_text", col("bad_chars"), lit(0L),
          col("bad_chars") === 0))).as("r"))
      .select(col("r.rule").as("rule"), col("r.observed").as("observed"),
        col("r.bound").as("bound"), col("r.passed").as("passed"))
      .orderBy(col("rule"))
  }

  /** Per-partition Misra-Gries candidate pass over an exploded token frame
    * (single `word` column): each partition keeps at most k-1
    * decrement-counters and emits its surviving words (np = 0) plus ONE
    * (null, n_p) row carrying the partition's exact token count — so the
    * global total rides this pass instead of costing a third corpus scan.
    * Genuine per-partition imperative state (a bounded counter map with
    * decrement-all eviction) — the one shape `mapPartitions` exists for;
    * no DataFrame aggregate holds "at most k-1 groups, evict by global
    * decrement". Package-visible so the spec can pin the candidate-set
    * bound and the superset guarantee directly.
    */
  private[graft] def heavyHitterScan(toks: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("word", StringType, nullable = true),
      StructField("np", LongType, nullable = false)))
    val cap = k - 1
    toks.select(col("word")).mapPartitions { rows =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      var np = 0L
      while (rows.hasNext) {
        val w = rows.next().getString(0)
        np += 1
        m.get(w) match {
          case Some(c) => m.update(w, c + 1)
          case None if m.size < cap => m.update(w, 1L)
          case None =>
            // decrement-all, drop zeros: amortized O(1)/token — every unit
            // removed here was added by exactly one earlier increment
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            m.foreach { case (kw, c) =>
              if (c == 1L) dead += kw else m.update(kw, c - 1) }
            dead.foreach(m.remove)
        }
      }
      m.keysIterator.map(w => Row(w, 0L)) ++ Iterator(Row(null, np))
    }(RowEncoder.encoderFor(schema))
  }

  /** Exact heavy hitters — words with count·k > total token count — see
    * the txt_heavy_hitters QueryDef. The scan output is persisted (bounded
    * by partitions × k rows) because the candidate filter and the total
    * aggregate are separate consumers and Spark does not CSE across
    * branches — without it the corpus-wide candidate pass would run twice.
    */
  def heavyHitters(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "heavy-hitter threshold k must be >= 2")
    val toks = docs.select(explode(words(col("text"))).as("word"))
    val scan = graft.core.GraftCaches.acquire(heavyHitterScan(toks, k))
    val cands = scan.filter(col("word").isNotNull).select(col("word")).distinct()
    val total = scan.groupBy().agg(sum(col("np")).as("n_total"))
    toks.join(broadcast(cands), Seq("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * k > col("n_total"))
      .select(col("word"), col("n"))
      .orderBy(col("n").desc, col("word"))
  }
}
