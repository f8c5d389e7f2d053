package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus EXPORT operators — the last mile of a training-data pipeline,
  * where a cleaned corpus becomes the thing a trainer actually reads:
  * mixture resampling to target source proportions, deterministic sharding,
  * concat-and-chunk sequence packing, and PII scrubbing. The reference
  * stops at warehouse tables (aggregates-to-S3,
  * polygon-aggregates-etl/app/main.py); these are the operators that turn
  * such tables into training input at 100 TB.
  *
  * Shared design rules with the rest of the engine: every decision is a
  * deterministic function of ids (portable multiplicative hashes — stable
  * under reprocessing, no RNG state to checkpoint), every count is BIGINT
  * (hash-exact oracles), and every per-stratum/per-shard ordering is a
  * window over a bounded partition (strata = languages/sources, shards =
  * a chosen constant), never a global sort.
  */
object CorpusOps {

  /** Portable ordering hash (stable reshuffle): doc_id → [0, 65536). The
    * pre-reduction mod keeps products far from BIGINT overflow (DuckDB
    * errors where Spark wraps); 69069 is deliberately a DIFFERENT
    * multiplier from the 40503 split/shard hash so shard assignment and
    * within-shard order are independent streams.
    */
  private def orderHash(id: Column): Column =
    (id % 1000003L) * 69069L % 65536L

  private def shardHash(id: Column, n: Int): Column =
    (id % 1000003L) * 40503L % n.toLong

  /** MIXTURE RESAMPLING — hit target corpus proportions per stratum
    * (language, source, domain): the data-mixing step every LLM pretraining
    * run tunes. `weights` are integer percents summing to 100. Without
    * upsampling, the largest feasible corpus honoring the weights is
    * T = min_s floor(n_s · 100 / pct_s) (the binding stratum caps the
    * total); each stratum then keeps its first k_s = floor(pct_s · T / 100)
    * documents under the portable-hash ranking — a reproducible shuffle, so
    * the sample is stable under reprocessing and EXACT per stratum (the
    * same rank-threshold design as stratifiedSplit). All arithmetic is
    * integer.
    *
    * Scale: one tiny per-stratum count aggregate (broadcast back), one
    * rank window per stratum — bounded by stratum cardinality, the same
    * exemption as stratifiedSplit. Strata missing from `weights` are
    * dropped (weight zero).
    */
  def mixtureResample(docs: DataFrame, stratumCol: String,
                      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum == 100,
      s"mixture weights must sum to 100, got ${weights.map(_._2).sum}")
    require(weights.forall(_._2 > 0), "mixture weights must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights.toDF(stratumCol, "pct")
    val counts = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
    // the binding stratum: T = min over strata of floor(n*100/pct)
    val feas = counts.join(broadcast(w), stratumCol)
      .agg(min(expr("(n * 100L) div pct")).as("t"))
    val quota = w.crossJoin(broadcast(feas))
      .select(col(stratumCol), expr("(pct * t) div 100").as("k"))
    val rk = Window.partitionBy(col(stratumCol))
      .orderBy(orderHash(col("doc_id")), col("doc_id"))
    docs.select(col("doc_id"), col(stratumCol))
      .withColumn("rk", row_number().over(rk))
      .join(broadcast(quota), stratumCol)
      .filter(col("rk") <= col("k"))
      .select(col("doc_id"), col(stratumCol))
  }

  /** DETERMINISTIC SHARD ASSIGNMENT — (doc_id, shard, pos): shard by one
    * portable hash, position within the shard by an independent one (the
    * global shuffle a trainer needs, with no RNG to coordinate across a
    * restart). `exportShards` below materializes it.
    */
  def shardAssignment(docs: DataFrame, numShards: Int): DataFrame = {
    val rk = Window.partitionBy(col("shard"))
      .orderBy(orderHash(col("doc_id")), col("doc_id"))
    docs.select(col("doc_id"),
        shardHash(col("doc_id"), numShards).cast("long").as("shard"))
      .withColumn("pos", row_number().over(rk).cast("long"))
  }

  /** APPEND-ONLY shard assignment: place `docs` AFTER an existing
    * manifest's per-shard high-water marks (`basePos`: (shard, max_pos),
    * numShards rows, broadcast) — same portable shard/order hashes, so a
    * doc's shard and relative order are the ones `shardAssignment` would
    * have picked, offset past the base prefix. The evolution primitive
    * behind `CorpusIngest.extendExport`: positions already cut stay
    * byte-identical, new docs extend each shard's tail.
    */
  def shardAssignmentAfter(docs: DataFrame, numShards: Int,
                           basePos: DataFrame): DataFrame = {
    val rk = Window.partitionBy(col("shard"))
      .orderBy(orderHash(col("doc_id")), col("doc_id"))
    docs.select(col("doc_id"),
        shardHash(col("doc_id"), numShards).cast("long").as("shard"))
      .withColumn("rk", row_number().over(rk).cast("long"))
      .join(broadcast(basePos), Seq("shard"), "left_outer")
      .select(col("doc_id"), col("shard"),
        (col("rk") + coalesce(col("max_pos"), lit(0L))).as("pos"))
  }

  /** Materialize the sharded corpus: one directory per shard
    * (`shard=N/part-*`), rows inside each shard file in the deterministic
    * within-shard order. Reruns produce identical shard contents — the
    * property that lets a resumed training job trust a re-export. Each
    * shard is written by exactly one task (repartition on the shard
    * column), so `pos` order survives the write.
    */
  def exportShards(docs: DataFrame, path: String, numShards: Int): Unit = {
    val assigned = shardAssignment(docs, numShards)
      .join(docs, "doc_id")
    assigned.repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** CONCAT-AND-CHUNK SEQUENCE PACKING — GPT-style pretraining packs the
    * tokenized corpus into fixed-size context windows by concatenation:
    * within a shard, documents concatenate in the deterministic order and
    * the stream chunks every `budget` tokens, documents straddling window
    * boundaries. This computes each document's placement — token offset,
    * first and last window — from a per-shard running-sum window: exact
    * BIGINT arithmetic, one window pass per shard, shards processed in
    * parallel (the per-shard cumsum is the price of sequential packing
    * semantics, which is why real pipelines pack per shard, not globally).
    * Empty documents (zero tokens) are dropped — they occupy no window.
    */
  def packSequences(docs: DataFrame, budget: Int,
                    numShards: Int): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val w = Window.partitionBy(col("shard"))
      .orderBy(orderHash(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"),
        size(TextOps.words(col("text"))).cast("long").as("n_tok"),
        shardHash(col("doc_id"), numShards).cast("long").as("shard"))
      .filter(col("n_tok") > 0)
      .withColumn("off", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col("doc_id"), col("shard"), col("n_tok"), col("off"),
        expr(s"off div ${budget}L").as("first_seq"),
        expr(s"(off + n_tok - 1) div ${budget}L").as("last_seq"))
  }

  /** PII patterns shared by the operator and its oracle — conservative
    * expressions valid in BOTH Java regex (Spark) and RE2 (DuckDB): no
    * backreferences, no lookaround. Scrub order matters: emails first
    * (their local part may contain digits a later pass would chew on),
    * then phones (the +CC-NNN-NNNN shape would otherwise partially match
    * the IP pattern's digit runs), then bare IPv4s.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d{1,3}-\\d{3}-\\d{4}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII SCRUBBING — redact emails, phone numbers, and IPv4 addresses with
    * typed placeholders, reporting per-document match counts (the audit
    * trail a takedown/compliance pass reads; pair with Sinks.deleteByKey
    * for documents whose PII density disqualifies them outright). Pure
    * per-row projection: codegen'd regexp_replace, zero shuffles at any
    * scale.
    */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.withColumn("n_email", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_phone", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn("n_ip", regexp_count(t, lit(Ipv4Re)).cast("long"))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>"))
  }

  /** EPOCH-STYLE MIXTURE — the upsampling complement of mixtureResample:
    * instead of capping the corpus at the binding stratum, each stratum is
    * repeated `epochs` times per training pass (the Pile/LLaMA-style
    * mixture recipe: high-value sources run 2-3 epochs while bulk web runs
    * a fraction of one). Epochs arrive as integer MILLI-epochs (2500 =
    * 2.5×) so the arithmetic stays exact: every document emits
    * floor(e/1000) full copies plus one more iff its portable hash lands
    * under the fractional part — deterministic, reprocessing-stable, and
    * exact in expectation per stratum with no RNG state. Output carries a
    * `copy` ordinal so downstream sharding can spread repeats across
    * shards (hash on (doc_id, copy)). Pure projection + bounded explode:
    * zero shuffles at any scale. Strata missing from `epochs` are dropped.
    */
  def mixtureEpochs(docs: DataFrame, stratumCol: String,
                    epochs: Seq[(String, Int)]): DataFrame = {
    require(epochs.forall(_._2 > 0), "milli-epochs must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = epochs.toDF(stratumCol, "em")
    docs.select(col("doc_id"), col(stratumCol))
      .join(broadcast(w), stratumCol)
      .withColumn("ncopies",
        expr("em div 1000") +
          when((col("doc_id") % 1000003L) * 48271L % 1000L < col("em") % 1000,
            1L).otherwise(0L))
      .filter(col("ncopies") > 0)
      .select(col("doc_id"), col(stratumCol),
        explode(expr("sequence(0L, ncopies - 1)")).as("copy"))
  }

  /** PORTABLE NATURAL LOG of a positive BIGINT — libm-free, so every
    * engine computes the bit-identical double from the same integer: split
    * x = m·2^e with e from the binary-string length (floor(log2), pure
    * integer) and m = x/2^e ∈ [1,2) (power-of-two division is exact),
    * then ln(m) by the 6-term atanh series in z = (m−1)/(m+1) — a fixed
    * IEEE op sequence with decimal-literal coefficients that parse to the
    * same doubles everywhere. |error| < 1e-7 vs true ln over the full
    * BIGINT range, and the ERROR IS THE SAME in every engine — it is a
    * defined function, not an approximation contract (the same move as
    * PortableHash: portability over library precision). Shared between
    * the Spark build and the DuckDB oracle as a string template so the
    * two sides cannot drift; only floor(log2) differs by dialect
    * (`length(bin(x))` vs `length(printf('%b', x))`).
    */
  val Ln2 = "0.6931471805599453"

  /** ln(m) for m ∈ [1,2) via z = (m−1)/(m+1): 2z·(1 + z²/3 + z⁴/5 + …),
    * Horner form over a z-typed sub-expression string.
    */
  def lnPoly(z: String): String =
    s"2.0 * $z * (1.0 + ($z * $z) * (0.3333333333333333 + ($z * $z) * " +
      s"(0.2 + ($z * $z) * (0.14285714285714285 + ($z * $z) * " +
      s"(0.1111111111111111 + ($z * $z) * 0.09090909090909091)))))"

  /** BIGRAM LM CROSS-ENTROPY — the perplexity-style quality filter
    * (CCNet-shaped: score each document under a language model trained on
    * the corpus itself; outliers are boilerplate, spam, or wrong-language
    * text). The model is add-one-smoothed bigram MLE:
    * P(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + V), trained and scored in one
    * plan. Exactness design: log-probabilities come from the PORTABLE ln
    * above — computed once per count-table row from exact integers, so
    * both engines hold bit-identical doubles (a libm ln differs by 1 ulp
    * between engines, which flips any rounding boundary somewhere in a
    * million terms — the round-then-sum mitigation is NOT robust; removing
    * libm from the path is). The per-document sum is an ORDERED fold over
    * bigrams in position order (the mkt_ema_exact pattern), so the mean is
    * bit-exact end to end.
    *
    * Scale: the bigram/unigram count tables are vocab-bounded partial
    * aggregates and carry their log terms (the transcendental work is
    * O(vocab), not O(corpus)); scoring joins the exploded corpus against
    * them on the bigram key (Zipf-skewed — AQE's skew-join handles the hot
    * "of the" keys); the per-doc fold is a groupBy over document-sized
    * arrays. Documents with fewer than two tokens have no bigrams and are
    * excluded.
    */
  /** Spark side of the portable ln: append `out` = pln(`xExpr`) (xExpr a
    * positive-BIGINT expression) via the exact op sequence documented
    * above. Shared by every operator that exposes a log-derived score to
    * an oracle (bigram LM, TF-IDF).
    */
  def withPln(df: DataFrame, xExpr: String, out: String): DataFrame =
    df.withColumn("_x", expr(xExpr))
      .withColumn("_e", length(expr("bin(_x)")) - 1)
      .withColumn("_m", col("_x").cast("double") /
        expr("CAST(shiftleft(CAST(1 AS BIGINT), _e) AS DOUBLE)"))
      .withColumn("_z", (col("_m") - 1.0) / (col("_m") + 1.0))
      .withColumn(out, expr(s"_e * $Ln2 + ${lnPoly("_z")}"))
      .drop("_x", "_e", "_m", "_z")

  def bigramCrossEntropy(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), TextOps.words(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
    val bg = t.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(w) - 2), " +
        "i -> struct(i AS pos, concat_ws(' ', w[i], w[i + 1]) AS b, " +
        "w[i] AS w1))")).as("u"))
      .select(col("doc_id"), col("u.pos").as("pos"), col("u.b").as("b"),
        col("u.w1").as("w1"))
    val v = docs.select(TextOps.words(col("text")).as("w"))
      .select(explode(col("w")).as("x"))
      .agg(countDistinct(col("x")).as("vsz"))
    val cb = withPln(bg.groupBy(col("b")).agg(count(lit(1)).as("c12")),
      "c12 + 1L", "pnum").select(col("b"), col("pnum"))
    val cu = withPln(
      bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        .crossJoin(broadcast(v)),
      "c1 + vsz", "pden").select(col("w1"), col("pden"))
    val sc = bg.join(cb, "b").join(cu, "w1")
      .select(col("doc_id"), col("pos"),
        (col("pnum") - col("pden")).as("lp"))
    sc.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("aggregate(transform(array_sort(collect_list(struct(pos, lp))), " +
          "t -> t.lp), 0.0d, (a, x) -> a + x)").as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-col("slp") / col("n_bigrams"), 6).as("xent"))
  }

  /** The declared-query mixture: skewed-language corpus resampled to a
    * fixed target (en-heavy with equal tails) — non-trivial at every SF
    * because the fixture languages are genuinely skewed.
    */
  val MixWeights: Seq[(String, Int)] = Seq(
    "en" -> 40, "es" -> 15, "de" -> 15, "fr" -> 15, "zh" -> 15)

  val defs: Seq[QueryDef] = Seq(

    // Mixture resampling to target language proportions. Exactness: the
    // feasible total T and per-stratum quotas are pure integer arithmetic
    // (div = floor division on positives in both engines), and the kept
    // set is a rank threshold under the portable hash — the same
    // reproducible-shuffle contract as txt_stratified_split.
    QueryDef.sqlBacked(
      "txt_mixture_resample",
      """WITH w(lang, pct) AS (VALUES
        |    ('en', 40), ('es', 15), ('de', 15), ('fr', 15), ('zh', 15)),
        |counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |feas AS (SELECT min(n * 100 // pct) AS t
        |         FROM counts JOIN w USING (lang)),
        |quota AS (SELECT lang, pct * t // 100 AS k FROM w CROSS JOIN feas),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY (doc_id % 1000003) * 69069 % 65536, doc_id) AS rk
        |      FROM documents)
        |SELECT r.doc_id, r.lang FROM r JOIN quota USING (lang)
        |WHERE rk <= k
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      mixtureResample(Tables.documents(s, d), "lang", MixWeights)
        .orderBy(col("doc_id"))
    },

    // Epoch mixture: zh/de upsample past one epoch, en runs half of one —
    // the copy ordinal makes the repeat structure part of the contract.
    QueryDef.sqlBacked(
      "txt_mixture_epochs",
      """WITH w(lang, em) AS (VALUES
        |    ('en', 500), ('es', 1000), ('de', 1750), ('fr', 1000), ('zh', 2250)),
        |n AS (
        |  SELECT doc_id, lang,
        |    em // 1000 + CASE WHEN (doc_id % 1000003) * 48271 % 1000
        |                           < em % 1000
        |                      THEN 1 ELSE 0 END AS ncopies
        |  FROM documents JOIN w USING (lang))
        |SELECT doc_id, lang, CAST(u.c AS BIGINT) AS copy
        |FROM (SELECT doc_id, lang,
        |        unnest(list_transform(range(ncopies), c -> c)) AS c
        |      FROM n WHERE ncopies > 0) u
        |ORDER BY doc_id, copy""".stripMargin) { (s, d) =>
      mixtureEpochs(Tables.documents(s, d), "lang",
        Seq("en" -> 500, "es" -> 1000, "de" -> 1750, "fr" -> 1000,
          "zh" -> 2250))
        .orderBy(col("doc_id"), col("copy"))
    },

    // Deterministic sharding: the no-RNG global shuffle. 16 shards at
    // fixture scale; the assignment is a pure projection plus one rank
    // window per shard.
    QueryDef.sqlBacked(
      "txt_shard_export",
      """SELECT doc_id,
        |  CAST((doc_id % 1000003) * 40503 % 16 AS BIGINT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY (doc_id % 1000003) * 40503 % 16
        |    ORDER BY (doc_id % 1000003) * 69069 % 65536, doc_id) AS BIGINT)
        |    AS pos
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      shardAssignment(Tables.documents(s, d), numShards = 16)
        .orderBy(col("doc_id"))
    },

    // Sequence packing placement at a 512-token budget over 8 shards.
    // Exactness: per-shard BIGINT cumsum under the deterministic order;
    // window arithmetic identical on both sides (DuckDB's window SUM
    // returns HUGEINT — cast before the division).
    QueryDef.sqlBacked(
      "txt_pack_sequences",
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |                         x -> len(x) > 0)) AS BIGINT) AS n_tok,
        |    CAST((doc_id % 1000003) * 40503 % 8 AS BIGINT) AS shard
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, shard, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY shard
        |      ORDER BY (doc_id % 1000003) * 69069 % 65536, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tok AS off
        |  FROM t WHERE n_tok > 0)
        |SELECT doc_id, shard, n_tok, off,
        |  off // 512 AS first_seq,
        |  (off + n_tok - 1) // 512 AS last_seq
        |FROM o
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      packSequences(Tables.documents(s, d), budget = 512, numShards = 8)
        .orderBy(col("doc_id"))
    },

    // Bigram LM cross-entropy: train-and-score in one plan. The log terms
    // come from the shared PORTABLE ln template (interpolated below, so the
    // oracle cannot drift from the Spark build), and the per-doc sum is an
    // ordered fold over position-sorted terms — bit-exact end to end.
    // DuckDB's list indexing is 1-based where Spark's is 0-based, so
    // w[i+1]/w[i+2] there pairs the same tokens as w[i]/w[i+1] here.
    QueryDef.sqlBacked(
      "txt_lm_xent",
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '\\s+'),
         |                x -> len(x) > 0) AS w
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id, u.pos AS pos, u.b AS b, u.w1 AS w1
         |  FROM (SELECT doc_id,
         |          unnest(list_transform(range(len(w) - 1),
         |            i -> struct_pack(pos := i,
         |                   b := w[i + 1] || ' ' || w[i + 2],
         |                   w1 := w[i + 1]))) AS u
         |        FROM t WHERE len(w) >= 2)),
         |v AS (SELECT count(DISTINCT x) AS vsz
         |      FROM (SELECT unnest(w) AS x FROM t)),
         |cbz AS (
         |  SELECT b, e, (m - 1.0) / (m + 1.0) AS z FROM (
         |    SELECT b, e, CAST(x AS DOUBLE) /
         |             CAST(CAST(1 AS BIGINT) << e AS DOUBLE) AS m
         |    FROM (SELECT b, c12 + 1 AS x,
         |            length(printf('%b', c12 + 1)) - 1 AS e
         |          FROM (SELECT b, count(*) AS c12 FROM bg GROUP BY 1)))),
         |cbp AS (SELECT b, e * $Ln2 + ${lnPoly("z")} AS pnum FROM cbz),
         |cuz AS (
         |  SELECT w1, e, (m - 1.0) / (m + 1.0) AS z FROM (
         |    SELECT w1, e, CAST(x AS DOUBLE) /
         |             CAST(CAST(1 AS BIGINT) << e AS DOUBLE) AS m
         |    FROM (SELECT w1, x, length(printf('%b', x)) - 1 AS e
         |          FROM (SELECT w1, c1 + (SELECT vsz FROM v) AS x
         |                FROM (SELECT w1, count(*) AS c1
         |                      FROM bg GROUP BY 1))))),
         |cup AS (SELECT w1, e * $Ln2 + ${lnPoly("z")} AS pden FROM cuz),
         |sc AS (
         |  SELECT bg.doc_id, bg.pos, cbp.pnum - cup.pden AS lp
         |  FROM bg JOIN cbp USING (b) JOIN cup USING (w1)),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |    list(lp ORDER BY pos) AS lps
         |  FROM sc GROUP BY 1)
         |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
         |  round(-list_reduce(list_prepend(0.0, lps), (a, x) -> a + x)
         |    / n_bigrams, 6) AS xent
         |FROM agg
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      bigramCrossEntropy(Tables.documents(s, d))
        .orderBy(col("doc_id"))
    },

    // PII scrubbing. The fixture corpus is synthetic and PII-free, so the
    // query PLANTS deterministic PII derived from doc_id (one email, one
    // phone, one IP per document; a second email on every third) before
    // scrubbing — the redaction paths are exercised non-vacuously at every
    // SF and the oracle checks counts AND the scrubbed text fingerprint.
    QueryDef.sqlBacked(
      "txt_pii_scrub",
      """WITH planted AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id ||
        |    '@example.com' ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN ' cc admin' || doc_id || '@corp.example.org' ELSE '' END ||
        |    ' tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
        |    CAST((doc_id * 7) % 256 AS VARCHAR) AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_email,
        |  CAST(len(regexp_extract_all(text,
        |    '\+\d{1,3}-\d{3}-\d{4}')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
        |  md5(regexp_replace(
        |        regexp_replace(
        |          regexp_replace(text,
        |            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |            '<EMAIL>', 'g'),
        |          '\+\d{1,3}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'))
        |    AS scrubbed_md5
        |FROM planted
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val planted = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" cc admin"), col("doc_id"), lit("@corp.example.org")))
            .otherwise(lit("")),
          lit(" tel +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" host 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), ((col("doc_id") * 7) % 256).cast("string")).as("text"))
      piiScrub(planted)
        .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
          md5(col("text")).as("scrubbed_md5"))
        .orderBy(col("doc_id"))
    }
  )
}
