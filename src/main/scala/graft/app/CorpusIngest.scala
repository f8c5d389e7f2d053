package graft.app

import graft.core.Sinks
import graft.operators.{Components, DedupOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch CORPUS ingest driver — the document-side twin of Backfill: each
  * run lands one crawl drop into the corpus warehouse under the
  * incremental-scan-don't-refetch protocol the reference applies to bars
  * (old_source/old_source_op.py:129-176), here applied to dedup state.
  * One drop's lifecycle:
  *
  *   1. TRIM the drop to genuinely-new doc_ids (anti-join against the
  *      persisted shingle store) — a replayed drop contributes nothing.
  *   2. SCORE the increment against the corpus with
  *      minhashLshIncremental: fresh signatures for the increment ONLY;
  *      the corpus side is the persisted band/shingle store — old text is
  *      never re-read.
  *   3. APPEND the verified pairs to the cumulative pair table
  *      (idempotent on (doc_a, doc_b)).
  *   4. APPEND the increment's signatures to the store and the documents
  *      to the corpus table (both idempotent).
  *
  * The warehouse layout:
  *   corpus/documents      — all landed docs (doc_id keyed)
  *   corpus/shingles       — (doc_id, sh) exact shingle sets
  *   corpus/bands          — (doc_id, band, sig) MinHash LSH store
  *   corpus/pairs          — cumulative verified near-dup pairs
  *
  * `survivors` derives the deduplicated corpus VIEW on demand: connected
  * components over the cumulative pair table (bounded by the duplicated
  * subset, not the corpus), keep-the-minimum canonical per cluster,
  * anti-join the losers. It is a read-side derivation, not a stored table
  * — the pair table is the durable state, so survivors never needs
  * backfilling after a takedown rewrites documents.
  *
  * Usage: runMain graft.app.CorpusIngest <dropParquet> <warehouseDir>
  */
object CorpusIngest {

  def main(args: Array[String]): Unit = {
    val Array(dropPath, warehouse) = args.take(2)
    val threshold =
      sys.env.getOrElse("SPARK_GRAFT_DEDUP_THRESHOLD", "0.5").toDouble
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-corpus-ingest")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CHECKPOINT_DIR switches the drop's lineage cuts to
    // durable checkpoints AND cleans the scratch on exit — a scheduled
    // cadence must not accumulate one rdd-* set per drop forever
    // (Checkpoints.withCheckpointDir's cleanup contract: run returns
    // scalars, so nothing handed back rides a checkpointed RDD)
    def drop() = run(spark, spark.read.parquet(dropPath), warehouse,
      threshold)
    val (nNew, nPairs) = sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR") match {
      case Some(dir) if dir.trim.nonEmpty =>
        graft.core.Checkpoints.withCheckpointDir(spark, dir,
          cleanup = true)(drop())
      case _ => drop()
    }
    println(s"[corpus-ingest] landed $nNew new docs, $nPairs new pairs")
    spark.stop()
  }

  private def ccLabelsPath(wh: String) = s"$wh/corpus/cc_labels"
  private def docsPath(wh: String) = s"$wh/corpus/documents"
  private def shinglePath(wh: String) = s"$wh/corpus/shingles"
  private def bandPath(wh: String) = s"$wh/corpus/bands"
  private def pairsPath(wh: String) = s"$wh/corpus/pairs"
  private def statsPath(wh: String) = s"$wh/corpus/doc_stats"
  private def stagedPath(wh: String) = s"$wh/corpus/staged_drops"
  private def tombPath(wh: String) = s"$wh/corpus/tombstones"
  private def cappedPath(wh: String) = s"$wh/corpus/capped_buckets"

  /** The signature store reads through its bucketed catalog registration
    * when it has one — that scan is what lets the incremental band/verify
    * joins keep the corpus side exchange-free. Legacy (pre-bucketing)
    * warehouses fall back to the plain parquet read and keep working, just
    * without the elision.
    */
  private def readStore(spark: SparkSession, path: String): DataFrame =
    if (Sinks.isBucketedStore(spark, path)) Sinks.readBucketedPath(spark, path)
    else spark.read.parquet(path)

  /** Keyed idempotent append into a cumulative warehouse table: bucketed
    * on the key for new warehouses (and ones already bucketed), so the
    * per-drop existence anti-join never re-shuffles the table side; legacy
    * plain tables keep their layout and the plain append. EVERY cumulative
    * append in this file dispatches through here — the
    * bucketed-if-ledger-or-fresh-else-legacy rule must not fork per site.
    */
  private def appendKeyedStore(spark: SparkSession, df: DataFrame,
                               path: String, buckets: Int,
                               keys: Seq[String] = Seq("doc_id")): Unit =
    if (Sinks.isBucketedStore(spark, path) || !Sinks.storePresent(spark, path))
      Sinks.bucketedIdempotentAppend(df, path, keys = keys,
        bucketKeys = keys, buckets = buckets)
    else Sinks.idempotentAppend(df, path, keys = keys, partitionCols = Nil)

  /** Land one drop; returns (new docs landed, new verified pairs).
    *
    * `compactTargetFiles` sizes the signature-store maintenance pass: after
    * the appends, `corpus/bands` and `corpus/shingles` are compacted down to
    * that many files once fragmentation exceeds Sinks' shared 4× gate — a
    * thousand-drop corpus otherwise pays a thousand file-opens per store
    * read in every later increment. Defaults to the cluster parallelism.
    * (For the bucketed store the target is its bucket count — one file per
    * bucket is the ideal shape; compactTargetFiles then only sizes the
    * staged-mirror maintenance.)
    *
    * `storeBuckets` fixes the signature store's bucket layout at warehouse
    * creation (Sinks' spec ledger carries it ever after): bands bucket on
    * the band-join key (band, sig), shingles on the verify key (doc_id),
    * so each drop's candidate and verify joins plan NO exchange on the
    * corpus-sized store side — the per-increment cost is increment-sized
    * however large the corpus grows. At warehouse scale pick
    * data / ~256 MB; the default suits test-sized corpora.
    *
    * `maxBucketCandidates` (off by default): per-(band, sig) hot-bucket
    * cap for the incremental probe — buckets holding more store members
    * than the cap are skipped and recorded in `corpus/capped_buckets`
    * (the documented recall trade; see DedupOps.overflowingBuckets). Set
    * it in production: the exchange-free store join opts out of AQE skew
    * splitting, so an uncapped boilerplate flood serializes every later
    * drop on one task.
    *
    * `hotBucketSalt` (with `maxBucketCandidates`): > 0 upgrades the skip
    * to the RECALL-PRESERVING salted split — hot buckets' candidates
    * derive through a salted branch bounded per task instead of being
    * dropped, the pair set equals the uncapped probe's, and nothing
    * lands in `corpus/capped_buckets` (there is no recall trade to
    * audit). Use skip mode for degenerate boilerplate, salt mode when
    * hot buckets are legitimate content.
    */
  def run(spark: SparkSession, drop: DataFrame, warehouse: String,
          threshold: Double = 0.5,
          compactTargetFiles: Option[Int] = None,
          storeBuckets: Int = 8,
          maxBucketCandidates: Option[Int] = None,
          hotBucketSalt: Int = 0): (Long, Long) =
      // every mutating entry point holds the warehouse write lease: a
      // second concurrent drop would pass the trim against a store missing
      // this drop's increment and silently lose cross-drop pairs — the
      // lease turns that silent gap into a fail-fast (WarehouseLease doc)
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    // park-aware presence (storePresent, not raw pathExists): a crash-
    // parked shingle store read as ABSENT would silently take the
    // first-drop branch — no trim, batch pair derivation — and every
    // new-old pair against the existing corpus would be lost forever.
    // Under the lease just taken, storePresent heals the park in-line.
    val storeExists = Sinks.storePresent(spark, shinglePath(warehouse))
    // refuse to mix dedup thresholds in one pair table BEFORE any work: a
    // pair row carries no threshold, so appends under a different cut-off
    // would silently corrupt the cumulative table's semantics (the same
    // refuse-at-the-write philosophy as idempotentAppend's schema guard)
    checkThreshold(spark, warehouse, threshold)
    // scope the dedup operators' internal persists (shingle/band frames) to
    // this drop: every consuming action happens inside run, so a
    // long-running ingest service doesn't accumulate one MEMORY_AND_DISK
    // frame set per drop (the release discipline GraftCaches.withScope
    // exists for — callers' own caches are untouched)
    graft.core.GraftCaches.withScope(spark) {
      // exact duplicate rows WITHIN one drop (an at-least-once crawl
      // re-emits a doc) would each pass the store trim and land twice —
      // collapse them; conflicting texts under one doc_id remain a caller
      // bug (the doc model is id-immutable). The dedup runs AFTER the trim:
      // dropDuplicates shuffles its input, and pre-trim that input is the
      // caller's frame at full size (promoteAndIngest passes the CUMULATIVE
      // staged table) — post-trim it is increment-sized, and the trim
      // anti-join itself stays a co-located zero/one-exchange join when
      // drop and store share the doc_id bucket layout.
      val newDocs =
        (if (!storeExists) drop
         else drop.join(
           readStore(spark, shinglePath(warehouse)).select("doc_id"),
           Seq("doc_id"), "left_anti"))
          .dropDuplicates()
      // the increment feeds signature computation AND the landing write,
      // and its defining anti-join READS the same store the signature
      // append WRITES — Spark's CacheManager recaches path-reading plans on
      // write (a persist would silently recompute the increment as EMPTY
      // after the store append), so cut lineage entirely with an eager
      // checkpoint (reliable when spark.graft.checkpointDir is configured
      // — an executor loss mid-drop then re-reads the increment instead of
      // failing the ingest): the increment is drop-bounded
      val inc = graft.core.Checkpoints.cut(newDocs)
      val nNew = inc.count()
      if (nNew == 0) (0L, 0L)
      else landIncrement(spark, inc, nNew, warehouse, threshold,
        compactTargetFiles, storeBuckets, storeExists, maxBucketCandidates,
        hotBucketSalt)
    }
  }

  /** The post-trim half of `run`: derive the increment's pairs, append
    * every cumulative table, compact the signature store when fragmented.
    */
  private def landIncrement(spark: SparkSession, inc: DataFrame, nNew: Long,
                            warehouse: String, threshold: Double,
                            compactTargetFiles: Option[Int],
                            storeBuckets: Int,
                            storeExists: Boolean,
                            maxBucketCandidates: Option[Int],
                            hotBucketSalt: Int = 0): (Long, Long) = {
    // geometry fail-closed BEFORE any candidate derives: the incremental
    // probe signs the increment with the library geometry, and a store
    // built under different numHashes/bands would yield garbage candidates
    // (and, worse, corrupting appends) — the band store's params ledger
    // refuses the whole drop up front. Stamp-first on the first drop, same
    // crash ordering as the threshold ledger.
    Sinks.checkAndStampParams(spark, bandPath(warehouse),
      graft.operators.DedupOps.minhashParams(64, 16))
    // HOT-BUCKET cap: the exchange-free store join opts out of AQE skew
    // splitting, so a boilerplate flood concentrated in one (band, sig)
    // bucket would concentrate every later drop on one task. When capped,
    // overflowing buckets are excluded from the probe and RECORDED in
    // corpus/capped_buckets — the recall contract (pairs witnessed only by
    // a hot bucket are not derived) is auditable, never silent. The
    // overflow scan is a co-located two-int-column aggregate per drop.
    val hot = maxBucketCandidates.flatMap { cap =>
      if (!storeExists) None
      else Some(graft.core.GraftCaches.acquire(DedupOps.overflowingBuckets(
        readStore(spark, bandPath(warehouse)), cap)))
    }
    // the capped ledger records a RECALL trade — salt mode has none (hot
    // buckets still derive their pairs, just through the salted branch)
    if (hotBucketSalt <= 0)
      hot.filter(h => !h.isEmpty).foreach(h =>
        Sinks.idempotentAppend(h, cappedPath(warehouse),
          keys = Seq("band", "sig"), partitionCols = Nil))
    // persisted: the pair frame feeds the count, the keyed append, and
    // the label-store merge (scope-released with the drop)
    val pairs = graft.core.GraftCaches.acquire(
      if (!storeExists) DedupOps.minhashLsh(inc, threshold)
      else DedupOps.minhashLshIncremental(
        readStore(spark, bandPath(warehouse)),
        readStore(spark, shinglePath(warehouse)),
        inc, threshold, excludeBuckets = hot,
        saltHotBuckets = hotBucketSalt))
    val nPairs = pairs.count()
    // stamp BEFORE the pairs land: a crash between an unstamped append and
    // the stamp would let a later run at a different threshold slip past
    // checkThreshold and mix semantics — the stamp-first order fails closed
    // (worst case: a stamped threshold guarding a not-yet-written table)
    stampThreshold(spark, warehouse, threshold)
    // the cumulative pair table is keyed-append too (bounded by the
    // duplicated subset, not the corpus, but that is still warehouse-sized
    // at crawl scale) — same bucket treatment, keyed (doc_a, doc_b)
    appendKeyedStore(spark, pairs, pairsPath(warehouse), storeBuckets,
      keys = Seq("doc_a", "doc_b"))
    // fold the drop's pairs into the survivors label store — work bounded
    // by touched components, so the survivors view never re-runs the
    // full-graph contraction (see the label-store section below)
    if (nPairs > 0)
      updateLabels(spark, ccLabelsPath(warehouse), pairsPath(warehouse),
        pairs, "doc_a", "doc_b", storeBuckets)
    // documents and doc_stats are cumulative doc_id-keyed tables too, and
    // their idempotent appends anti-join the FULL table per drop — the
    // same per-increment store shuffle the band join had. Bucketed on
    // doc_id, the table side of each append's anti-join plans no exchange.
    appendKeyedStore(spark, inc, docsPath(warehouse), storeBuckets)
    appendKeyedStore(spark, docStats(inc), statsPath(warehouse), storeBuckets)
    // the signature store goes LAST, and within it the shingle table last
    // of all: the shingle table is the ingest trim's existence key, so its
    // append is the drop's COMMIT POINT. A crash anywhere earlier leaves
    // the doc's shingle row absent — the retry re-admits the doc through
    // the trim and every keyed append above no-ops the rows that already
    // landed. Writing the trim key any earlier would strand a
    // half-ingested doc forever (trim skips it; its remaining rows never
    // arrive). New warehouses get the bucketed store; a legacy plain
    // store (exists, no spec ledger) keeps its layout — appending
    // bucketed files into a plain directory would be silently
    // meaningless. The gate inspects BOTH store tables, not a sibling
    // proxy: a crash between the signature append's two table writes must
    // re-enter the same branch on retry (an absent table counts as
    // bucketed-ready; only a present PLAIN table forces the legacy path)
    def plainStore(p: String) =
      Sinks.storePresent(spark, p) && !Sinks.isBucketedStore(spark, p)
    if (plainStore(bandPath(warehouse)) || plainStore(shinglePath(warehouse)))
      DedupOps.appendSignatureStore(inc, bandPath(warehouse),
        shinglePath(warehouse))
    else
      DedupOps.appendSignatureStoreBucketed(inc, bandPath(warehouse),
        shinglePath(warehouse), buckets = storeBuckets)
    // maintenance: every drop appends one file set to the signature store,
    // and the NEXT increment re-reads the whole store — the same
    // fragmentation rhythm Backfill.run gates on for silver. Atomic swap,
    // scan-identical data, so pairs already derived are unaffected. The
    // bucketed store compacts through the bucketed writer (its target is
    // the bucket count); the legacy store through the plain one.
    val target = compactTargetFiles.getOrElse(
      spark.sparkContext.defaultParallelism)
    Seq(bandPath(warehouse), shinglePath(warehouse)).foreach { p =>
      if (Sinks.isBucketedStore(spark, p)) Sinks.compactBucketedIfFragmented(spark, p)
      else Sinks.compactIfFragmented(spark, p, target)
    }
    (nNew, nPairs)
  }

  // ---------------- incremental component label stores ----------------
  //
  // `survivors` (and its emb/sem/media twins) used to re-run connected
  // components over the FULL cumulative pair table on every read — an
  // iterative multi-shuffle job whose cost grows with the pair graph
  // forever. Each ingest now folds its drop's new pairs into a persisted
  // VERSIONED label table instead (Components.mergeLabels: work bounded
  // by the touched components + increment, never the cumulative graph),
  // and the survivor views read the label store's current view — one
  // co-located argmax scan. The store is append-only (node, component,
  // seq) bucketed on node: per-drop writes are touched-rows-sized, the
  // current view is a zero-exchange groupBy on the bucket key, and
  // maintenance folds old versions away with an atomic bucket-preserving
  // rewrite once they dominate. Governance deletes can SPLIT components
  // (pair rows removed), which incremental merge cannot express — the
  // cascades drop the affected label store and EAGERLY rebuild it from
  // the purged pair table (rebuildLabels), so the one full contraction a
  // split costs is paid once inside the rare takedown call, never per
  // survivors read. Crash-retry safe: the merge is deterministic from
  // (current view, re-derived identical pairs), so a replay appends
  // identical values under a fresh seq — the argmax view is unchanged.
  // Store presence is judged by the SPEC LEDGER, not the directory:
  // bucketedIdempotentAppend stamps the ledger only after the initial
  // write commits, so a torn create (crash mid-first-write) reads as
  // "no store" — the views fall back to the recompute instead of
  // silently serving a partial labeling, and the next writer clears the
  // residue directory and recreates.

  /** Current view of a versioned label store: latest component per node. */
  private def labelView(store: DataFrame): DataFrame =
    store.groupBy(col("node"))
      .agg(max_by(col("component"), col("seq")).as("component"))

  /** Fold one drop's verified pairs into the label store at `labelPath`
    * (creating it from the FULL pair table the first time, so
    * pre-label-store history is covered).
    */
  private def updateLabels(spark: SparkSession, labelPath: String,
                           pairsP: String, newPairs: DataFrame,
                           aCol: String, bCol: String,
                           buckets: Int): Unit = {
    val exists = Sinks.isBucketedStore(spark, labelPath)
    // a label directory WITHOUT its spec ledger is torn-create residue
    // (the ledger is stamped after the initial write commits) — clear it
    // so the recreate below can land; label stores are always bucketed,
    // so there is no legacy-plain layout this could misread
    if (!exists && Sinks.pathExists(spark, labelPath))
      dropStore(spark, labelPath)
    val changed =
      if (!exists)
        Components.connectedComponents(
          readStore(spark, pairsP).select(col(aCol), col(bCol)))
      else Components.mergeLabels(
        labelView(readStore(spark, labelPath)),
        newPairs.select(col(aCol), col(bCol)))
    val seq =
      if (!exists) 0L
      else {
        // a store can legitimately exist EMPTY (created by a pair-less
        // rebuild); max over zero rows is null, and the next version is 0
        val r = readStore(spark, labelPath).agg(max(col("seq"))).head()
        (if (r.isNullAt(0)) -1L else r.getLong(0)) + 1L
      }
    Sinks.bucketedIdempotentAppend(changed.withColumn("seq", lit(seq)),
      labelPath, keys = Seq("node", "seq"), bucketKeys = Seq("node"),
      buckets = buckets)
    // maintenance: fold accumulated versions into the current view once
    // appends have fragmented the store — one atomic swap that is both
    // the compaction and the version GC
    if (Sinks.dataFileCount(spark, labelPath) > 4L * buckets)
      Sinks.rewriteBucketed(spark, labelPath,
        labelView(readStore(spark, labelPath)).withColumn("seq", lit(0L)))
  }

  /** Eagerly rebuild a component label store from its (just-purged) pair
    * table after a governance delete. Removing pair rows can SPLIT
    * components — a state the incremental merge cannot express — so the
    * cascades previously dropped the store and every survivors read until
    * the next pair-bearing drop re-ran the full-graph contraction, per
    * READ. The cascade now pays that contraction exactly once, inside the
    * rare takedown call, and reads stay label-scan priced throughout.
    * Crash-safe by ordering: the store is dropped FIRST, so a crash
    * anywhere before the rebuild's spec ledger lands leaves "no store"
    * and the views fall back to the (always-correct) recompute — never a
    * stale pre-delete labeling; the lease-held delete's retry heals. The
    * rebuilt store inherits the pair table's bucket count so the argmax
    * view keeps the layout the ingest chose; a warehouse with no pair
    * table keeps no store (nothing to label).
    */
  private def rebuildLabels(spark: SparkSession, labelPath: String,
                            pairsP: String, aCol: String,
                            bCol: String): Unit = {
    dropStore(spark, labelPath)
    if (Sinks.storePresent(spark, pairsP)) {
      val buckets = Sinks.bucketSpecOf(spark, pairsP).map(_._2).getOrElse(8)
      val labels = Components.connectedComponents(
        readStore(spark, pairsP).select(col(aCol), col(bCol)))
      Sinks.bucketedIdempotentAppend(labels.withColumn("seq", lit(0L)),
        labelPath, keys = Seq("node", "seq"), bucketKeys = Seq("node"),
        buckets = buckets)
    }
  }

  /** Label-store / pair-table DRIFT: (pair ids the label merge never
    * covered, label nodes with no pair evidence). One definition shared
    * by `fsck` (which reports the counts) and `repair` (which rebuilds on
    * any drift) — so the audit and the heal can never diverge.
    */
  private def labelDrift(spark: SparkSession, labelP: String,
                         pairsP: String, a: String,
                         b: String): (Long, Long) = {
    // callers guarantee BOTH tables are present (fsck/repair gate on it):
    // comparing against an absent pair table would read "every node
    // orphaned" — never a useful drift signal
    val nodes = readStore(spark, labelP).select(col("node").as("k")).distinct()
    val ids = readStore(spark, pairsP).select(col(a).as("k"))
      .unionByName(readStore(spark, pairsP).select(col(b).as("k")))
      .distinct()
    (ids.join(nodes, Seq("k"), "left_anti").count(),
      nodes.join(ids, Seq("k"), "left_anti").count())
  }

  /** Loser ids (component non-minima) for a pair table: from the label
    * store's current view when one is maintained — a co-located scan —
    * or the full-graph recompute otherwise (legacy warehouses, and any
    * crash window where a store create was torn before its ledger). The
    * ledger gate means a torn create can never serve a partial labeling.
    */
  private def losersFor(spark: SparkSession, labelPath: String,
                        pairsP: String, aCol: String, bCol: String,
                        outCol: String): DataFrame = {
    val lab =
      if (Sinks.isBucketedStore(spark, labelPath))
        labelView(readStore(spark, labelPath))
      else Components.connectedComponents(
        readStore(spark, pairsP).select(col(aCol), col(bCol)))
    lab.filter(col("node") =!= col("component"))
      .select(col("node").as(outCol))
  }

  /** GOVERNANCE DELETE cascade — the corpus-warehouse form of
    * Sinks.deleteByKey's "gone from the FILES" contract. Deleting only from
    * `corpus/documents` is not a takedown: the doc's shingle set and MinHash
    * bands still sit in the signature store (recoverable content
    * fingerprints, and they make the ingest trim anti-join silently swallow
    * a legitimate re-submission of the same doc_id), and its pair rows keep
    * pulling it into dedup clusters. One call rewrites every warehouse
    * table without the keyed rows: documents / shingles / bands /
    * doc_stats / staged_drops (the stream path's full-text mirror) on
    * doc_id, pairs on doc_a OR doc_b (chained anti-joins in ONE rewrite —
    * Sinks.deleteByAnyKey). After the cascade a BATCH re-ingest of the
    * doc_id lands as new and re-derives its pairs, because the trim reads
    * the same shingle store the cascade purged.
    *
    * The STREAMING landing sits upstream of the warehouse's governance
    * boundary (its `_spark_metadata` manifest pins the file set, so it is
    * never rewritten — retention belongs to the stream's own lifecycle,
    * like the source crawl files). Because a later promotion would
    * otherwise re-stage the deleted doc from that landing and silently
    * undo the takedown, the delete also records the ids in
    * `corpus/tombstones`; `promoteAndIngest` purges tombstoned rows the
    * promote re-staged before anything reaches the dedup path. A
    * legitimate STREAMED re-submission of a deleted doc_id therefore needs
    * its tombstone lifted first — `reinstate` below — once the old landing
    * has aged out; the batch path needs nothing.
    * Returns per-table (rowsBefore, rowsAfter) for the audit trail a
    * governance pass needs.
    */
  def delete(spark: SparkSession, warehouse: String,
             docIds: Seq[Long]): Map[String, (Long, Long)] =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    import spark.implicits._
    val keys = docIds.toDF("doc_id")
    val byDocId = Seq(
      "documents" -> docsPath(warehouse),
      "shingles" -> shinglePath(warehouse),
      "bands" -> bandPath(warehouse),
      "doc_stats" -> statsPath(warehouse),
      "staged_drops" -> stagedPath(warehouse))
    val purged = byDocId.flatMap { case (name, p) =>
      // park-aware (storePresent): a parked table read as absent would
      // silently SKIP its purge — a takedown that leaves fingerprints
      if (!Sinks.storePresent(spark, p)) None
      // the signature store must be rewritten through the bucketed writer —
      // a plain swap would strip the bucket-id file naming the catalog
      // still promises, and later band joins would read a wrong layout
      else if (Sinks.isBucketedStore(spark, p))
        Some(name -> Sinks.deleteBucketedByKey(spark, p, keys, Seq("doc_id")))
      else Some(name -> Sinks.deleteByKey(spark, p, keys, Seq("doc_id")))
    }.toMap
    // removed pair rows can SPLIT components — incremental merge cannot
    // express a split, so the label store is dropped here (every crash
    // window below then falls back to the recompute, never a stale
    // labeling) and rebuilt EAGERLY from the purged pair table at the end
    dropStore(spark, ccLabelsPath(warehouse))
    // tombstone UNCONDITIONALLY: gating this on the staged table existing
    // left a hole — a takedown issued while a streaming landing was active
    // but before its first promotion recorded nothing, and that first
    // promotion then re-staged and re-ingested the deleted doc. The batch
    // path never consults tombstones, so pure-batch re-submission
    // semantics are unchanged; the only cost of a spurious tombstone is a
    // row in a thin table.
    val tomb = tombstoneWithCounts(spark, tombPath(warehouse), keys,
      Seq("doc_id"))
    val all =
      if (!Sinks.storePresent(spark, pairsPath(warehouse))) purged
      else if (Sinks.isBucketedStore(spark, pairsPath(warehouse)))
        purged + ("pairs" -> Sinks.deleteBucketedByAnyKey(spark,
          pairsPath(warehouse), keys, "doc_id", Seq("doc_a", "doc_b")))
      else purged + ("pairs" -> Sinks.deleteByAnyKey(spark,
        pairsPath(warehouse), keys, "doc_id", Seq("doc_a", "doc_b")))
    rebuildLabels(spark, ccLabelsPath(warehouse), pairsPath(warehouse),
      "doc_a", "doc_b")
    appendAudit(spark, warehouse, "delete", "doc_id", docIds.size.toLong,
      all + ("tombstones" -> tomb))
    all
  }

  /** TOMBSTONE LIFT — the reversal half of the governance contract: a
    * takedown that turns out to be wrong (counter-notice, mistaken id) is
    * reversed by clearing the doc's tombstone rows, after which the SAME
    * doc_id re-lands through either path: batch `run` never consulted
    * tombstones, and the next streamed arrival survives
    * `promoteAndIngest`'s purge because the tombstone is gone. Without
    * this API a reversal required hand surgery on warehouse internals
    * (deleting rows out of `corpus/tombstones` directly). Lifting an id
    * that was never deleted — or lifting before any tombstone table exists
    * — is a no-op, so governance tooling can issue reinstates
    * unconditionally. Returns the number of tombstones actually lifted.
    *
    * NOTE the deliberate asymmetry with `delete`: reinstate touches ONLY
    * the tombstone table. It does not resurrect content — the doc's rows
    * are already purged from every table, and its content re-enters only
    * by being re-submitted (the doc must still be in the upstream landing
    * or a future drop). "Undo the block", not "undelete the data".
    */
  def reinstate(spark: SparkSession, warehouse: String,
                docIds: Seq[Long]): Long =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    if (!Sinks.storePresent(spark, tombPath(warehouse))) 0L
    else {
      import spark.implicits._
      val (before, after) = Sinks.deleteByKey(spark, tombPath(warehouse),
        docIds.toDF("doc_id"), Seq("doc_id"))
      appendAudit(spark, warehouse, "reinstate", "doc_id",
        docIds.size.toLong, Map("tombstones" -> (before, after)))
      before - after
    }
  }

  private def embVecsPath(wh: String) = s"$wh/corpus/emb_vecs"
  private def embBandsPath(wh: String) = s"$wh/corpus/emb_bands"
  private def embPairsPath(wh: String) = s"$wh/corpus/emb_pairs"
  private def embCappedPath(wh: String) = s"$wh/corpus/emb_capped_buckets"
  private def stagedEmbPath(wh: String) = s"$wh/corpus/staged_emb_drops"
  private def embTombPath(wh: String) = s"$wh/corpus/emb_tombstones"
  private def embCcPath(wh: String) = s"$wh/corpus/emb_cc_labels"
  private def semCcPath(wh: String) = s"$wh/corpus/sem_cc_labels"
  private def semAsgPath(wh: String) = s"$wh/corpus/sem_asg"
  private def semPairsPath(wh: String) = s"$wh/corpus/sem_pairs"
  private def semCentsPath(wh: String) = s"$wh/corpus/sem_cents"

  /** Land one EMBEDDING drop — the semantic-modality twin of `run`: trim
    * the drop against the vector store (replayed drops are no-ops), derive
    * near-dup pairs for the increment only, append the cumulative pair
    * table and the sign-LSH signature store, compact when fragmented.
    * Returns (new vectors landed, new verified pairs).
    *
    * The drop frame is (vec_id, embedding: array<float>) — id-immutable
    * like the document model (two drops disagreeing on a vec_id's vector is
    * a caller bug; exact duplicate rows within one drop collapse). The
    * embedding tables are a SEPARATE id space and threshold regime from the
    * text corpus: cosine ≥ threshold has no relation to a Jaccard cut, so
    * `corpus/emb_pairs` stamps its own provenance ledger and a mismatched
    * threshold is refused before any work, exactly like `run`.
    *
    * Scale shape per drop, mirroring the text path's contract: signatures
    * are computed fresh only for the increment
    * (SimilarityOps.cosinePairsLshIncremental); the store sides of the
    * candidate and verify joins are bucketed on (band, code) / vec_id and
    * plan no exchange; old vectors are never re-projected. The embedding
    * store is always bucketed — the table family is new, so there is no
    * legacy-plain-layout fallback to honor.
    *
    * `trainedCentroids` opts the drop into SEMDEDUP maintenance: the
    * increment is assigned once against the supplied FROZEN centroids
    * (kmeansCentroids output, retrained on the warehouse's own cadence),
    * within-cluster pairs at `semThreshold` are derived against the
    * persisted `corpus/sem_asg` assignment store, and both the pair table
    * (`corpus/sem_pairs`, its own threshold ledger) and the assignment
    * store are appended — so cluster-level curation state stays current
    * per drop without ever re-assigning old vectors. After a retrain,
    * rebuild `corpus/sem_asg`/`corpus/sem_pairs` from scratch and resume
    * drops with the new centroids.
    */
  def ingestEmbeddings(spark: SparkSession, drop: DataFrame, warehouse: String,
                       threshold: Double = 0.42,
                       storeBuckets: Int = 8,
                       trainedCentroids: Option[DataFrame] = None,
                       semThreshold: Double = 0.9,
                       maxBucketCandidates: Option[Int] = None,
                       hotBucketSalt: Int = 0): (Long, Long) =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    // park-aware like run(): a parked vec store must not flip this drop
    // into the first-drop branch (all new-old pairs lost)
    val storeExists = Sinks.storePresent(spark, embVecsPath(warehouse))
    checkThresholdAt(spark, embPairsPath(warehouse), "corpus/emb_pairs",
      threshold)
    // SemDeDup COVERAGE is refused-before-work like every other contract
    // here: a partial assignment store silently misses semantic pairs
    // forever, so the two ways to create one are both errors. (1) Enabling
    // sem maintenance on a warehouse that already holds vectors the store
    // never assigned — run retrainSemStore first to cover them. (2) A
    // sem-maintained warehouse receiving a drop WITHOUT centroids — that
    // drop's vectors would never enter sem_asg.
    val semAsgExists = Sinks.storePresent(spark, semAsgPath(warehouse))
    if (trainedCentroids.isDefined) {
      require(semAsgExists || !storeExists,
        s"ingestEmbeddings: ${semAsgPath(warehouse)} is missing but the " +
          "vector store already has vectors the assignment store would " +
          "never cover — run retrainSemStore(warehouse) to build sem_asg " +
          "over the existing corpus before sem-maintained drops")
      checkThresholdAt(spark, semPairsPath(warehouse), "corpus/sem_pairs",
        semThreshold)
      // frozen-centroid identity fail-closed BEFORE any work: a drop
      // assigned under different centroids than sem_asg was built with
      // fragments clusters silently — pin the centroid fingerprint the
      // way the band stores pin their hash geometry
      Sinks.checkAndStampParams(spark, semAsgPath(warehouse),
        Seq("cents_fp" -> graft.operators.SimilarityOps
          .centroidFingerprint(trainedCentroids.get).toString))
    } else require(!semAsgExists,
      s"ingestEmbeddings: ${semAsgPath(warehouse)} exists — this warehouse " +
        "is sem-maintained, and a drop ingested without trainedCentroids " +
        "would leave its vectors out of the assignment store forever " +
        "(pass the centroids, or drop the sem store to stop maintaining it)")
    // drop-scoped operator persists, same release discipline as run()
    graft.core.GraftCaches.withScope(spark) {
      val newVecs =
        (if (!storeExists) drop
         else drop.join(
           readStore(spark, embVecsPath(warehouse)).select("vec_id"),
           Seq("vec_id"), "left_anti"))
          .dropDuplicates("vec_id")
      // same lineage cut as run(): the increment feeds pair derivation AND
      // the store append, and its defining anti-join reads the store the
      // append writes — the eager cut keeps the increment drop-bounded
      // (reliable under spark.graft.checkpointDir, executor-local otherwise)
      val inc = graft.core.Checkpoints.cut(newVecs)
      val nNew = inc.count()
      if (nNew == 0) (0L, 0L)
      else {
        // geometry fail-closed before any candidate derives (the text
        // path's argument, over the sign-LSH plane matrix)
        Sinks.checkAndStampParams(spark, embBandsPath(warehouse),
          graft.operators.SimilarityOps.embLshParams(6, 48, 64))
        // hot-bucket cap + ledger, the text path's device on (band, code)
        val hot = maxBucketCandidates.flatMap { cap =>
          if (!storeExists) None
          else Some(graft.core.GraftCaches.acquire(
            graft.operators.SimilarityOps.overflowingCodeBuckets(
              readStore(spark, embBandsPath(warehouse)), cap)))
        }
        // salt mode derives the hot buckets' pairs (no recall trade) — the
        // capped ledger records only genuine skips
        if (hotBucketSalt <= 0)
          hot.filter(h => !h.isEmpty).foreach(h =>
            Sinks.idempotentAppend(h, embCappedPath(warehouse),
              keys = Seq("band", "code"), partitionCols = Nil))
        val pairs = graft.core.GraftCaches.acquire(
          if (!storeExists)
            graft.operators.SimilarityOps.cosinePairsLsh(inc, threshold)
          else graft.operators.SimilarityOps.cosinePairsLshIncremental(
            readStore(spark, embBandsPath(warehouse)),
            readStore(spark, embVecsPath(warehouse)),
            inc, threshold, excludeBuckets = hot,
            saltHotBuckets = hotBucketSalt))
        val nPairs = pairs.count()
        // stamp-first, same crash ordering argument as run()
        stampThresholdAt(spark, embPairsPath(warehouse), threshold)
        appendKeyedStore(spark, pairs, embPairsPath(warehouse), storeBuckets,
          keys = Seq("vec_a", "vec_b"))
        if (nPairs > 0)
          updateLabels(spark, embCcPath(warehouse), embPairsPath(warehouse),
            pairs, "vec_a", "vec_b", storeBuckets)
        // SemDeDup maintenance rides the same drop when the caller supplies
        // FROZEN trained centroids (the retrain-cadence contract — see
        // SimilarityOps.semAssignTable): assign the increment once, derive
        // within-cluster pairs against the persisted assignment store,
        // append pairs + assignments. All of it lands BEFORE the vec-store
        // commit point below, so a crash anywhere here re-admits the vecs
        // on retry and these keyed appends no-op what already landed.
        trainedCentroids.foreach { cents =>
          val storedAsg =
            if (Sinks.storePresent(spark, semAsgPath(warehouse)))
              readStore(spark, semAsgPath(warehouse))
            // first drop: an empty store with the right schema — the
            // incremental path then derives new-new pairs only
            else graft.operators.SimilarityOps.semAssignTable(
              inc.limit(0), cents)
          // ONE broadcast-assign pass per drop: the persisted frame feeds
          // the pair derivation (both join branches) AND the store append
          val freshAsg = graft.core.GraftCaches.acquire(
            graft.operators.SimilarityOps.semAssignTable(inc, cents)
              .repartition(col("vec_id")))
          // the commit guard (vec-store semi-join on the verified pairs)
          // keeps orphan sem_asg rows from a crashed-and-abandoned drop
          // out of the pair table — see semPairsIncrementalFromAssign
          // with no commit table yet (first drop, including its
          // crash-retry where sem_asg landed but emb_vecs did not) the
          // legitimate commit set is EMPTY: any stored assignment row is
          // either an orphan or re-admitted in this very increment (whose
          // pairs re-derive as new-new)
          val semPairs = graft.core.GraftCaches.acquire(
            graft.operators.SimilarityOps
              .semPairsIncrementalFromAssign(storedAsg, freshAsg, semThreshold,
                commitIds = Some(
                  if (storeExists)
                    readStore(spark, embVecsPath(warehouse)).select("vec_id")
                  else inc.select("vec_id").limit(0))))
          stampThresholdAt(spark, semPairsPath(warehouse), semThreshold)
          appendKeyedStore(spark, semPairs, semPairsPath(warehouse),
            storeBuckets, keys = Seq("vec_a", "vec_b"))
          if (!semPairs.isEmpty)
            updateLabels(spark, semCcPath(warehouse), semPairsPath(warehouse),
              semPairs, "vec_a", "vec_b", storeBuckets)
          Sinks.bucketedIdempotentAppend(freshAsg, semAsgPath(warehouse),
            keys = Seq("cid", "vec_id"), bucketKeys = Seq("cid"),
            buckets = storeBuckets)
        }
        graft.operators.SimilarityOps.appendEmbSignatureStoreBucketed(inc,
          embBandsPath(warehouse), embVecsPath(warehouse),
          buckets = storeBuckets)
        (Seq(embBandsPath(warehouse), embVecsPath(warehouse)) ++
          (if (trainedCentroids.isDefined) Seq(semAsgPath(warehouse))
           else Nil)).foreach(p =>
          Sinks.compactBucketedIfFragmented(spark, p))
        (nNew, nPairs)
      }
    }
  }

  /** GOVERNANCE DELETE for the embedding modality — `delete`'s cascade over
    * the embedding tables, kept as a SEPARATE entry point because vec_id
    * and doc_id are independent id spaces (a warehouse that keys both from
    * one id calls both; `forget` resolves a shared content key across all
    * three). Purges emb_vecs / emb_bands / sem_asg / staged_emb_drops on
    * vec_id (the vector itself, its recoverable sign fingerprint, its
    * cluster assignment, and the stream path's staged mirror) and
    * emb_pairs / sem_pairs on vec_a OR vec_b, each through the bucketed
    * writer so the store layout survives. Tombstones the ids
    * unconditionally (same argument as the text cascade: a streaming
    * landing is never rewritten, so a later promotion would re-stage the
    * deleted vectors without the tombstone); `reinstateEmbeddings` lifts.
    * Returns per-table (rowsBefore, rowsAfter).
    */
  def deleteEmbeddings(spark: SparkSession, warehouse: String,
                       vecIds: Seq[Long]): Map[String, (Long, Long)] =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    import spark.implicits._
    val keys = vecIds.toDF("vec_id")
    val byVecId = Seq(
      "emb_vecs" -> embVecsPath(warehouse),
      "emb_bands" -> embBandsPath(warehouse),
      "sem_asg" -> semAsgPath(warehouse),
      "staged_emb_drops" -> stagedEmbPath(warehouse))
    val purged = byVecId.flatMap { case (name, p) =>
      if (!Sinks.storePresent(spark, p)) None
      else if (Sinks.isBucketedStore(spark, p))
        Some(name -> Sinks.deleteBucketedByKey(spark, p, keys, Seq("vec_id")))
      else Some(name -> Sinks.deleteByKey(spark, p, keys, Seq("vec_id")))
    }.toMap
    val tomb = tombstoneWithCounts(spark, embTombPath(warehouse), keys,
      Seq("vec_id"))
    // pair-row removal can split components — drop the label stores, then
    // rebuild them eagerly from the purged pair tables (see the text
    // cascade's crash-ordering note)
    dropStore(spark, embCcPath(warehouse))
    dropStore(spark, semCcPath(warehouse))
    val pairTables = Seq(
      "emb_pairs" -> embPairsPath(warehouse),
      "sem_pairs" -> semPairsPath(warehouse))
    val all = purged ++ pairTables.flatMap { case (name, p) =>
      if (!Sinks.storePresent(spark, p)) None
      else if (Sinks.isBucketedStore(spark, p))
        Some(name -> Sinks.deleteBucketedByAnyKey(spark, p, keys, "vec_id",
          Seq("vec_a", "vec_b")))
      else Some(name -> Sinks.deleteByAnyKey(spark, p, keys, "vec_id",
        Seq("vec_a", "vec_b")))
    }
    rebuildLabels(spark, embCcPath(warehouse), embPairsPath(warehouse),
      "vec_a", "vec_b")
    rebuildLabels(spark, semCcPath(warehouse), semPairsPath(warehouse),
      "vec_a", "vec_b")
    appendAudit(spark, warehouse, "delete_embeddings", "vec_id",
      vecIds.size.toLong, all + ("emb_tombstones" -> tomb))
    all
  }

  /** `reinstate` for the embedding modality (see `reinstate`'s asymmetry
    * note: lifts the block, never resurrects data). */
  def reinstateEmbeddings(spark: SparkSession, warehouse: String,
                          vecIds: Seq[Long]): Long =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    if (!Sinks.storePresent(spark, embTombPath(warehouse))) 0L
    else {
      import spark.implicits._
      val (before, after) = Sinks.deleteByKey(spark, embTombPath(warehouse),
        vecIds.toDF("vec_id"), Seq("vec_id"))
      appendAudit(spark, warehouse, "reinstate_embeddings", "vec_id",
        vecIds.size.toLong, Map("emb_tombstones" -> (before, after)))
      before - after
    }
  }

  /** A pair table's threshold provenance ledger: a sibling file (so
    * compaction's directory swap preserves it, same placement as
    * Sinks.promote's ledger) recording the dedup threshold the table was
    * built under. One ledger per pair table — the text pairs and the
    * embedding pairs carry independent semantics (Jaccard vs cosine), so
    * each table stamps its own.
    */
  private def thresholdLedgerAt(pairsP: String) =
    new org.apache.hadoop.fs.Path(pairsP + "._threshold")

  private def checkThresholdAt(spark: SparkSession, pairsP: String,
                               label: String, threshold: Double): Unit = {
    val p = thresholdLedgerAt(pairsP)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val line = try new java.io.BufferedReader(
        new java.io.InputStreamReader(in)).readLine()
      finally in.close()
      require(line != null && line.trim.nonEmpty,
        s"$label threshold ledger $p exists but is empty/corrupt — " +
          "delete it to restamp on the next run")
      val stamped = line.trim.toDouble
      require(stamped == threshold,
        s"$label was built at dedup threshold $stamped; refusing to " +
          s"append pairs derived at $threshold — mixed-threshold pair " +
          "tables have no single semantics (rebuild the warehouse or match " +
          "the stamped threshold)")
    }
  }

  private def stampThresholdAt(spark: SparkSession, pairsP: String,
                               threshold: Double): Unit = {
    val p = thresholdLedgerAt(pairsP)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val out = fs.create(p, true)
      try out.write(threshold.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  private def checkThreshold(spark: SparkSession, wh: String,
                             threshold: Double): Unit =
    checkThresholdAt(spark, pairsPath(wh), "corpus/pairs", threshold)

  private def stampThreshold(spark: SparkSession, wh: String,
                             threshold: Double): Unit =
    stampThresholdAt(spark, pairsPath(wh), threshold)

  /** Per-document stat partials for the increment — thin rows (ids +
    * counts, never text), same per-doc derivation as TextOps.datacard so
    * the warehouse rollup is EXACTLY the full-scan datacard. Drops
    * without lang/source metadata land NULL strata (the datacard's own
    * rollup grain for unknowns). Zero-token docs are absent on both
    * paths (qualityProjection's filter).
    */
  private[graft] def docStats(docs: DataFrame): DataFrame = {
    val withMeta = Seq("lang", "source").foldLeft(docs) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("string"))
    }
    graft.operators.TextOps.qualityProjection(withMeta)
      .select(col("doc_id"), col("n_tok"), col("quality_score"))
      .join(withMeta.select(col("doc_id"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars")), "doc_id")
      .withColumn("q6", floor(col("quality_score") * 1e6).cast("long"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
        col("n_chars"), col("q6"))
  }

  /** INCREMENTALLY-MAINTAINED datacard: the same rollup as
    * `TextOps.datacard` read from the per-doc stats table instead of the
    * text — corpus-release reporting that never rescans old documents.
    * The stats table is ~40 bytes/doc (0.1% of a text corpus): at 100 TB
    * the report aggregates a ~100 GB thin table, and each drop only ever
    * paid one stats projection at ingest. Idempotent by construction —
    * the doc_id-keyed append makes a replayed drop a stats no-op too.
    */
  def datacard(spark: SparkSession, warehouse: String): DataFrame =
    readStore(spark, statsPath(warehouse))
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("q6")).cast("double") / count(lit(1)) / 1e6)
          .as("mean_quality"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)

  /** STREAMING drop watcher — the live twin of `run`, mirroring how
    * LiveIngest pairs with Backfill on the market side: a file-source
    * stream over the drop directory feeds each micro-batch through the
    * SAME batch ingest. foreachBatch is at-least-once, and `run` is
    * idempotent end to end (trim + three keyed idempotentAppends), so a
    * replayed micro-batch lands nothing twice — the exactly-once upgrade
    * every sink in this engine uses. Trigger.AvailableNow by default: one
    * catch-up pass over unseen drop files, checkpointed under the
    * warehouse.
    */
  def startStream(spark: SparkSession, dropDir: String, warehouse: String,
                  threshold: Double = 0.5,
                  trigger: org.apache.spark.sql.streaming.Trigger =
                    org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema).parquet(dropDir)
      .writeStream
      .option("checkpointLocation", s"$warehouse/_checkpoints/corpus")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        run(spark, batch, warehouse, threshold); ()
      }
      .start()
  }

  /** STREAMED-LANDING ingest, the promote-based twin of `startStream`:
    * instead of running the batch ingest inside foreachBatch, the stream
    * lands documents in a plain streaming PARQUET SINK (exactly-once via
    * its _spark_metadata manifest, like LiveIngest's silver landing) and a
    * periodic maintenance call promotes the landing into the corpus
    * warehouse. This is the shape for a corpus fed by an always-on
    * firehose: the landing write is append-only and never blocks on dedup
    * work; the promote → ingest step runs on the batch cadence, reads the
    * landing through the manifest (uncommitted task output is invisible),
    * and is idempotent end to end. Returns the running landing query.
    */
  def startLanding(spark: SparkSession, dropDir: String, landingPath: String,
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    startLandingVia(spark, dropDir, landingPath, trigger,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))

  /** `startLanding` for the EMBEDDING modality: the always-on vector
    * firehose lands (vec_id, embedding) in a streaming parquet sink;
    * `promoteAndIngestEmbeddings` runs the dedup/SemDeDup maintenance on
    * the batch cadence. Same exactly-once shape as the text landing.
    */
  def startEmbeddingLanding(spark: SparkSession, dropDir: String,
                            landingPath: String,
                            trigger: org.apache.spark.sql.streaming.Trigger =
                              org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    startLandingVia(spark, dropDir, landingPath, trigger,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))

  /** `startLanding` for the MEDIA modality: (media_id, content) binary
    * payloads land append-only; decode/hash work stays on the
    * `promoteAndIngestMedia` batch cadence, never in the stream's path.
    */
  def startMediaLanding(spark: SparkSession, dropDir: String,
                        landingPath: String,
                        trigger: org.apache.spark.sql.streaming.Trigger =
                          org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    startLandingVia(spark, dropDir, landingPath, trigger,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))

  private def startLandingVia(spark: SparkSession, dropDir: String,
                              landingPath: String,
                              trigger: org.apache.spark.sql.streaming.Trigger,
                              schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(dropDir)
      .writeStream.format("parquet")
      .option("path", landingPath)
      // a SIBLING with a suffix, not "../_checkpoints": two landings under
      // one parent must not share offsets, and a literal ".." segment is
      // not normalized on object-store FileSystems
      .option("checkpointLocation", s"${landingPath}_checkpoint")
      .trigger(trigger)
      .start()

  /** Promote the streamed landing into the warehouse's staged-drop table
    * and ingest whatever is genuinely new — the batch half of the
    * startLanding rhythm. `Sinks.promote`'s manifest ledger short-circuits
    * an unchanged landing without scanning, and `run`'s shingle-store trim
    * guarantees each promoted doc enters the dedup path exactly once, so
    * calling this on any cadence (or replaying it) lands each streamed doc
    * once: the resulting pair table is bit-identical to ingesting the same
    * drops all-batch. Returns (new docs landed, new verified pairs).
    *
    * Crash safety: promote advances its own ledger BEFORE `run` ingests,
    * so this keeps a second sibling ledger (`._ingested_upto`) written only
    * after a successful ingest — a call that died between the two leaves
    * ingested < promoted, and the next call re-runs the ingest (idempotent:
    * the trim anti-join lands nothing twice) instead of short-circuiting
    * the staged docs into limbo. Tombstoned doc_ids that a promotion
    * re-staged out of the landing (see `delete`) are purged from staged
    * before anything reaches the dedup path.
    */
  def promoteAndIngest(spark: SparkSession, landingPath: String,
                       warehouse: String, threshold: Double = 0.5,
                       compactTargetFiles: Option[Int] = None,
                       storeBuckets: Int = 8,
                       maxBucketCandidates: Option[Int] = None,
                       hotBucketSalt: Int = 0): (Long, Long) =
    // lease taken HERE (not only in the nested run) so the promote, the
    // tombstone purge, and the ingest are one exclusive unit; the nested
    // run() re-enters the same JVM lease at depth 2
    graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
      promoteAndIngestVia(spark, landingPath, stagedPath(warehouse),
        tombPath(warehouse), "doc_id", storeBuckets, compactTargetFiles,
        staged => run(spark, staged, warehouse, threshold,
          compactTargetFiles, storeBuckets, maxBucketCandidates,
          hotBucketSalt))
    }

  /** `promoteAndIngest` for the EMBEDDING modality — the batch half of
    * `startEmbeddingLanding`'s rhythm, with the same crash ledgers and
    * tombstone purge; the promoted staged table feeds `ingestEmbeddings`
    * (including SemDeDup maintenance when `trainedCentroids` is given).
    * Calling it on any cadence, or replaying it, lands each streamed
    * vector once: the resulting pair/assignment tables are bit-identical
    * to ingesting the same drops all-batch.
    */
  def promoteAndIngestEmbeddings(spark: SparkSession, landingPath: String,
                                 warehouse: String, threshold: Double = 0.42,
                                 compactTargetFiles: Option[Int] = None,
                                 storeBuckets: Int = 8,
                                 trainedCentroids: Option[DataFrame] = None,
                                 semThreshold: Double = 0.9,
                                 maxBucketCandidates: Option[Int] = None,
                                 hotBucketSalt: Int = 0)
      : (Long, Long) =
    graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
      promoteAndIngestVia(spark, landingPath, stagedEmbPath(warehouse),
        embTombPath(warehouse), "vec_id", storeBuckets, compactTargetFiles,
        staged => ingestEmbeddings(spark, staged, warehouse, threshold,
          storeBuckets, trainedCentroids, semThreshold, maxBucketCandidates,
          hotBucketSalt))
    }

  /** `promoteAndIngest` for the MEDIA modality — the batch half of
    * `startMediaLanding`'s rhythm. Decode/hash work happens here, on the
    * maintenance cadence, never in the stream's write path.
    */
  def promoteAndIngestMedia(spark: SparkSession, landingPath: String,
                            warehouse: String, maxHamming: Int = 3,
                            compactTargetFiles: Option[Int] = None,
                            storeBuckets: Int = 8,
                            maxBucketCandidates: Option[Int] = None,
                            hotBucketSalt: Int = 0)
      : (Long, Long) =
    graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
      promoteAndIngestVia(spark, landingPath, stagedMediaPath(warehouse),
        mediaTombPath(warehouse), "media_id", storeBuckets,
        compactTargetFiles,
        staged => ingestMedia(spark, staged, warehouse, maxHamming,
          storeBuckets, maxBucketCandidates, hotBucketSalt))
    }

  /** The modality-agnostic promote → tombstone-purge → ingest step all
    * three `promoteAndIngest*` entry points share (the landing/promote/
    * ledger machinery in `Sinks.promote` never depended on the modality;
    * this factors the crash ledgers and purge so they cannot drift apart).
    */
  private def promoteAndIngestVia(spark: SparkSession, landingPath: String,
                                  staged: String, tombs: String,
                                  keyCol: String, storeBuckets: Int,
                                  compactTargetFiles: Option[Int],
                                  ingest: DataFrame => (Long, Long))
      : (Long, Long) = {
    // a maintenance cadence can legitimately fire before the landing's
    // stream has committed its first trigger (no _spark_metadata yet) —
    // that is "nothing to promote", not an error; Sinks.promote's require
    // would otherwise crash the cadence
    if (!Sinks.pathExists(spark, s"$landingPath/_spark_metadata"))
      return (0L, 0L)
    // the staged mirror is cumulative and key-keyed like the modality's
    // main table: bucketed, each promotion's existence anti-join AND the
    // ingest trim below are co-located on the bucket layout instead of
    // re-shuffling the mirror; a legacy plain mirror keeps its layout
    val stagedSpec =
      if (Sinks.isBucketedStore(spark, staged) || !Sinks.storePresent(spark, staged))
        Some(Seq(keyCol) -> storeBuckets)
      else None
    Sinks.promote(spark, landingPath, staged, keys = Seq(keyCol),
      bucketSpec = stagedSpec)
    if (!Sinks.storePresent(spark, staged)) return (0L, 0L)
    val promotedUpto = readLongLedger(spark, staged + "._promoted_upto")
    val ingLedger = staged + "._ingested_upto"
    if (promotedUpto <= readLongLedger(spark, ingLedger)) return (0L, 0L)
    // governance: a promotion may have re-staged deleted rows from the
    // landing (which is never rewritten) — purge them before ingest; the
    // delete is existence-probed, so a clean staged table costs one probe
    if (Sinks.storePresent(spark, tombs)) {
      val t = spark.read.parquet(tombs)
      if (Sinks.isBucketedStore(spark, staged))
        Sinks.deleteBucketedByKey(spark, staged, t, Seq(keyCol))
      else Sinks.deleteByKey(spark, staged, t, Seq(keyCol))
    }
    val res = ingest(readStore(spark, staged))
    writeLongLedger(spark, ingLedger, promotedUpto)
    // the staged mirror fragments one file set per promotion like the
    // signature store; same gate, and both sibling ledgers survive the
    // swap (they sit beside the table dir, not inside it)
    if (Sinks.isBucketedStore(spark, staged))
      Sinks.compactBucketedIfFragmented(spark, staged)
    else Sinks.compactIfFragmented(spark, staged,
      compactTargetFiles.getOrElse(spark.sparkContext.defaultParallelism))
    res
  }

  /** Single-long sibling-ledger read (the `Sinks.promote` format); -1 when
    * absent or unreadable (unreadable = re-do the guarded work, never skip).
    */
  private def readLongLedger(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      val line = try new java.io.BufferedReader(
        new java.io.InputStreamReader(in)).readLine()
      finally in.close()
      if (line == null || line.trim.isEmpty) -1L else line.trim.toLong
    }
  }

  private def writeLongLedger(spark: SparkSession, path: String,
                              value: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(value.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The deduplicated EMBEDDING view — `survivors` for the semantic
    * modality: keep-the-minimum canonical per cosine near-dup cluster over
    * the cumulative `corpus/emb_pairs` table. Losers come off the
    * incrementally-maintained label store when present (a co-located
    * scan); the full-graph recompute is the fallback.
    */
  def embSurvivors(spark: SparkSession, warehouse: String): DataFrame =
    survivorsOverPairs(spark, warehouse, embPairsPath(warehouse),
      embCcPath(warehouse))

  /** The SemDeDup-applied view: keep-the-minimum per semantic cluster
    * component over the cumulative `corpus/sem_pairs` table — the corpus a
    * SemDeDup-curated training run actually reads.
    */
  def semSurvivors(spark: SparkSession, warehouse: String): DataFrame =
    survivorsOverPairs(spark, warehouse, semPairsPath(warehouse),
      semCcPath(warehouse))

  private def survivorsOverPairs(spark: SparkSession, warehouse: String,
                                 pairsP: String, labelP: String): DataFrame = {
    val vecs = readStore(spark, embVecsPath(warehouse))
    // lease-free view: storePresent FAILS on a crash-parked pair table
    // instead of silently serving the corpus unfiltered
    if (!Sinks.storePresent(spark, pairsP)) vecs
    else vecs.join(
      losersFor(spark, labelP, pairsP, "vec_a", "vec_b", "vec_id"),
      Seq("vec_id"), "left_anti")
  }

  private def mediaHashPath(wh: String) = s"$wh/corpus/media_hashes"
  private def mediaBandsPath(wh: String) = s"$wh/corpus/media_bands"
  private def mediaPairsPath(wh: String) = s"$wh/corpus/media_pairs"
  private def mediaCappedPath(wh: String) = s"$wh/corpus/media_capped_buckets"
  private def stagedMediaPath(wh: String) = s"$wh/corpus/staged_media_drops"
  private def mediaTombPath(wh: String) = s"$wh/corpus/media_tombstones"
  private def mediaCcPath(wh: String) = s"$wh/corpus/media_cc_labels"

  /** Land one MEDIA drop — the image-modality twin of `run` /
    * `ingestEmbeddings`: trim the drop against the hash store (replayed
    * drops are no-ops), decode + hash the increment ONCE, derive
    * perceptual near-dup pairs against the persisted banded store, append
    * pairs + bands + hashes. Returns (new media landed, new pairs).
    *
    * The drop frame is (media_id, content: binary), id-immutable like the
    * other modalities. The HASH table (media_id, phash) is the trim's
    * existence key and the drop's COMMIT POINT (written last) — and it
    * records EVERY id, including undecodable payloads (null phash) and
    * degenerate blank-image hashes, so a broken image is decoded once and
    * then permanently trimmed instead of re-attempted every drop; only
    * clean hashes enter the banded store. `maxHamming` is pair-table
    * provenance (a pair row carries its hamming but the CUT defines the
    * table's semantics) — stamped and enforced like the dedup thresholds.
    */
  def ingestMedia(spark: SparkSession, drop: DataFrame, warehouse: String,
                  maxHamming: Int = 3,
                  storeBuckets: Int = 8,
                  maxBucketCandidates: Option[Int] = None,
                  hotBucketSalt: Int = 0): (Long, Long) =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    // park-aware like run(): a parked hash store must not flip this drop
    // into the first-drop branch
    val storeExists = Sinks.storePresent(spark, mediaHashPath(warehouse))
    checkThresholdAt(spark, mediaPairsPath(warehouse), "corpus/media_pairs",
      maxHamming.toDouble)
    // band-store geometry ledger too (chunk count = maxHamming + 1): the
    // pair ledger alone would not catch a cut drift against a band store
    // stamped by a direct appendPhashStoreBucketed user before any pair
    // table existed
    Sinks.checkAndStampParams(spark, mediaBandsPath(warehouse),
      Seq("maxHamming" -> maxHamming.toString))
    graft.core.GraftCaches.withScope(spark) {
      val newMedia =
        (if (!storeExists) drop
         else drop.join(
           readStore(spark, mediaHashPath(warehouse)).select("media_id"),
           Seq("media_id"), "left_anti"))
          .dropDuplicates("media_id")
      val inc = graft.core.Checkpoints.cut(newMedia)
      val nNew = inc.count()
      if (nNew == 0) (0L, 0L)
      else {
        // ONE decode pass: the hash frame feeds banding, pairing, and the
        // commit-point append
        val hashes = graft.core.GraftCaches.acquire(
          graft.operators.Multimodal.imageHashes(inc)
            .repartition(col("media_id")))
        val freshBands = graft.core.GraftCaches.acquire(
          graft.operators.Multimodal.phashBandTableFromHashes(hashes,
            maxHamming))
        // hot-bucket cap + ledger on (ci, chunk), the text path's device
        val hot = maxBucketCandidates.flatMap { cap =>
          if (!storeExists) None
          else Some(graft.core.GraftCaches.acquire(
            graft.operators.Multimodal.overflowingChunkBuckets(
              readStore(spark, mediaBandsPath(warehouse)), cap)))
        }
        // salt mode derives the hot buckets' pairs (no recall trade) — the
        // capped ledger records only genuine skips
        if (hotBucketSalt <= 0)
          hot.filter(h => !h.isEmpty).foreach(h =>
            Sinks.idempotentAppend(h, mediaCappedPath(warehouse),
              keys = Seq("ci", "chunk"), partitionCols = Nil))
        val pairs = graft.core.GraftCaches.acquire(
          if (!storeExists) graft.operators.Multimodal.nearDupFromHashes(
            hashes.filter(col("phash").isNotNull && col("phash") =!= -1L),
            maxHamming)
          else graft.operators.Multimodal.phashIncrementalFromBands(
            readStore(spark, mediaBandsPath(warehouse)), freshBands,
            maxHamming,
            // commit guard: only store rows whose id reached the hash
            // commit table may pair — orphan band rows from a crashed,
            // never-retried drop emit no ghosts
            commitIds =
              Some(readStore(spark, mediaHashPath(warehouse)).select("media_id")),
            excludeBuckets = hot,
            saltHotBuckets = hotBucketSalt))
        val nPairs = pairs.count()
        stampThresholdAt(spark, mediaPairsPath(warehouse), maxHamming.toDouble)
        appendKeyedStore(spark, pairs, mediaPairsPath(warehouse), storeBuckets,
          keys = Seq("media_a", "media_b"))
        if (nPairs > 0)
          updateLabels(spark, mediaCcPath(warehouse),
            mediaPairsPath(warehouse), pairs, "media_a", "media_b",
            storeBuckets)
        // bands before the hash commit point; same prefix-keyed
        // exchange-free existence check as appendPhashStoreBucketed
        Sinks.bucketedIdempotentAppend(freshBands, mediaBandsPath(warehouse),
          keys = Seq("ci", "chunk", "media_id"),
          bucketKeys = Seq("ci", "chunk"), buckets = storeBuckets)
        Sinks.bucketedIdempotentAppend(hashes, mediaHashPath(warehouse),
          keys = Seq("media_id"), bucketKeys = Seq("media_id"),
          buckets = storeBuckets)
        Seq(mediaBandsPath(warehouse), mediaHashPath(warehouse)).foreach(p =>
          Sinks.compactBucketedIfFragmented(spark, p))
        (nNew, nPairs)
      }
    }
  }

  /** GOVERNANCE DELETE for the media modality: purges media_hashes /
    * media_bands / staged_media_drops on media_id (the recoverable
    * perceptual fingerprint and the stream path's staged mirror) and
    * media_pairs on either side, through the bucketed writer. The raw
    * media bytes live upstream of this warehouse; this removes every
    * derived fingerprint so a re-submission re-lands as new. Tombstones
    * unconditionally (landing promotions must not resurrect the id);
    * `reinstateMedia` lifts.
    */
  def deleteMedia(spark: SparkSession, warehouse: String,
                  mediaIds: Seq[Long]): Map[String, (Long, Long)] =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    import spark.implicits._
    val keys = mediaIds.toDF("media_id")
    val byId = Seq(
      "media_hashes" -> mediaHashPath(warehouse),
      "media_bands" -> mediaBandsPath(warehouse),
      "staged_media_drops" -> stagedMediaPath(warehouse))
    val purged = byId.flatMap { case (name, p) =>
      if (!Sinks.storePresent(spark, p)) None
      else if (Sinks.isBucketedStore(spark, p))
        Some(name -> Sinks.deleteBucketedByKey(spark, p, keys, Seq("media_id")))
      else Some(name -> Sinks.deleteByKey(spark, p, keys, Seq("media_id")))
    }.toMap
    val tomb = tombstoneWithCounts(spark, mediaTombPath(warehouse), keys,
      Seq("media_id"))
    dropStore(spark, mediaCcPath(warehouse))
    val all =
      if (!Sinks.storePresent(spark, mediaPairsPath(warehouse))) purged
      else if (Sinks.isBucketedStore(spark, mediaPairsPath(warehouse)))
        purged + ("media_pairs" -> Sinks.deleteBucketedByAnyKey(spark,
          mediaPairsPath(warehouse), keys, "media_id",
          Seq("media_a", "media_b")))
      else purged + ("media_pairs" -> Sinks.deleteByAnyKey(spark,
        mediaPairsPath(warehouse), keys, "media_id",
        Seq("media_a", "media_b")))
    rebuildLabels(spark, mediaCcPath(warehouse), mediaPairsPath(warehouse),
      "media_a", "media_b")
    appendAudit(spark, warehouse, "delete_media", "media_id",
      mediaIds.size.toLong, all + ("media_tombstones" -> tomb))
    all
  }

  /** `reinstate` for the media modality (lifts the block, never
    * resurrects data). */
  def reinstateMedia(spark: SparkSession, warehouse: String,
                     mediaIds: Seq[Long]): Long =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    if (!Sinks.storePresent(spark, mediaTombPath(warehouse))) 0L
    else {
      import spark.implicits._
      val (before, after) = Sinks.deleteByKey(spark, mediaTombPath(warehouse),
        mediaIds.toDF("media_id"), Seq("media_id"))
      appendAudit(spark, warehouse, "reinstate_media", "media_id",
        mediaIds.size.toLong, Map("media_tombstones" -> (before, after)))
      before - after
    }
  }

  /** The deduplicated MEDIA view: surviving (media_id, phash) rows under
    * keep-the-minimum per perceptual near-dup cluster over the cumulative
    * pair table — the id list a pipeline keeps (raw bytes live upstream).
    *
    * Only TRAINABLE media survive: the hash store deliberately records
    * undecodable payloads (null phash) and blank-image sentinels (-1) so a
    * broken image is decoded once and trimmed forever, but those rows are
    * ingest bookkeeping, not corpus members — a training-data view must
    * not ship media the pipeline itself could not decode.
    */
  def mediaSurvivors(spark: SparkSession, warehouse: String): DataFrame = {
    val hashes = readStore(spark, mediaHashPath(warehouse))
      .filter(col("phash").isNotNull && col("phash") =!= lit(-1L))
    // lease-free view: fail on a parked pair table, never serve unfiltered
    if (!Sinks.storePresent(spark, mediaPairsPath(warehouse))) hashes
    else hashes.join(
      losersFor(spark, mediaCcPath(warehouse), mediaPairsPath(warehouse),
        "media_a", "media_b", "media_id"),
      Seq("media_id"), "left_anti")
  }

  private def linksPath(wh: String) = s"$wh/corpus/links"

  /** CROSS-MODALITY LINKAGE — the table `forget` resolves: one row per
    * (content_key, modality, id) with modality in {"doc", "vec", "media"},
    * registered at ingest alongside each drop (the ingest entry points
    * cannot infer the linkage — doc/vec/media id spaces are independent by
    * design, and only the pipeline that derived a vector from a document
    * knows they are the same content). Keyed idempotent append, so
    * re-registering with a replayed drop is a no-op. Thin rows, one
    * modality per row — no null-keyed columns to break the keyed no-op.
    */
  def registerLinks(spark: SparkSession, warehouse: String,
                    links: DataFrame): Unit =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    require(Set("content_key", "modality", "id").subsetOf(links.columns.toSet),
      s"registerLinks needs (content_key, modality, id), got " +
        links.columns.mkString(", "))
    val bad = links.select(col("modality")).distinct()
      .filter(!col("modality").isin("doc", "vec", "media")).collect()
    require(bad.isEmpty,
      s"registerLinks: unknown modalities ${bad.mkString(",")} — " +
        "expected doc | vec | media")
    Sinks.idempotentAppend(
      links.select(col("content_key").cast("long"), col("modality"),
        col("id").cast("long")),
      linksPath(warehouse),
      keys = Seq("content_key", "modality", "id"), partitionCols = Nil)
  }

  /** UNIFIED TAKEDOWN — one entry point for "forget this content":
    * resolves the linkage table and cascades `delete`,
    * `deleteEmbeddings`, and `deleteMedia` (each with its tombstone) in a
    * single leased call, then purges the resolved link rows themselves
    * (a (content_key, id) mapping is a content fingerprint too). Without
    * this, a compliance pass had to know which modalities a piece of
    * content reached and issue three id-space-specific deletes — and a
    * missed modality left recoverable fingerprints behind.
    *
    * The resolved id lists ride the driver (takedown lists are
    * human-scale, same class as the delete APIs' Seq[Long] inputs).
    * Returns the combined audit, entries keyed `<modality>.<table>` plus
    * `links`. Content keys with no link rows contribute nothing — calling
    * forget on never-registered content is a no-op, not an error.
    */
  def forget(spark: SparkSession, warehouse: String,
             contentKeys: Seq[Long]): Map[String, (Long, Long)] =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    if (!Sinks.storePresent(spark, linksPath(warehouse))) Map.empty
    else {
      import spark.implicits._
      val keyDf = contentKeys.toDF("content_key")
      val resolved = spark.read.parquet(linksPath(warehouse))
        .join(keyDf, "content_key")
        .select(col("modality"), col("id")).distinct().collect()
      def ids(m: String): Seq[Long] =
        resolved.filter(_.getString(0) == m).map(_.getLong(1)).toSeq
      val docAudit =
        if (ids("doc").isEmpty) Map.empty[String, (Long, Long)]
        else delete(spark, warehouse, ids("doc"))
          .map { case (k, v) => s"doc.$k" -> v }
      val vecAudit =
        if (ids("vec").isEmpty) Map.empty[String, (Long, Long)]
        else deleteEmbeddings(spark, warehouse, ids("vec"))
          .map { case (k, v) => s"vec.$k" -> v }
      val mediaAudit =
        if (ids("media").isEmpty) Map.empty[String, (Long, Long)]
        else deleteMedia(spark, warehouse, ids("media"))
          .map { case (k, v) => s"media.$k" -> v }
      val all = docAudit ++ vecAudit ++ mediaAudit +
        ("links" -> Sinks.deleteByKey(spark, linksPath(warehouse), keyDf,
          Seq("content_key")))
      appendAudit(spark, warehouse, "forget", "content_key",
        contentKeys.size.toLong, Map("links" -> all("links")))
      all
    }
  }

  private def auditPath(wh: String) = s"$wh/corpus/audit_log"

  /** Durable GOVERNANCE AUDIT TRAIL: every delete / forget / reinstate
    * appends one row per table it TOUCHED — including the tombstone
    * tables the deletes stamp — as (seq, at_ms, op, id_col, n_ids,
    * table, rows_before, rows_after), so a compliance pass can prove a
    * takedown ran (and what it removed, and that the streamed-
    * resurrection block was placed) without having captured the entry
    * point's return value. `seq` is a per-warehouse monotonic event
    * number — same-millisecond events stay ordered, which `at_ms` alone
    * cannot promise. It comes off a sibling ledger (stamp-first, race-free
    * because every writer holds the warehouse lease); the full-log
    * max-scan runs only once, on a legacy log that predates the ledger. Plain event-log append, deliberately NOT keyed: a
    * crash-retried cascade logs twice, which is the truthful record (the
    * cascade ran twice — idempotently). Each cascade writes its audit
    * rows LAST, so a crash mid-cascade under-reports (the retry re-logs)
    * rather than fabricating a completed purge. A call that touched
    * nothing (reinstate before any tombstone table, forget of an
    * unregistered key) logs nothing — there is no event to record. The
    * log is thin and lives outside the content tables — `fsck` and the
    * views never read it.
    */
  /** The audit log with the `seq` column GUARANTEED present: a log whose
    * earliest files predate the seq column (legacy-warehouse contract —
    * same tolerance as readStore's plain fallback) reads those rows as
    * seq = -1, so appends keep numbering from 0 and the compliance read
    * orders legacy rows by timestamp beneath every numbered event.
    */
  private def readAudit(spark: SparkSession, warehouse: String): DataFrame = {
    val log = spark.read.option("mergeSchema", "true")
      .parquet(auditPath(warehouse))
    if (!log.columns.contains("seq")) log.withColumn("seq", lit(-1L))
    else log.withColumn("seq", coalesce(col("seq"), lit(-1L)))
  }

  /** Sibling ledger holding the LAST USED audit seq — the metadata-read
    * that replaces scanning the whole (compacted, but unbounded) event log
    * for max(seq) on every governance call. Sibling placement survives the
    * log's compaction swap, like every other ledger here.
    */
  private def auditSeqLedger(wh: String) = auditPath(wh) + "._audit_seq"

  private def appendAudit(spark: SparkSession, warehouse: String, op: String,
                          idCol: String, nIds: Long,
                          entries: Map[String, (Long, Long)]): Unit =
    if (entries.nonEmpty) {
      import spark.implicits._
      val at = System.currentTimeMillis()
      // last used seq: the ledger when present; one full-log scan only on
      // a legacy warehouse whose log predates the ledger (or a torn
      // ledger write — unreadable = re-derive, never skip). Race-free:
      // every governance writer holds the warehouse lease.
      val last = readLongLedger(spark, auditSeqLedger(warehouse)) match {
        case -1L =>
          if (!Sinks.storePresent(spark, auditPath(warehouse))) -1L
          else {
            val r = readAudit(spark, warehouse).agg(max(col("seq"))).head()
            if (r.isNullAt(0)) -1L else r.getLong(0)
          }
        case v => v
      }
      val seq = last + 1L
      // STAMP-FIRST, same crash ordering as every ledger here: a crash
      // between the stamp and the row append leaves a seq GAP — an event
      // that recorded nothing, i.e. the trail under-reports (fsck flags
      // the gap as warn). The reverse order could reuse a seq after a
      // crash and fabricate one event out of two — never acceptable in a
      // compliance trail.
      writeLongLedger(spark, auditSeqLedger(warehouse), seq)
      entries.toSeq.map { case (t, (b, a)) =>
        (seq, at, op, idCol, nIds, t, b, a)
      }
        .toDF("seq", "at_ms", "op", "id_col", "n_ids", "table",
          "rows_before", "rows_after")
        .coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(auditPath(warehouse))
      // lifecycle: one coalesced file per event still fragments at a real
      // compliance cadence — same 4× gate as every other table. The swap
      // preserves row content exactly and the sibling ledgers ride it.
      Sinks.compactIfFragmented(spark, auditPath(warehouse), targetFiles = 4)
    }

  /** Tombstone stamp with (before, after) table counts for the audit
    * trail — the tombstone tables are thin (one id per row), so the two
    * counts are metadata-cheap.
    */
  private def tombstoneWithCounts(spark: SparkSession, path: String,
                                  keys: DataFrame,
                                  keyCols: Seq[String]): (Long, Long) = {
    val before =
      if (Sinks.storePresent(spark, path)) spark.read.parquet(path).count()
      else 0L
    Sinks.idempotentAppend(keys, path, keys = keyCols, partitionCols = Nil)
    (before, spark.read.parquet(path).count())
  }

  /** The governance audit trail as a frame (empty-but-schema'd when no
    * governance call has run), newest event first.
    */
  def governanceAudit(spark: SparkSession, warehouse: String): DataFrame =
    if (Sinks.storePresent(spark, auditPath(warehouse)))
      readAudit(spark, warehouse)
        .select(col("seq"), col("at_ms"), col("op"), col("id_col"),
          col("n_ids"), col("table"), col("rows_before"), col("rows_after"))
        .orderBy(col("seq").desc, col("at_ms").desc, col("table"))
    else {
      import spark.implicits._
      Seq.empty[(Long, Long, String, String, Long, String, Long, Long)]
        .toDF("seq", "at_ms", "op", "id_col", "n_ids", "table",
          "rows_before", "rows_after")
    }

  /** The CROSS-MODALITY curated corpus — the view a training run reads
    * when content flows through more than one modality: text `survivors`
    * RESTRICTED to docs whose linked embedding and media representations
    * also survived their own dedup passes. The linkage is the same
    * `corpus/links` table `forget` resolves: a doc whose vector lost its
    * cosine or SemDeDup cluster is semantically duplicated content even
    * when its TEXT survived the Jaccard cut (that asymmetry is SemDeDup's
    * whole premise), and a doc whose image lost its perceptual cluster
    * likewise. Docs with no links — or none in a given modality, or in a
    * modality whose stores this warehouse never built — are unconstrained
    * by it; with no links table at all this degenerates to `survivors`.
    * Scale shape: every join ships thin id rows (links is (key, modality,
    * id); the survivor sets resolve off the label stores), so the
    * restriction costs id-sized joins on top of the label scans.
    */
  def curatedSurvivors(spark: SparkSession, warehouse: String): DataFrame = {
    val docs = survivors(spark, warehouse)
    if (!Sinks.storePresent(spark, linksPath(warehouse))) docs
    else {
      val links = spark.read.parquet(linksPath(warehouse))
      // "lost" means LOST A DEDUP CLUSTER (a component non-minimum) —
      // deliberately not "absent from the survivors view": the media view
      // also excludes undecodable/blank bookkeeping rows, and a doc whose
      // image merely failed to decode is not duplicated content
      def lostVia(modality: String, labelP: String, pairsP: String,
                  a: String, b: String): Option[DataFrame] =
        if (!Sinks.storePresent(spark, pairsP)) None
        else Some(links.filter(col("modality") === modality)
          .join(losersFor(spark, labelP, pairsP, a, b, "id"),
            Seq("id"), "left_semi")
          .select(col("content_key")))
      val allLost = Seq(
        // a vec lost in EITHER the cosine or the SemDeDup clustering
        lostVia("vec", embCcPath(warehouse), embPairsPath(warehouse),
          "vec_a", "vec_b"),
        lostVia("vec", semCcPath(warehouse), semPairsPath(warehouse),
          "vec_a", "vec_b"),
        lostVia("media", mediaCcPath(warehouse), mediaPairsPath(warehouse),
          "media_a", "media_b")).flatten
      if (allLost.isEmpty) docs
      else {
        val lost = allLost.reduce(_ unionByName _).distinct()
        val lostDocs = links.filter(col("modality") === "doc")
          .join(lost, Seq("content_key"), "left_semi")
          .select(col("id").as("doc_id"))
        docs.join(lostDocs, Seq("doc_id"), "left_anti")
      }
    }
  }

  // ===== Reproducible corpus snapshots ======================================
  //
  // A training run needs to name the EXACT corpus it read — across later
  // drops, dedup-cluster churn, and takedowns — without freezing 100 TB of
  // text per run. A snapshot here pins curated MEMBERSHIP, not bytes: an
  // id-only manifest of the curated survivor set, written as its own
  // bucketed store co-located with `corpus/documents` (same doc_id bucket
  // layout), so `curatedAsOf`'s semi-join plans no exchange on the
  // corpus-sized side however many snapshots accumulate. The trade is
  // deliberate and governance-CORRECT: reading a snapshot joins the
  // manifest against the LIVE document store, so a takedown flows through
  // every historical snapshot automatically (`delete` physically purges
  // the rows) — "reproducible" never means "retains what compliance
  // removed". With content-keyed ids (the links table's contract),
  // membership-of-ids IS membership-of-bytes for every doc that is still
  // lawful to read.
  //
  // Crash ordering: manifest rows land first, the `_snap_commit` marker
  // (holding the manifest count — the list API's metadata read) lands
  // LAST, and every reader ignores uncommitted dirs — a crash mid-write
  // leaves residue that is invisible, flagged by fsck, and cleared by
  // repair. Stamps are strictly monotonic per warehouse (enforced under
  // the lease), so "latest at or before t" is unambiguous.
  private def snapsRoot(wh: String) = s"$wh/corpus/snapshots"
  private def snapDirOf(wh: String, ts: Long) = s"${snapsRoot(wh)}/snap_ts=$ts"
  private def snapCommitLedger(dir: String) = dir + "/_snap_commit"

  /** Generic scan of a root of `<prefix><stamp>` artifact dirs committed
    * by a lands-last `<marker>` file: (committed stamps ascending,
    * uncommitted residue dirs). Shared by snapshots and exports — both
    * commit the same way, so fsck/repair reason about both identically.
    */
  private def scanStamped(spark: SparkSession, rootDir: String,
                          prefix: String,
                          marker: String): (Seq[Long], Seq[String]) = {
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) (Nil, Nil)
    else {
      val dirs = fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
        .map(_.getPath)
      val (committed, torn) = dirs.partition(p =>
        fs.exists(new org.apache.hadoop.fs.Path(p, marker)))
      (committed.map(_.getName.stripPrefix(prefix).toLong).sorted,
        torn.map(_.toString))
    }
  }

  /** (committed snapshot stamps ascending, uncommitted residue dirs). */
  private def scanSnapshots(spark: SparkSession,
                            wh: String): (Seq[Long], Seq[String]) =
    scanStamped(spark, snapsRoot(wh), "snap_ts=", "_snap_commit")

  /** Monotonic artifact stamp: explicit stamps must advance past the
    * latest prior stamp (refused otherwise); the default clock stamp
    * self-corrects same-millisecond collisions. Callers hold the lease,
    * so reading `prior` then stamping is race-free.
    */
  private def nextStamp(prior: Seq[Long], atMs: Option[Long],
                        what: String): Long = atMs match {
    case Some(t) =>
      require(prior.forall(_ < t),
        s"$what: stamp $t is not after the latest ${prior.max} — " +
          "stamps are monotonic per warehouse")
      t
    case None =>
      val now = System.currentTimeMillis()
      if (prior.isEmpty) now else math.max(now, prior.max + 1L)
  }

  /** Pin the current curated corpus as a named snapshot; returns its
    * stamp (epoch millis — the handle `curatedAsOf` resolves). Leased:
    * the manifest must be one drop's consistent view, not a torn read
    * across a concurrent ingest. Audited (`op = snapshot`, counting the
    * snapshot census in the snapshots "table") so the compliance trail
    * records every corpus a training run could have pinned. Explicit
    * `atMs` stamps must advance past the latest snapshot — refused
    * otherwise; the default clock stamp self-corrects same-millisecond
    * collisions.
    */
  def snapshotCorpus(spark: SparkSession, warehouse: String,
                     atMs: Option[Long] = None): Long =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    require(Sinks.storePresent(spark, docsPath(warehouse)),
      s"snapshotCorpus: no document store at ${docsPath(warehouse)} — " +
        "ingest first")
    val (prior, _) = scanSnapshots(spark, warehouse)
    val ts = nextStamp(prior, atMs, "snapshotCorpus")
    val dir = snapDirOf(warehouse, ts)
    // manifest bucket layout mirrors the document store's so the as-of
    // semi-join co-locates; a legacy plain docs store gets the default
    // geometry (the join then shuffles the manifest — the small side)
    val buckets = Sinks.bucketSpecOf(spark, docsPath(warehouse))
      .map(_._2).getOrElse(8)
    Sinks.bucketedIdempotentAppend(
      curatedSurvivors(spark, warehouse).select(col("doc_id")),
      dir, keys = Seq("doc_id"), bucketKeys = Seq("doc_id"),
      buckets = buckets)
    val n = Sinks.readBucketedPath(spark, dir).count()
    // commit point: the marker lands only over a fully-written manifest
    writeLongLedger(spark, snapCommitLedger(dir), n)
    appendAudit(spark, warehouse, "snapshot", "doc_id", n,
      Map("snapshots" -> ((prior.size.toLong, prior.size.toLong + 1L))))
    ts
  }

  /** Census of committed snapshots: (snap_ts, n_docs), ascending. The
    * counts come off the commit markers — a metadata read, no manifest
    * scan. Driver-sized by construction (one row per retained snapshot).
    */
  def listCorpusSnapshots(spark: SparkSession, warehouse: String): DataFrame = {
    import spark.implicits._
    scanSnapshots(spark, warehouse)._1
      .map(ts => (ts,
        readLongLedger(spark, snapCommitLedger(snapDirOf(warehouse, ts)))))
      .toDF("snap_ts", "n_docs")
  }

  /** The curated corpus as pinned by the latest snapshot at or before
    * `asOfMs` — full document rows, manifest-membership ∩ live store
    * (id-bucketed semi-join, co-located with `corpus/documents`).
    * Takedowns since the snapshot are ABSENT by construction. Lease-free
    * read; refuses when no snapshot covers the asked time (an expired or
    * never-taken snapshot must fail the training run, not silently serve
    * the live view).
    */
  def curatedAsOf(spark: SparkSession, warehouse: String,
                  asOfMs: Long): DataFrame = {
    val covered = scanSnapshots(spark, warehouse)._1.filter(_ <= asOfMs)
    require(covered.nonEmpty,
      s"curatedAsOf: no committed corpus snapshot at or before $asOfMs " +
        s"under ${snapsRoot(warehouse)} — run snapshotCorpus (or the " +
        "snapshot asked for was expired)")
    readStore(spark, docsPath(warehouse)).join(
      Sinks.readBucketedPath(spark, snapDirOf(warehouse, covered.max)),
      Seq("doc_id"), "left_semi")
  }

  /** Membership delta between two committed snapshots: (doc_id, change)
    * with change ∈ {added, removed} — what a training team reviews before
    * re-pinning a corpus (and the input to an incremental re-export: the
    * adds are exactly what `extendExport` appends). A doc_id appears at
    * most once — snapshot manifests are membership sets. Lease-free read;
    * refuses uncommitted stamps like every snapshot read.
    *
    * Scale: two anti-joins between id-only manifests bucketed identically
    * on doc_id — co-located, no exchange on either side at any corpus
    * size.
    */
  def snapshotDiff(spark: SparkSession, warehouse: String,
                   fromTs: Long, toTs: Long): DataFrame = {
    val snaps = scanSnapshots(spark, warehouse)._1
    for (ts <- Seq(fromTs, toTs))
      require(snaps.contains(ts),
        s"snapshotDiff: no committed corpus snapshot snap_ts=$ts under " +
          s"${snapsRoot(warehouse)} — see listCorpusSnapshots")
    val a = Sinks.readBucketedPath(spark, snapDirOf(warehouse, fromTs))
    val b = Sinks.readBucketedPath(spark, snapDirOf(warehouse, toTs))
    b.join(a, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("added").as("change"))
      .unionByName(a.join(b, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit("removed").as("change")))
  }

  /** Retention: drop the oldest committed snapshots beyond `keepLast`.
    * Leased and audited like every other mutation; returns how many were
    * expired. Reads against an expired stamp fail loudly at `curatedAsOf`
    * — the documented contract, not data loss (manifests hold ids only).
    */
  def expireCorpusSnapshots(spark: SparkSession, warehouse: String,
                            keepLast: Int): Long =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    require(keepLast >= 1, "expireCorpusSnapshots: keepLast must be >= 1")
    val (snaps, _) = scanSnapshots(spark, warehouse)
    val drop = snaps.dropRight(keepLast)
    drop.foreach(ts => dropStore(spark, snapDirOf(warehouse, ts)))
    if (drop.nonEmpty)
      appendAudit(spark, warehouse, "expire_snapshots", "snap_ts",
        drop.size.toLong,
        Map("snapshots" -> ((snaps.size.toLong,
          snaps.size.toLong - drop.size))))
    drop.size.toLong
  }

  // ===== Reproducible training exports ======================================
  //
  // The export is the last warehouse artifact before a trainer reads
  // bytes: a snapshot's membership fixed into the DETERMINISTIC global
  // shuffle — (doc_id, shard, pos) via `CorpusOps.shardAssignment`'s
  // portable hashes — so a restarted or re-provisioned training job
  // re-derives byte-identical shard order from the warehouse instead of
  // trusting whatever files survived. Like snapshots, an export pins the
  // PLAN, not bytes: `readExport` joins the manifest against the LIVE
  // document store (id-bucketed, co-located with `corpus/documents`), so
  // takedowns flow through already-cut exports — a removed doc vanishes
  // from its shard while every OTHER doc keeps its (shard, pos); a
  // mid-training purge leaves a gap, never a re-shuffle under the
  // trainer's feet. An export is self-contained once committed (the
  // manifest holds the placement), so expiring its source snapshot does
  // not invalidate it.
  //
  // Same crash ordering as snapshots: manifest rows first, sidecar
  // ledgers (source snapshot stamp, shard count), then the
  // `_export_commit` marker (holding the manifest count) lands LAST;
  // readers ignore uncommitted dirs, fsck warns on them, repair clears
  // them.
  private def exportsRoot(wh: String) = s"$wh/corpus/exports"
  private def exportDirOf(wh: String, ts: Long) =
    s"${exportsRoot(wh)}/export_ts=$ts"
  private def exportCommitLedger(dir: String) = dir + "/_export_commit"
  private def exportSnapLedger(dir: String) = dir + "/_export_snap"
  private def exportShardsLedger(dir: String) = dir + "/_export_shards"
  private def exportBaseLedger(dir: String) = dir + "/_export_base"

  /** (committed export stamps ascending, uncommitted residue dirs). */
  private def scanExports(spark: SparkSession,
                          wh: String): (Seq[Long], Seq[String]) =
    scanStamped(spark, exportsRoot(wh), "export_ts=", "_export_commit")

  /** Fix the corpus a training run reads: shard-assign the snapshot
    * membership at `asOfMs` (resolved exactly like `curatedAsOf` — the
    * latest committed snapshot at or before it; refused when none covers
    * it) into a deterministic (doc_id, shard, pos) manifest, persisted
    * id-bucketed so `readExport` co-locates with the document store.
    * Returns the export stamp. Leased — the manifest must be one
    * consistent view — and audited (`op = export`). The window behind
    * `shardAssignment` shuffles once on `shard` — increment-free by
    * design, since an export is a one-shot artifact, not a maintained
    * store.
    */
  def exportCorpus(spark: SparkSession, warehouse: String, asOfMs: Long,
                   numShards: Int, atMs: Option[Long] = None): Long =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    require(numShards >= 1, s"exportCorpus: numShards must be >= 1")
    val snaps = scanSnapshots(spark, warehouse)._1.filter(_ <= asOfMs)
    require(snaps.nonEmpty,
      s"exportCorpus: no committed corpus snapshot at or before $asOfMs " +
        s"under ${snapsRoot(warehouse)} — run snapshotCorpus first")
    val (prior, _) = scanExports(spark, warehouse)
    val ts = nextStamp(prior, atMs, "exportCorpus")
    val dir = exportDirOf(warehouse, ts)
    val manifest = graft.operators.CorpusOps.shardAssignment(
      curatedAsOf(spark, warehouse, asOfMs).select(col("doc_id")), numShards)
    val buckets = Sinks.bucketSpecOf(spark, docsPath(warehouse))
      .map(_._2).getOrElse(8)
    Sinks.bucketedIdempotentAppend(manifest, dir, keys = Seq("doc_id"),
      bucketKeys = Seq("doc_id"), buckets = buckets)
    val n = Sinks.readBucketedPath(spark, dir).count()
    writeLongLedger(spark, exportSnapLedger(dir), snaps.max)
    writeLongLedger(spark, exportShardsLedger(dir), numShards.toLong)
    // commit point: the marker lands only over a fully-written manifest
    writeLongLedger(spark, exportCommitLedger(dir), n)
    appendAudit(spark, warehouse, "export", "doc_id", n,
      Map("exports" -> ((prior.size.toLong, prior.size.toLong + 1L))))
    ts
  }

  /** Extend a committed export with a LATER snapshot's additions — the
    * continued-pretraining evolution: every base-manifest row keeps its
    * (shard, pos) VERBATIM (the byte prefix a resumed or continued
    * training run already consumed), and docs in the resolved snapshot
    * but not the base manifest are appended past each shard's high-water
    * mark in the same portable-hash order `exportCorpus` would have used.
    * Docs that left the corpus since the base stay in the manifest —
    * takedown gaps flow through `readExport`'s live join exactly as they
    * do for a root export, never a re-shuffle. The new export is a
    * first-class committed artifact (own stamp, same sidecars plus an
    * `_export_base` lineage ledger; expiring the base does not invalidate
    * it). Leased and audited (`op = extend_export`).
    *
    * Scale: one anti-join between id-bucketed manifests (co-located), a
    * rank window over the ADDITIONS only (bounded by the delta, not the
    * corpus), and a broadcast of the numShards-row high-water frame.
    */
  def extendExport(spark: SparkSession, warehouse: String,
                   baseExportTs: Long, asOfMs: Long,
                   atMs: Option[Long] = None): Long =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    val (prior, _) = scanExports(spark, warehouse)
    require(prior.contains(baseExportTs),
      s"extendExport: no committed export export_ts=$baseExportTs under " +
        s"${exportsRoot(warehouse)} — see listCorpusExports")
    val snaps = scanSnapshots(spark, warehouse)._1.filter(_ <= asOfMs)
    require(snaps.nonEmpty,
      s"extendExport: no committed corpus snapshot at or before $asOfMs " +
        s"under ${snapsRoot(warehouse)} — run snapshotCorpus first")
    val ts = nextStamp(prior, atMs, "extendExport")
    val dir = exportDirOf(warehouse, ts)
    val baseDir = exportDirOf(warehouse, baseExportTs)
    val numShards = readLongLedger(spark, exportShardsLedger(baseDir)).toInt
    val base = Sinks.readBucketedPath(spark, baseDir)
    val newDocs = Sinks.readBucketedPath(
        spark, snapDirOf(warehouse, snaps.max))
      .join(base, Seq("doc_id"), "left_anti").select(col("doc_id"))
    val baseMax = base.groupBy(col("shard"))
      .agg(max(col("pos")).as("max_pos"))
    val appended = graft.operators.CorpusOps.shardAssignmentAfter(
      newDocs, numShards, baseMax)
    val buckets = Sinks.bucketSpecOf(spark, docsPath(warehouse))
      .map(_._2).getOrElse(8)
    Sinks.bucketedIdempotentAppend(base.unionByName(appended), dir,
      keys = Seq("doc_id"), bucketKeys = Seq("doc_id"), buckets = buckets)
    val n = Sinks.readBucketedPath(spark, dir).count()
    writeLongLedger(spark, exportSnapLedger(dir), snaps.max)
    writeLongLedger(spark, exportShardsLedger(dir), numShards.toLong)
    writeLongLedger(spark, exportBaseLedger(dir), baseExportTs)
    // commit point: the marker lands only over a fully-written manifest
    writeLongLedger(spark, exportCommitLedger(dir), n)
    appendAudit(spark, warehouse, "extend_export", "doc_id", n,
      Map("exports" -> ((prior.size.toLong, prior.size.toLong + 1L))))
    ts
  }

  /** Census of committed exports: (export_ts, snap_ts, n_shards, n_docs,
    * base_ts), ascending — all off the sidecar ledgers, no manifest scan.
    * `base_ts` is the lineage of an extended export (-1 for a root cut).
    */
  def listCorpusExports(spark: SparkSession, warehouse: String): DataFrame = {
    import spark.implicits._
    scanExports(spark, warehouse)._1.map { ts =>
      val dir = exportDirOf(warehouse, ts)
      (ts, readLongLedger(spark, exportSnapLedger(dir)),
        readLongLedger(spark, exportShardsLedger(dir)),
        readLongLedger(spark, exportCommitLedger(dir)),
        readLongLedger(spark, exportBaseLedger(dir)))
    }.toDF("export_ts", "snap_ts", "n_shards", "n_docs", "base_ts")
  }

  /** The trainer's read: full document rows with their pinned
    * (shard, pos) placement — manifest ⋈ live store, id-bucketed both
    * sides so the join plans no exchange on the corpus-sized side.
    * Takedowns since the export are ABSENT; surviving docs keep their
    * placement. Lease-free read; refuses an unknown or uncommitted stamp
    * (an export handle must resolve exactly or fail the run).
    */
  def readExport(spark: SparkSession, warehouse: String,
                 exportTs: Long): DataFrame = {
    require(scanExports(spark, warehouse)._1.contains(exportTs),
      s"readExport: no committed export export_ts=$exportTs under " +
        s"${exportsRoot(warehouse)} — see listCorpusExports")
    readStore(spark, docsPath(warehouse)).join(
      Sinks.readBucketedPath(spark, exportDirOf(warehouse, exportTs)),
      Seq("doc_id"))
  }

  /** Pre-run shard verification — the check a trainer runs BEFORE reading
    * an export: per shard, the manifest's row count and placement
    * fingerprint next to the LIVE view's (manifest ∩ document store).
    * Equal columns mean the shard streams exactly the pinned bytes;
    * `n_manifest - n_live` counts takedown gaps (expected, reviewable via
    * the audit trail), and a fingerprint drift at EQUAL counts would
    * evidence placement corruption — impossible under the write
    * contracts, which is exactly why a trainer checks it.
    *
    * The fingerprint is an order-insensitive multiset hash of
    * (doc_id, shard, pos) placements: XOR of a portable per-row hash
    * (same modular family as the shard/order hashes, so DuckDB replays it
    * exactly). XOR, not SUM, so the aggregate cannot overflow at any
    * corpus size; manifest rows are doc_id-unique by construction, so
    * XOR's self-cancellation is unreachable.
    *
    * Scale: two aggregates over the id-sized manifest (the live side is
    * an id-projected semi-join co-located with the document store) into
    * `numShards` rows — no content read, driver-sized result.
    */
  def exportIntegrity(spark: SparkSession, warehouse: String,
                      exportTs: Long): DataFrame = {
    require(scanExports(spark, warehouse)._1.contains(exportTs),
      s"exportIntegrity: no committed export export_ts=$exportTs under " +
        s"${exportsRoot(warehouse)} — see listCorpusExports")
    val manifest = Sinks.readBucketedPath(
      spark, exportDirOf(warehouse, exportTs))
    val live = manifest.join(
      readStore(spark, docsPath(warehouse)).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val fp = ((col("doc_id") % 1000003L) * 40503L +
      col("pos") * 69069L) % 2147483647L
    def roll(df: DataFrame, n: String, f: String): DataFrame =
      df.select(col("shard"), fp.as("fp")).groupBy(col("shard"))
        .agg(count(lit(1)).as(n), expr("bit_xor(fp)").as(f))
    roll(manifest, "n_manifest", "fp_manifest")
      .join(roll(live, "n_live", "fp_live"), Seq("shard"), "left_outer")
      .select(col("shard"), col("n_manifest"),
        coalesce(col("n_live"), lit(0L)).as("n_live"),
        col("fp_manifest"),
        coalesce(col("fp_live"), lit(0L)).as("fp_live"))
  }

  /** Retention: drop the oldest committed exports beyond `keepLast`.
    * Leased, audited, loud-on-expired-read — `expireCorpusSnapshots`'
    * contract applied to exports.
    */
  def expireCorpusExports(spark: SparkSession, warehouse: String,
                          keepLast: Int): Long =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    require(keepLast >= 1, "expireCorpusExports: keepLast must be >= 1")
    val (exps, _) = scanExports(spark, warehouse)
    val drop = exps.dropRight(keepLast)
    drop.foreach(ts => dropStore(spark, exportDirOf(warehouse, ts)))
    if (drop.nonEmpty)
      appendAudit(spark, warehouse, "expire_exports", "export_ts",
        drop.size.toLong,
        Map("exports" -> ((exps.size.toLong, exps.size.toLong - drop.size))))
    drop.size.toLong
  }

  /** RETRAIN the SemDeDup state — the other half of the frozen-centroid
    * cadence `ingestEmbeddings(trainedCentroids = ...)` rides on: train
    * fresh centroids on the CURRENT vector store, rebuild the assignment
    * and pair tables from scratch under them, and return the new centroid
    * frame. The centroids are WAREHOUSE STATE, persisted to
    * `corpus/sem_cents` (a tiny k-row parquet sibling of sem_asg) — the
    * returned frame is the parquet scan of that table, so it survives
    * session teardown and executor loss alike; any later session reloads
    * it with `semCentroids`. (The previous localCheckpoint return held the
    * centroid blocks on executors — "safe to hold across drops" only until
    * the first executor loss.) Without this API the documented "rebuild
    * from scratch and resume" step was warehouse hand surgery. The old sem
    * tables and their sibling ledgers are dropped first, so the retrain may
    * change `semThreshold` — the fresh pair table stamps the new
    * provenance. Cost: one Lloyd run over the vector store + one
    * within-cluster pair pass — the batch SemDeDup price, paid once per
    * retrain, not per drop.
    */
  def retrainSemStore(spark: SparkSession, warehouse: String, k: Int = 8,
                      iters: Int = 3, semThreshold: Double = 0.9,
                      storeBuckets: Int = 8): DataFrame =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    require(Sinks.storePresent(spark, embVecsPath(warehouse)),
      s"retrainSemStore: no vector store at ${embVecsPath(warehouse)} — " +
        "ingest embeddings first")
    dropStore(spark, semAsgPath(warehouse))
    dropStore(spark, semPairsPath(warehouse))
    dropStore(spark, semCcPath(warehouse))
    graft.core.GraftCaches.withScope(spark) {
      val vecs = readStore(spark, embVecsPath(warehouse))
      // one shared integerized pass for train + assign; centroids eager +
      // lineage-free — the returned frame must survive this scope's cache
      // release and later store rewrites
      val (cents0, asg0) = graft.operators.SimilarityOps
        .semRetrainFromVecs(vecs, k, iters)
      // persist the k×dims centroid frame to the warehouse FIRST and hand
      // back the scan of it: parquet round-trips doubles bit-exactly, so
      // the assignment store below and every later frozen-centroid drop
      // read the identical values, and the frame outlives this session's
      // executors (a localCheckpoint here was executor-held state — one
      // spot reclaim mid-cadence and the centroids were unrecoverable)
      Sinks.writeCurrent(cents0, semCentsPath(warehouse))
      val cents = spark.read.parquet(semCentsPath(warehouse))
      // stamp the NEW centroid identity on the rebuilt assignment store
      // (dropStore removed the old ledger with the old table), so later
      // drops under stale centroids are refused before work
      Sinks.checkAndStampParams(spark, semAsgPath(warehouse),
        Seq("cents_fp" -> graft.operators.SimilarityOps
          .centroidFingerprint(cents).toString))
      val asg = graft.core.GraftCaches.acquire(asg0)
      stampThresholdAt(spark, semPairsPath(warehouse), semThreshold)
      appendKeyedStore(spark,
        graft.operators.SimilarityOps.semPairsFromAssignments(asg, semThreshold),
        semPairsPath(warehouse), storeBuckets, keys = Seq("vec_a", "vec_b"))
      // rebuild the sem label store from the fresh pair table (the old
      // one went with the old sem state); the store-absent branch of
      // updateLabels reads the full table, so the increment frame is
      // an empty placeholder
      updateLabels(spark, semCcPath(warehouse), semPairsPath(warehouse),
        asg.limit(0).select(col("vec_id").as("vec_a"),
          col("vec_id").as("vec_b")), "vec_a", "vec_b", storeBuckets)
      Sinks.bucketedIdempotentAppend(asg, semAsgPath(warehouse),
        keys = Seq("cid", "vec_id"), bucketKeys = Seq("cid"),
        buckets = storeBuckets)
      cents
    }
  }

  /** The persisted frozen-centroid frame of a sem-maintained warehouse —
    * the value to feed `ingestEmbeddings(trainedCentroids = ...)` between
    * retrains. Durable warehouse state written by `retrainSemStore`, so a
    * fresh session (or a driver restarted after executor loss) reloads the
    * exact centroids the assignment store was built under instead of
    * holding a frame across sessions. None before the first retrain.
    */
  def semCentroids(spark: SparkSession, warehouse: String): Option[DataFrame] =
    if (Sinks.storePresent(spark, semCentsPath(warehouse)))
      Some(spark.read.parquet(semCentsPath(warehouse)))
    else None

  /** Drop a warehouse table AND its sibling ledgers (bucket spec,
    * threshold provenance) plus any catalog registration — the rebuild
    * primitive retrain uses. A directory-only delete would leave a
    * bucket-spec ledger pointing at nothing and a stale threshold stamp
    * guarding an empty table.
    */
  private def dropStore(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    Seq("._bucketspec", "._threshold", "._params").foreach(s =>
      fs.delete(new org.apache.hadoop.fs.Path(path + s), false))
    val name = Sinks.bucketedTableName(path)
    if (spark.catalog.tableExists(name))
      spark.sql(s"DROP TABLE IF EXISTS `$name`")
  }

  /** WAREHOUSE INTEGRITY CHECK (fsck) — one read-only audit of the
    * invariants the write paths maintain, for the operator who inherits a
    * warehouse after crashes, takedowns, and retries and needs to know
    * whether what is on disk is still the state the contracts promise.
    * Returns (check, table, violations, severity):
    *
    *   - severity "warn" rows are states DOCUMENTED flows can reach and
    *     a retry or a governance decision resolves: crash-window residue
    *     (orphan band/assignment rows, documents without their shingle
    *     commit row, PAIR rows referencing ids whose commit append the
    *     crash preempted — pairs land before the commit point by design,
    *     so ghost refs are residue too, healed when the drop retries and
    *     kept inert meanwhile by the probe guards), and tombstoned ids
    *     present in content tables (legal after a documented pure-batch
    *     re-submission of a deleted id — but review it: if no
    *     re-submission happened, a takedown leaked). Label-store
    *     residue is warn too: a torn store create (directory without
    *     its spec ledger — reads already fall back) and pair ids the
    *     label merge has not yet covered (pairs land before the merge;
    *     a retry or any delete's eager rebuild heals, and the miss can
    *     only UNDER-drop). A persistently GROWING warn count means
    *     drops are crashing and nobody retries.
    *   - severity "error" rows should be IMPOSSIBLE under the write
    *     contracts: commit rows that precede their write order (shingles
    *     without documents), a pair table without its threshold ledger,
    *     an ingest ledger ahead of its promote ledger, or label-store
    *     nodes with no pair evidence (which could silently suppress a
    *     real row from a survivors view). Any non-zero error count is
    *     corruption: restore from the immutable landing / re-run the
    *     cascade.
    *
    * Every check is an id-projected anti-join or a ledger compare —
    * bounded scans, no content read; bucketed stores join co-located.
    */
  def fsck(spark: SparkSession, warehouse: String): DataFrame = {
    import spark.implicits._
    def read(p: String): Option[DataFrame] =
      if (!Sinks.pathExists(spark, p)) None
      else if (Sinks.isBucketedStore(spark, p))
        Some(Sinks.readBucketedPath(spark, p))
      else Some(spark.read.parquet(p))
    def short(p: String) = p.split('/').takeRight(1).mkString
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long, String)]()
    // ids present in `tableP` but absent from `commitP`
    def missingFrom(check: String, tableP: String, keyT: String,
                    commitP: String, keyC: String, sev: String): Unit =
      for (t <- read(tableP)) {
        val c = read(commitP).map(_.select(col(keyC).as("k")))
          .getOrElse(Seq.empty[Long].toDF("k"))
        out += ((check, short(tableP),
          t.select(col(keyT).as("k")).distinct()
            .join(c, Seq("k"), "left_anti").count(), sev))
      }
    // pair rows with EITHER side absent from the commit table — crash
    // residue too (pairs land BEFORE the commit point by design), so
    // severity warn: the drop's retry heals it, the probe guards keep the
    // ghosts out of new derivations meanwhile
    def ghostPairs(check: String, pairsP: String, a: String, b: String,
                   commitP: String, keyC: String): Unit =
      for (p <- read(pairsP); c0 <- read(commitP)) {
        val c = c0.select(col(keyC).as("k"))
        val sides = p.select(col(a).as("k"))
          .unionByName(p.select(col(b).as("k"))).distinct()
        out += ((check, short(pairsP),
          sides.join(c, Seq("k"), "left_anti").count(), "warn"))
      }
    // tombstoned ids still present in a content table — legal after a
    // documented pure-batch re-submission (the batch path never consults
    // tombstones), so warn-and-review, not error
    def tombLeak(check: String, tombP: String, contentP: String,
                 key: String): Unit =
      for (t <- read(tombP); c <- read(contentP))
        out += ((check, short(contentP),
          t.select(col(key)).join(c.select(col(key)), Seq(key), "left_semi")
            .count(), "warn"))
    // component label stores: the survivors views trust these instead of
    // re-running the contraction, so audit them against the pair tables
    // they summarize. A directory WITHOUT its spec ledger is torn-create
    // residue (reads already fall back; the next writer clears it) —
    // warn. Pair-side ids ABSENT from the labels are crash residue too
    // (pairs land before the label merge; the drop's retry — or any
    // delete's eager rebuild — heals), and the miss direction only ever
    // UNDER-drops: warn. Label nodes absent from the pair table cannot
    // arise from any documented flow (merges only add nodes from pairs
    // already appended; deletes rebuild from the purged table) and could
    // suppress a real row from the survivors view with no pair evidence
    // — error.
    def labelChecks(labelP: String, pairsP: String, a: String,
                    b: String): Unit = {
      if (fileExists(labelP) && !Sinks.isBucketedStore(spark, labelP))
        out += (("label_store_torn_create", short(labelP), 1L, "warn"))
      // the DIRECTORY must be present too: a crash-parked label store
      // (ledger survives the swap, dir absent) is already the parked_swap
      // row above — running the drift scan against the missing path would
      // abort or count every pair id "missing" next to its own heal
      else if (fileExists(labelP) && Sinks.isBucketedStore(spark, labelP)) {
        if (!fileExists(pairsP))
          // a label store whose pair table is gone (parked — see the
          // parked_swap row — or hand surgery): the drift counts would
          // read "every node orphaned", which is noise next to the real
          // state; one warn row says what to review instead
          out += (("label_store_without_pairs", short(labelP), 1L, "warn"))
        else {
          val (missing, orphan) = labelDrift(spark, labelP, pairsP, a, b)
          out += (("label_missing_nodes", short(labelP), missing, "warn"))
          out += (("label_orphan_nodes", short(labelP), orphan, "error"))
        }
      }
    }

    // crash-window residue (heals on retry)
    missingFrom("orphan_bands", bandPath(warehouse), "doc_id",
      shinglePath(warehouse), "doc_id", "warn")
    missingFrom("stranded_docs", docsPath(warehouse), "doc_id",
      shinglePath(warehouse), "doc_id", "warn")
    missingFrom("orphan_emb_bands", embBandsPath(warehouse), "vec_id",
      embVecsPath(warehouse), "vec_id", "warn")
    missingFrom("orphan_sem_asg", semAsgPath(warehouse), "vec_id",
      embVecsPath(warehouse), "vec_id", "warn")
    missingFrom("orphan_media_bands", mediaBandsPath(warehouse), "media_id",
      mediaHashPath(warehouse), "media_id", "warn")
    // write-order violations (impossible under the contracts)
    missingFrom("headless_shingles", shinglePath(warehouse), "doc_id",
      docsPath(warehouse), "doc_id", "error")
    // ghost pair references that escaped the probe guards
    ghostPairs("ghost_pair_refs", pairsPath(warehouse), "doc_a", "doc_b",
      shinglePath(warehouse), "doc_id")
    ghostPairs("ghost_emb_pair_refs", embPairsPath(warehouse), "vec_a",
      "vec_b", embVecsPath(warehouse), "vec_id")
    ghostPairs("ghost_sem_pair_refs", semPairsPath(warehouse), "vec_a",
      "vec_b", embVecsPath(warehouse), "vec_id")
    ghostPairs("ghost_media_pair_refs", mediaPairsPath(warehouse), "media_a",
      "media_b", mediaHashPath(warehouse), "media_id")
    // takedown leaks
    tombLeak("tombstone_leak", tombPath(warehouse), shinglePath(warehouse),
      "doc_id")
    tombLeak("emb_tombstone_leak", embTombPath(warehouse),
      embVecsPath(warehouse), "vec_id")
    tombLeak("media_tombstone_leak", mediaTombPath(warehouse),
      mediaHashPath(warehouse), "media_id")
    // crash-parked rewrite swaps anywhere under the warehouse: the table's
    // data is complete but parked at ._compact_old with the live path
    // absent — reads fail until Sinks.recoverSwap (or the next write on
    // the table) restores the rename, so surface every one (warn: a
    // documented crash state with a one-call heal). Reported by
    // warehouse-RELATIVE name so same-basename tables stay distinct.
    Sinks.parkedSwapTables(spark, warehouse).foreach { case (_, rel) =>
      out += (("parked_swap", rel, 1L, "warn"))
    }
    // label-store / pair-table consistency
    labelChecks(ccLabelsPath(warehouse), pairsPath(warehouse),
      "doc_a", "doc_b")
    labelChecks(embCcPath(warehouse), embPairsPath(warehouse),
      "vec_a", "vec_b")
    labelChecks(semCcPath(warehouse), semPairsPath(warehouse),
      "vec_a", "vec_b")
    labelChecks(mediaCcPath(warehouse), mediaPairsPath(warehouse),
      "media_a", "media_b")
    // ledger presence / ordering
    def fileExists(p: String) = Sinks.pathExists(spark, p)
    for (pp <- Seq(pairsPath(warehouse), embPairsPath(warehouse),
      semPairsPath(warehouse), mediaPairsPath(warehouse))
      if fileExists(pp))
      out += (("missing_threshold_ledger", short(pp),
        if (fileExists(pp + "._threshold")) 0L else 1L, "error"))
    for (bp <- Seq(bandPath(warehouse), embBandsPath(warehouse),
      mediaBandsPath(warehouse), semAsgPath(warehouse))
      if fileExists(bp))
      out += (("missing_params_ledger", short(bp),
        if (fileExists(bp + "._params")) 0L else 1L, "warn"))
    for (st <- Seq(stagedPath(warehouse), stagedEmbPath(warehouse),
      stagedMediaPath(warehouse)) if fileExists(st)) {
      val promoted = readLongLedger(spark, st + "._promoted_upto")
      val ingested = readLongLedger(spark, st + "._ingested_upto")
      out += (("ingest_ledger_ahead", short(st),
        if (ingested > promoted) 1L else 0L, "error"))
    }
    // the AUDITOR is audited too: the compliance trail's own invariants.
    // Seq numbering is stamp-first under the lease, so per event (one
    // (seq, at_ms, op, n_ids) write): a seq shared by two DISTINCT events
    // is impossible under the contracts and would fabricate one takedown
    // out of two — error. A seq GAP (ledger stamped, rows never landed)
    // is the documented crash window — the trail under-reports, warn.
    // The ledger must never trail the log (that is how a seq gets
    // reused) — error; ledger ahead of the log is the same crash window
    // as a gap — warn. Legacy rows (seq = -1, pre-ledger files) are
    // outside the numbering contract and excluded.
    if (fileExists(auditPath(warehouse))) {
      val numbered = readAudit(spark, warehouse).filter(col("seq") >= 0)
      val events = numbered
        .select(col("seq"), col("at_ms"), col("op"), col("id_col"),
          col("n_ids")).distinct()
      out += (("audit_duplicate_seq", "audit_log",
        events.groupBy(col("seq")).agg(count(lit(1)).as("n"))
          .filter(col("n") > 1).count(), "error"))
      val r = events.agg(max(col("seq")), count(lit(1))).head()
      val (logMax, nSeq) =
        (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))
      out += (("audit_seq_gaps", "audit_log",
        math.max(0L, logMax + 1L - nSeq), "warn"))
      // an ABSENT ledger is the documented legacy state (pre-ledger log;
      // appendAudit's scan fallback keeps numbering correct), so the
      // ordering checks only run against a ledger that exists
      if (fileExists(auditSeqLedger(warehouse))) {
        val ledger = readLongLedger(spark, auditSeqLedger(warehouse))
        out += (("audit_seq_ledger_behind", "audit_log",
          if (ledger < logMax) 1L else 0L, "error"))
        out += (("audit_seq_ledger_ahead", "audit_log",
          if (ledger > logMax) 1L else 0L, "warn"))
      }
    }
    // snapshot manifests: an uncommitted dir is snapshotCorpus' documented
    // crash window (manifest landed, commit marker didn't) — invisible to
    // every read, warn, repair clears it. A COMMITTED manifest whose row
    // count drifts from its commit marker should be impossible (the
    // marker lands last, over a finished manifest) — error.
    {
      val (snaps, torn) = scanSnapshots(spark, warehouse)
      out += (("snapshot_uncommitted", "snapshots", torn.size.toLong,
        "warn"))
      val drifted = snaps.count { ts =>
        val dir = snapDirOf(warehouse, ts)
        Sinks.readBucketedPath(spark, dir).count() !=
          readLongLedger(spark, snapCommitLedger(dir))
      }
      out += (("snapshot_manifest_drift", "snapshots", drifted.toLong,
        "error"))
    }
    // export manifests: same commit protocol, same reachability — an
    // uncommitted dir is exportCorpus' crash window (warn, repair
    // clears); a committed manifest disagreeing with its marker count
    // should be impossible (error).
    {
      val (exps, torn) = scanExports(spark, warehouse)
      out += (("export_uncommitted", "exports", torn.size.toLong, "warn"))
      val drifted = exps.count { ts =>
        val dir = exportDirOf(warehouse, ts)
        Sinks.readBucketedPath(spark, dir).count() !=
          readLongLedger(spark, exportCommitLedger(dir))
      }
      out += (("export_manifest_drift", "exports", drifted.toLong, "error"))
    }
    out.toSeq.toDF("check", "table", "violations", "severity")
      .orderBy(col("severity"), col("check"), col("table"))
  }

  /** MECHANICAL REPAIR — the write-side companion to `fsck`: applies, in
    * one leased call, every heal that is safe WITHOUT re-running a drop:
    *
    *   1. `recovered_swap` — restore every crash-parked table under the
    *      warehouse (`Sinks.parkedSwaps` → `recoverSwap`).
    *   2. `cleared_torn_label_create` — remove label directories whose
    *      spec ledger never landed (reads already ignore them; clearing
    *      unblocks the next writer without waiting for a drop).
    *   3. `rebuilt_label_store` — any label store whose node set drifted
    *      from its pair table (pair ids the merge never covered, or
    *      orphan label nodes) is rebuilt from the pair table — the same
    *      full-contraction rebuild the delete cascades use.
    *
    * Crash residue that needs the ORIGINAL drop's data — orphan band/
    * assignment rows, stranded docs, ghost pair refs — is deliberately
    * NOT touched: only the drop's retry can heal those, and `fsck` keeps
    * reporting them until it does. Returns (action, table) rows for the
    * audit trail; a healthy warehouse returns an empty frame.
    */
  def repair(spark: SparkSession, warehouse: String): DataFrame =
      graft.core.WarehouseLease.withWriteLease(spark, warehouse) {
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    def short(p: String) = p.split('/').takeRight(1).mkString
    // warehouse-relative names keep same-basename tables distinct in both
    // the result and the audit keys (the walk covers the whole tree)
    Sinks.parkedSwapTables(spark, warehouse).foreach { case (table, rel) =>
      if (Sinks.recoverSwap(spark, table))
        out += (("recovered_swap", rel))
    }
    val labelStores = Seq(
      (ccLabelsPath(warehouse), pairsPath(warehouse), "doc_a", "doc_b"),
      (embCcPath(warehouse), embPairsPath(warehouse), "vec_a", "vec_b"),
      (semCcPath(warehouse), semPairsPath(warehouse), "vec_a", "vec_b"),
      (mediaCcPath(warehouse), mediaPairsPath(warehouse),
        "media_a", "media_b"))
    labelStores.foreach { case (labelP, pairsP, a, b) =>
      if (Sinks.pathExists(spark, labelP) &&
          !Sinks.isBucketedStore(spark, labelP)) {
        dropStore(spark, labelP)
        out += (("cleared_torn_label_create", short(labelP)))
      } else if (Sinks.pathExists(spark, labelP) &&
                 Sinks.isBucketedStore(spark, labelP) &&
                 Sinks.pathExists(spark, pairsP)) {
        // the SAME drift invariant fsck reports — shared helper, so the
        // audit and the heal can never diverge. Both tables must be
        // present (the swap-recovery step above already restored parked
        // ones); a genuinely absent pair table is ambiguous and repair
        // never drops data on ambiguity.
        val (missing, orphan) = labelDrift(spark, labelP, pairsP, a, b)
        if (missing + orphan > 0) {
          rebuildLabels(spark, labelP, pairsP, a, b)
          out += (("rebuilt_label_store", short(labelP)))
        }
      }
    }
    // uncommitted snapshot dirs are snapshotCorpus' documented crash
    // residue (manifest landed, commit marker didn't) — invisible to
    // every read, so clearing loses nothing a snapshot retry can't
    // recreate
    scanSnapshots(spark, warehouse)._2.foreach { d =>
      dropStore(spark, d)
      out += (("cleared_uncommitted_snapshot", short(d)))
    }
    // same protocol, same recovery: an uncommitted export dir is invisible
    // to every read and an export retry recreates it exactly
    scanExports(spark, warehouse)._2.foreach { d =>
      dropStore(spark, d)
      out += (("cleared_uncommitted_export", short(d)))
    }
    // the repair itself is a governance-grade event: record WHICH actions
    // ran (the counts columns carry no row delta for a repair — zeroed)
    if (out.nonEmpty)
      appendAudit(spark, warehouse, "repair", "n/a", 0L,
        out.map { case (act, t) => s"$act.$t" -> ((0L, 0L)) }.toMap)
    out.toSeq.toDF("action", "table")
  }

  /** The deduplicated corpus view: keep-the-minimum canonical per near-dup
    * cluster over the CUMULATIVE pair table. Losers come off the
    * incrementally-maintained label store when present — a co-located
    * argmax scan plus one anti-join shipping loser ids; the full-graph
    * contraction runs only as the fallback (legacy warehouses, or right
    * after a governance delete dropped the store).
    */
  def survivors(spark: SparkSession, warehouse: String): DataFrame = {
    val docs = readStore(spark, docsPath(warehouse))
    // lease-free view: storePresent FAILS on a crash-parked pair table
    // instead of silently serving every duplicate (run repair() first)
    if (!Sinks.storePresent(spark, pairsPath(warehouse))) docs
    else docs.join(
      losersFor(spark, ccLabelsPath(warehouse), pairsPath(warehouse),
        "doc_a", "doc_b", "doc_id"),
      Seq("doc_id"), "left_anti")
  }
}
