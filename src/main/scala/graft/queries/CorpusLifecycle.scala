package graft.queries

import java.util.concurrent.ConcurrentHashMap

import graft.{QueryDef, Tables}
import graft.app.CorpusIngest
import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-backed declared queries for the WAREHOUSE read paths a training
  * run and a compliance pass actually consume — `curatedSurvivors` (the
  * cross-modality curated corpus view) and `governanceAudit` (the durable
  * takedown trail). The single-modality survivor views have had hash-exact
  * oracle locks since their rounds (`dedup_survivors`,
  * `dedup_embedding_survivors`); these two close the gap for the composed
  * views, exercising the REAL ingest → store → view lifecycle rather than
  * an in-plan re-derivation: each query drives the actual
  * `CorpusIngest` entry points against a scratch warehouse built once per
  * (fixture, scenario) and memoized for the process, then returns the
  * view. Every ingest/governance step is deterministic (MinHash/sign-LSH
  * geometry is arithmetic, component labels are keep-the-minimum, ids are
  * sorted before deletes), so the view is a pure function of the fixture
  * and the DuckDB oracle can recompute it from the same parquet.
  *
  * Scale note: the scratch warehouses are fixture-sized and the build cost
  * is paid once per process (bench's unreported warmup pass absorbs it);
  * the MEASURED cost of each query is the view read itself — label-store
  * argmax scans plus id-sized joins, the same shape the 100 TB read has.
  */
object CorpusLifecycle {

  // one scratch warehouse per (scenario, fixture dir), built on first use —
  // ConcurrentHashMap so Verify/Bench/test callers can never double-build.
  // The memo's contract is PROCESS-LIFETIME: a warehouse built for one
  // (scenario, fixture) serves every later query of the same JVM (bench's
  // warmup pass builds them once; the measured passes read views only),
  // and the shutdown hook below removes the scratch roots at JVM exit —
  // no graft-*-wh residue outlives a bench/Verify/test run.
  private val memo = new ConcurrentHashMap[String, String]()

  // every scratch root ever created, for the exit-time sweep
  private val scratchRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  private def scratchDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    scratchRoots.add(d)
    d.toString
  }

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchRoots.forEach { root =>
        try {
          java.nio.file.Files.walk(root)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        } catch { case _: Exception => () } // best effort at exit
      }, "graft-corpus-lifecycle-scratch-sweep"))
  }

  /** Identity cross-modality link fixture: content_key = id for both
    * modalities, so a document and the embedding with the same id are
    * declared the same content. The fixtures' vec_id range is a subset of
    * the doc_id range, which makes the restriction non-vacuous: a doc
    * whose same-id vector lost its cosine cluster drops out of the
    * curated view even when its text survived the Jaccard cut.
    */
  private def identityLinks(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").as("content_key"), lit("doc").as("modality"),
        col("doc_id").as("id"))
      .unionByName(Tables.embeddings(s, dir)
        .select(col("vec_id").as("content_key"), lit("vec").as("modality"),
          col("vec_id").as("id")))

  /** Scratch warehouse for the curated view: one text drop (the full
    * documents fixture, threshold 0.5 — `dedup_survivors`' regime), one
    * embedding drop (threshold 0.42 — `dedup_embedding_survivors`'
    * regime), identity links. No sem/media state, so the curated
    * restriction is exactly "docs whose linked vector lost a cosine
    * cluster".
    */
  private def curatedWarehouse(s: SparkSession, dir: String): String =
    memo.computeIfAbsent(s"curated|$dir", { _ =>
      val wh = scratchDir("graft-curated-wh")
      CorpusIngest.run(s, Tables.documents(s, dir), wh, threshold = 0.5)
      CorpusIngest.ingestEmbeddings(s, Tables.embeddings(s, dir), wh,
        threshold = 0.42)
      CorpusIngest.registerLinks(s, wh, identityLinks(s, dir))
      wh
    })

  /** Scratch warehouse for the audit trail: a deterministic governance
    * SCENARIO over a thin subset (doc_id % 5 = 0) — delete the two
    * smallest ids, reinstate the smallest, delete the third-smallest —
    * three audited events whose per-table row counts the oracle
    * recomputes from the fixture alone.
    */
  private def auditWarehouse(s: SparkSession, dir: String): String =
    memo.computeIfAbsent(s"audit|$dir", { _ =>
      val wh = scratchDir("graft-audit-wh")
      val subset = Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)
      CorpusIngest.run(s, subset, wh, threshold = 0.5)
      // human-scale id lists, driver-side by design (the delete APIs take
      // Seq[Long]); sorted so the scenario is order-deterministic
      val ids = subset.select("doc_id").orderBy("doc_id")
        .limit(3).collect().map(_.getLong(0)).toSeq
      CorpusIngest.delete(s, wh, ids.take(2))
      CorpusIngest.reinstate(s, wh, Seq(ids.head))
      CorpusIngest.delete(s, wh, Seq(ids(2)))
      wh
    })

  /** The curated-view oracle: the two already-locked survivor oracles —
    * the MinHash chain for text survivors, the sign-LSH chain for vector
    * losers — composed as nested recursive CTE scopes (their CTE names
    * collide, so each chain gets its own derived-table scope), restricted
    * by the identity linkage. `extraPred` appends further curated-set
    * predicates (the snapshot query's takedown exclusion).
    */
  private def curatedSql(extraPred: String): String =
    curatedSqlWhere("TRUE", extraPred)

  /** `curatedSql` restricted to the `documents` rows matching `docPred` —
    * how the oracle replays the curated set as of an EARLIER corpus state
    * (before a later drop, or after a takedown): the text chain runs over
    * the restricted docs (pairwise pairs make that exactly the historical
    * pair table), while the vector-loser side stays unrestricted (the
    * scenarios ingest embeddings once, up front).
    */
  private def curatedSqlWhere(docPred: String, extraPred: String): String =
    s"""SELECT sv.doc_id, sv.lang, sv.n_chars FROM (
       |  WITH RECURSIVE ${DedupOps.duckMinhashCtesWhere(docPred)},
       |  p AS (SELECT doc_a, doc_b FROM v
       |        WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5),
       |  edges AS (SELECT doc_a AS s, doc_b AS t FROM p
       |            UNION SELECT doc_b, doc_a FROM p),
       |  reach(s, t) AS (
       |    SELECT s, t FROM edges
       |    UNION
       |    SELECT r.s, e2.t FROM reach r JOIN edges e2 ON r.t = e2.s),
       |  lab AS (SELECT s AS doc_id, least(s, min(t)) AS cluster_id
       |          FROM reach GROUP BY s)
       |  SELECT d.doc_id, d.lang, d.n_chars FROM documents d
       |  WHERE ($docPred) AND d.doc_id NOT IN
       |    (SELECT doc_id FROM lab WHERE doc_id <> cluster_id)
       |) sv
       |WHERE sv.doc_id NOT IN (
       |  SELECT vl.vec_id FROM (
       |    WITH RECURSIVE ${DedupOps.duckEmbLshCtes},
       |    p AS (SELECT vec_a, vec_b FROM v WHERE cos >= 0.42),
       |    edges AS (SELECT vec_a AS s, vec_b AS t FROM p
       |              UNION SELECT vec_b, vec_a FROM p),
       |    reach(s, t) AS (
       |      SELECT s, t FROM edges
       |      UNION
       |      SELECT r.s, e2.t FROM reach r JOIN edges e2 ON r.t = e2.s),
       |    lab AS (SELECT s AS vec_id, least(s, min(t)) AS cluster_id
       |            FROM reach GROUP BY s)
       |    SELECT vec_id FROM lab WHERE vec_id <> cluster_id
       |  ) vl)$extraPred
       |ORDER BY sv.doc_id""".stripMargin

  /** Scratch warehouse for the snapshot and export read paths: the
    * curated build (text drop + embedding drop + identity links), PIN it
    * with `snapshotCorpus`, EXPORT the pinned membership into 8 shards,
    * then take down the smallest doc_id — so the queries read artifacts
    * that are both PINNED (the label churn the delete causes must not
    * move them) and takedown-filtered (the removed doc must be absent
    * even though the manifests still name it, and every surviving doc
    * must keep its pre-takedown shard placement). Returns
    * (warehouse, snapshot stamp, export stamp).
    */
  private def snapshotWarehouse(s: SparkSession,
                                dir: String): (String, Long, Long) = {
    val v = memo.computeIfAbsent(s"snapshot|$dir", { _ =>
      val wh = scratchDir("graft-snap-wh")
      CorpusIngest.run(s, Tables.documents(s, dir), wh, threshold = 0.5)
      CorpusIngest.ingestEmbeddings(s, Tables.embeddings(s, dir), wh,
        threshold = 0.42)
      CorpusIngest.registerLinks(s, wh, identityLinks(s, dir))
      val ts = CorpusIngest.snapshotCorpus(s, wh)
      val ex = CorpusIngest.exportCorpus(s, wh, asOfMs = ts, numShards = 8)
      val minId = Tables.documents(s, dir)
        .agg(min(col("doc_id"))).head().getLong(0)
      CorpusIngest.delete(s, wh, Seq(minId))
      s"$wh|$ts|$ex"
    })
    val parts = v.split('|')
    (parts.dropRight(2).mkString("|"), parts(parts.length - 2).toLong,
      parts.last.toLong)
  }

  /** Scratch warehouse for the corpus-EVOLUTION read paths: drop 1 is a
    * doc subset (doc_id % 3 <> 0), pinned (snap 1) and exported; drop 2
    * adds the remainder (new-old pairs can DEMOTE old keepers when the
    * newcomer has a smaller id); then a takedown of the smallest doc_id,
    * and the post-delete corpus is pinned again (snap 2) and
    * `extendExport`ed on top of export 1. The diff between the pins and
    * the extended manifest both read real adds, removes, demotions, and a
    * takedown at once. Returns (warehouse, snap1, export1, snap2,
    * export2).
    */
  private def evolveWarehouse(s: SparkSession,
                              dir: String): (String, Long, Long, Long, Long) = {
    val v = memo.computeIfAbsent(s"evolve|$dir", { _ =>
      val wh = scratchDir("graft-evolve-wh")
      val docs = Tables.documents(s, dir)
      CorpusIngest.run(s, docs.filter(col("doc_id") % 3 =!= 0), wh,
        threshold = 0.5)
      CorpusIngest.ingestEmbeddings(s, Tables.embeddings(s, dir), wh,
        threshold = 0.42)
      CorpusIngest.registerLinks(s, wh, identityLinks(s, dir))
      val ts1 = CorpusIngest.snapshotCorpus(s, wh)
      val ex1 = CorpusIngest.exportCorpus(s, wh, asOfMs = ts1, numShards = 8)
      CorpusIngest.run(s, docs.filter(col("doc_id") % 3 === 0), wh,
        threshold = 0.5)
      val minId = docs.agg(min(col("doc_id"))).head().getLong(0)
      CorpusIngest.delete(s, wh, Seq(minId))
      val ts2 = CorpusIngest.snapshotCorpus(s, wh)
      val ex2 = CorpusIngest.extendExport(s, wh, baseExportTs = ex1,
        asOfMs = ts2)
      s"$wh|$ts1|$ex1|$ts2|$ex2"
    })
    val parts = v.split('|')
    (parts.dropRight(4).mkString("|"),
      parts(parts.length - 4).toLong, parts(parts.length - 3).toLong,
      parts(parts.length - 2).toLong, parts.last.toLong)
  }

  // the evolve scenario's two pinned memberships, as oracle fragments:
  // snap 1 = the curated chain over drop 1's subset; snap 2 = the chain
  // over the post-takedown corpus (pairwise pairs make the doc_id
  // restriction exactly the purged pair table the delete leaves)
  private val evolveSnap1Pred = "doc_id % 3 <> 0"
  private val evolveSnap2Pred =
    "doc_id <> (SELECT min(doc_id) FROM documents)"

  /** Scratch warehouse for the RETENTION read paths: a docs-only corpus
    * (doc_id % 5 = 1, threshold 0.5 — curatedSurvivors degenerates to the
    * text survivors view), pinned three times at explicit stamps 1000/
    * 2000/3000 (the clock default would make the census nondeterministic),
    * exported twice from the same pin (stamps 100/200), then both
    * retention sweeps run with keepLast = 1 — so the census queries read
    * the post-expiry state: exactly one surviving snapshot and one
    * surviving export, both with fixture-derivable counts.
    */
  private val expirePred = "doc_id % 5 = 1"

  private def expireWarehouse(s: SparkSession, dir: String): String =
    memo.computeIfAbsent(s"expire|$dir", { _ =>
      val wh = scratchDir("graft-expire-wh")
      CorpusIngest.run(s,
        Tables.documents(s, dir).filter(col("doc_id") % 5 === 1), wh,
        threshold = 0.5)
      CorpusIngest.snapshotCorpus(s, wh, atMs = Some(1000L))
      CorpusIngest.snapshotCorpus(s, wh, atMs = Some(2000L))
      CorpusIngest.snapshotCorpus(s, wh, atMs = Some(3000L))
      CorpusIngest.exportCorpus(s, wh, asOfMs = 3000L, numShards = 8,
        atMs = Some(100L))
      CorpusIngest.exportCorpus(s, wh, asOfMs = 3000L, numShards = 8,
        atMs = Some(200L))
      CorpusIngest.expireCorpusSnapshots(s, wh, keepLast = 1)
      CorpusIngest.expireCorpusExports(s, wh, keepLast = 1)
      wh
    })

  /** Scratch warehouse for the REPAIR read path: a thin text corpus
    * (doc_id % 7 = 0), then the two mechanically-healable crash states
    * planted by hand — a crash-parked rewrite swap (`corpus/doc_stats`
    * renamed to `._compact_old`, live path gone) and a torn label-store
    * create (`corpus/cc_labels` directory present without its spec
    * ledger) — and one `repair` call. The query reads the repair's
    * GOVERNANCE AUDIT rows: deterministic regardless of fixture size
    * (both plants are layout-level, and run() itself logs no audit
    * events, so the repair is seq 0).
    */
  private def repairWarehouse(s: SparkSession, dir: String): String =
    memo.computeIfAbsent(s"repair|$dir", { _ =>
      val wh = scratchDir("graft-repair-wh")
      CorpusIngest.run(s, Tables.documents(s, dir).filter(col("doc_id") % 7 === 0),
        wh, threshold = 0.5)
      val conf = s.sparkContext.hadoopConfiguration
      // plant 1 — crash-parked swap: the state a process dying between
      // swapInto's two renames leaves (data complete at ._compact_old)
      val stats = new org.apache.hadoop.fs.Path(s"$wh/corpus/doc_stats")
      val fs = stats.getFileSystem(conf)
      require(fs.rename(stats,
        new org.apache.hadoop.fs.Path(s"$wh/corpus/doc_stats._compact_old")),
        "repair scenario: could not park doc_stats")
      // plant 2 — torn label-store create: directory without its spec
      // ledger (reads already ignore it; repair clears it). The subset may
      // or may not have produced a real store — deleting the ledger (or
      // creating a bare dir) lands the same torn state either way.
      val labels = new org.apache.hadoop.fs.Path(s"$wh/corpus/cc_labels")
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$wh/corpus/cc_labels._bucketspec"), false)
      if (!fs.exists(labels)) fs.mkdirs(labels)
      CorpusIngest.repair(s, wh)
      wh
    })

  /** Scratch warehouse for the DIRTY fsck read path: a full text corpus,
    * then five violation classes planted by hand — each one a state a
    * specific crash or operator mistake leaves, each with an exactly
    * fixture-independent finding count:
    *
    *   1. a GHOST PAIR: one pair row appended whose both sides name doc
    *      ids that exist nowhere (the state a crash between the pair
    *      append and the shingle commit point leaves) — ghost_pair_refs 2,
    *      and the same two ids are pair evidence the label merge never
    *      covered — label_missing_nodes 2 (both warn: a retry heals).
    *   2. the pair table's THRESHOLD ledger removed (hand surgery /
    *      partial restore) — missing_threshold_ledger 1, error.
    *   3. the band store's PARAMS ledger removed — missing_params_ledger
    *      1, warn.
    *   4. `corpus/doc_stats` crash-parked mid-swap (live renamed to
    *      `._compact_old`) — parked_swap 1, warn.
    *   5. a staged landing whose INGEST ledger ran ahead of its promote
    *      ledger (impossible under the write order) — ingest_ledger_ahead
    *      1, error.
    *
    * The query locks the EXACT finding rows (violations > 0) against a
    * VALUES oracle — the true-positive half of the audit contract;
    * `corpus_fsck_clean` locks the false-positive half.
    */
  private def dirtyWarehouse(s: SparkSession, dir: String): String =
    memo.computeIfAbsent(s"dirty|$dir", { _ =>
      val wh = scratchDir("graft-dirty-wh")
      CorpusIngest.run(s, Tables.documents(s, dir), wh, threshold = 0.5)
      val conf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(wh).getFileSystem(conf)
      // plant 1 — ghost pair: both sides outside any fixture's id space.
      // Shape-preserving: one REAL pair row re-keyed, so the append
      // matches the store schema whatever the verifier adds to it.
      val pairsP = graft.app.CorpusStore.pairsPath(wh)
      val pairs = graft.app.CorpusStore.readStore(s, pairsP)
      val ghost = pairs.limit(1)
        .withColumn("doc_a",
          lit(900000001L).cast(pairs.schema("doc_a").dataType))
        .withColumn("doc_b",
          lit(900000002L).cast(pairs.schema("doc_b").dataType))
      graft.core.Sinks.bucketedIdempotentAppend(ghost, pairsP,
        keys = Seq("doc_a", "doc_b"), bucketKeys = Seq("doc_a", "doc_b"),
        buckets = 1)
      // plants 2 + 3 — sibling ledgers removed
      fs.delete(new org.apache.hadoop.fs.Path(pairsP + "._threshold"), false)
      fs.delete(new org.apache.hadoop.fs.Path(
        graft.app.CorpusStore.bandPath(wh) + "._params"), false)
      // plant 4 — crash-parked rewrite swap on doc_stats
      val stats = new org.apache.hadoop.fs.Path(
        graft.app.CorpusStore.statsPath(wh))
      require(fs.rename(stats, new org.apache.hadoop.fs.Path(
        stats.toString + "._compact_old")),
        "dirty scenario: could not park doc_stats")
      // plant 5 — staged landing with the ingest ledger ahead of promote
      val staged = graft.app.CorpusStore.stagedPath(wh)
      fs.mkdirs(new org.apache.hadoop.fs.Path(staged))
      graft.app.CorpusStore.writeLongLedger(s, staged + "._ingested_upto", 5L)
      // plant 6 — writeAtomic's crash residue next to a LIVE table (a
      // writer died between its temp create and the publish rename).
      // Backdated past the census age bound: fsck only counts residue
      // older than TmpResidueMinAgeMs (a fresh temp is presumed a live
      // writer's in-flight file), and this plant models a long-dead one.
      val residue = new org.apache.hadoop.fs.Path(
        graft.app.CorpusStore.docsPath(wh) + "._watermark.tmp-deadbeef")
      val ro = fs.create(residue, true)
      try ro.write("torn".getBytes("UTF-8")) finally ro.close()
      fs.setTimes(residue, System.currentTimeMillis() - 3600_000L, -1L)
      wh
    })

  /** Scratch warehouse for the AUDIT-TRAIL self-check read path: the
    * compliance log's own fsck invariants under its documented crash
    * window. Two real governance deletes land events seq 0 and seq 1;
    * then the crash window is planted — the seq LEDGER stamped to 2 with
    * no rows behind it (exactly the state a crash between appendAudit's
    * stamp and its row append leaves) — and a third real delete lands at
    * seq 3, leaving the gap at 2 in the log forever. Finally the ledger
    * is stamped ahead once more (the same window, not yet consumed by a
    * next event). fsck must report exactly: one seq gap (the trail
    * under-reports — warn) and the ledger ahead of the log (warn), and
    * nothing else — the deletes' cascades leave no dedup-side residue.
    */
  private def auditChecksWarehouse(s: SparkSession, dir: String): String =
    memo.computeIfAbsent(s"auditchecks|$dir", { _ =>
      val wh = scratchDir("graft-auditck-wh")
      val subset = Tables.documents(s, dir).filter(col("doc_id") % 9 === 0)
      CorpusIngest.run(s, subset, wh, threshold = 0.5)
      val ids = subset.select("doc_id").orderBy("doc_id")
        .limit(3).collect().map(_.getLong(0)).toSeq
      CorpusIngest.delete(s, wh, Seq(ids(0)))          // event seq 0
      CorpusIngest.delete(s, wh, Seq(ids(1)))          // event seq 1
      // the crash window: ledger stamped, rows never landed
      graft.app.CorpusStore.writeLongLedger(s,
        graft.app.Governance.auditSeqLedger(wh), 2L)
      CorpusIngest.delete(s, wh, Seq(ids(2)))          // event seq 3
      graft.app.CorpusStore.writeLongLedger(s,
        graft.app.Governance.auditSeqLedger(wh), 10L)  // window again
      wh
    })

  /** Scratch warehouse for the audit self-checks' ERROR side — the
    * states the write contracts make impossible, reached here only by
    * corrupting the ledger by hand: rewinding the seq ledger BELOW the
    * log makes the next real event REUSE a seq (two distinct events
    * share seq 1 — the one-takedown-fabricated-out-of-two state the
    * stamp-first ordering exists to prevent), and a final rewind leaves
    * the ledger behind the log (the reuse precondition itself). The gap
    * count stays zero by arithmetic (three distinct events, max seq 1).
    */
  private def auditErrWarehouse(s: SparkSession, dir: String): String =
    memo.computeIfAbsent(s"auditerr|$dir", { _ =>
      val wh = scratchDir("graft-auditerr-wh")
      val subset = Tables.documents(s, dir).filter(col("doc_id") % 10 === 3)
      CorpusIngest.run(s, subset, wh, threshold = 0.5)
      val ids = subset.select("doc_id").orderBy("doc_id")
        .limit(3).collect().map(_.getLong(0)).toSeq
      CorpusIngest.delete(s, wh, Seq(ids(0)))          // event seq 0
      CorpusIngest.delete(s, wh, Seq(ids(1)))          // event seq 1
      // corrupt: rewind the ledger below the log...
      graft.app.CorpusStore.writeLongLedger(s,
        graft.app.Governance.auditSeqLedger(wh), 0L)
      CorpusIngest.delete(s, wh, Seq(ids(2)))          // ...seq 1 REUSED
      // ...and leave it rewound again (behind the log's max)
      graft.app.CorpusStore.writeLongLedger(s,
        graft.app.Governance.auditSeqLedger(wh), 0L)
      wh
    })

  /** Scratch warehouse for the UNIFIED-takedown read path: text and
    * embedding subsets (ids % 11 = 0), identity links for both
    * modalities, then ONE `forget` of the smallest content key present in
    * BOTH id spaces — so the audit trail must show the full resolution
    * across all four events: the doc cascade (seq 0), the embedding
    * cascade (seq 1), the media cascade (seq 2), and the forget marker
    * with the link purge (seq 3).
    */
  private def forgetWarehouse(s: SparkSession, dir: String): String =
    memo.computeIfAbsent(s"forget|$dir", { _ =>
      val wh = scratchDir("graft-forget-wh")
      val docs = Tables.documents(s, dir).filter(col("doc_id") % 11 === 0)
      val vecs = Tables.embeddings(s, dir).filter(col("vec_id") % 11 === 0)
      CorpusIngest.run(s, docs, wh, threshold = 0.5)
      CorpusIngest.ingestEmbeddings(s, vecs, wh, threshold = 0.42)
      // media ids reuse the doc subset's id space (the synthetic corpus
      // renders one decodable PNG per id), so the media counts the oracle
      // locks are the SAME fixture count as the documents'
      CorpusIngest.ingestMedia(s,
        graft.operators.Multimodal.syntheticImageCorpus(
          docs.select(col("doc_id"))), wh)
      CorpusIngest.registerLinks(s, wh,
        docs.select(col("doc_id").as("content_key"),
          lit("doc").as("modality"), col("doc_id").as("id"))
          .unionByName(vecs.select(col("vec_id").as("content_key"),
            lit("vec").as("modality"), col("vec_id").as("id")))
          .unionByName(docs.select(col("doc_id").as("content_key"),
            lit("media").as("modality"), col("doc_id").as("id"))))
      val k = docs.join(vecs, col("doc_id") === col("vec_id"), "left_semi")
        .agg(min(col("doc_id"))).head().getLong(0)
      CorpusIngest.forget(s, wh, Seq(k))
      wh
    })

  /** Scratch warehouse for the one-stop STATUS read: a thin corpus
    * (doc_id % 6 = 1), pinned at explicit stamp 1000 (audit seq 0),
    * exported from that pin at stamp 100 (seq 1), one takedown (seq 2 —
    * the audit head the status must report), and finally `doc_stats`
    * crash-parked by hand — the "run repair" signal the read exists to
    * surface. The park lands LAST: every leased entry point heals parks
    * on entry, and the status read itself is lease-free by design, so
    * the planted state survives any number of status reads.
    */
  private val statusPred = "doc_id % 6 = 1"

  private def statusWarehouse(s: SparkSession, dir: String): String =
    memo.computeIfAbsent(s"status|$dir", { _ =>
      val wh = scratchDir("graft-status-wh")
      CorpusIngest.run(s,
        Tables.documents(s, dir).filter(col("doc_id") % 6 === 1), wh,
        threshold = 0.5)
      CorpusIngest.snapshotCorpus(s, wh, atMs = Some(1000L))  // audit seq 0
      CorpusIngest.exportCorpus(s, wh, asOfMs = 1000L, numShards = 8,
        atMs = Some(100L))                                    // audit seq 1
      val minId = Tables.documents(s, dir).filter(col("doc_id") % 6 === 1)
        .agg(min(col("doc_id"))).head().getLong(0)
      CorpusIngest.delete(s, wh, Seq(minId))                  // audit seq 2
      val stats = new org.apache.hadoop.fs.Path(
        graft.app.CorpusStore.statsPath(wh))
      val fs = stats.getFileSystem(s.sparkContext.hadoopConfiguration)
      require(fs.rename(stats, new org.apache.hadoop.fs.Path(
        stats.toString + "._compact_old")),
        "status scenario: could not park doc_stats")
      wh
    })

  /** Scratch warehouse for the SEM-RETRAIN lifecycle: ingest the full
    * embeddings fixture (vector store lands), then `retrainSemStore` —
    * fresh integerized-Lloyd centroids over the CURRENT store, assignment
    * and pair tables rebuilt under them, centroids persisted to
    * `corpus/sem_cents`. The retrained state must be indistinguishable
    * from the batch SemDeDup chain over the same vectors.
    */
  private def retrainWarehouse(s: SparkSession, dir: String): String =
    memo.computeIfAbsent(s"retrain|$dir", { _ =>
      val wh = scratchDir("graft-retrain-wh")
      CorpusIngest.ingestEmbeddings(s, Tables.embeddings(s, dir), wh,
        threshold = 0.42)
      CorpusIngest.retrainSemStore(s, wh, k = 8, iters = 3,
        semThreshold = 0.42)
      wh
    })

  /** The text survivor COUNT over `docPred` as a DuckDB scalar subquery —
    * what the snapshot commit markers and export manifests census (the
    * expire scenario is docs-only, so curated membership = text
    * survivors).
    */
  private def survivorCountSql(docPred: String): String =
    s"""SELECT CAST(count(*) AS BIGINT) FROM (
       |  WITH RECURSIVE ${DedupOps.duckMinhashCtesWhere(docPred)},
       |  p AS (SELECT doc_a, doc_b FROM v
       |        WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5),
       |  edges AS (SELECT doc_a AS s, doc_b AS t FROM p
       |            UNION SELECT doc_b, doc_a FROM p),
       |  reach(s, t) AS (
       |    SELECT s, t FROM edges
       |    UNION
       |    SELECT r.s, e2.t FROM reach r JOIN edges e2 ON r.t = e2.s),
       |  lab AS (SELECT s AS doc_id, least(s, min(t)) AS cluster_id
       |          FROM reach GROUP BY s)
       |  SELECT d.doc_id FROM documents d
       |  WHERE ($docPred) AND d.doc_id NOT IN
       |    (SELECT doc_id FROM lab WHERE doc_id <> cluster_id))""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // The cross-modality curated corpus: text survivors restricted by
    // linked embedding dedup losses, read off the REAL warehouse view
    // (label-store argmax + id-sized link joins). The oracle composes the
    // two already-locked survivor oracles — the MinHash chain for text
    // survivors, the sign-LSH chain for vector losers — as nested
    // recursive CTE scopes (their CTE names collide, so each chain gets
    // its own derived-table scope), then applies the identity linkage.
    QueryDef.sqlBacked(
      "corpus_curated_survivors", curatedSql("")) { (s, d) =>
      CorpusIngest.curatedSurvivors(s, curatedWarehouse(s, d))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // The governance audit trail's CONTRACT: contiguous per-warehouse seq
    // numbering, one row per touched table per event, exact before/after
    // row counts. Projected to the two tables whose counts are derivable
    // from the fixture alone (documents and the tombstone table — the
    // derived stores' row counts depend on shingling internals the oracle
    // deliberately does not replicate); the VALUES-shaped oracle
    // recomputes those counts from documents.parquet.
    QueryDef.sqlBacked(
      "corpus_audit_trail",
      s"""WITH s AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM s)
         |SELECT CAST(seq AS BIGINT) AS seq, op, id_col,
         |       CAST(n_ids AS BIGINT) AS n_ids, "table",
         |       CAST(rows_before AS BIGINT) AS rows_before,
         |       CAST(rows_after AS BIGINT) AS rows_after
         |FROM (
         |  SELECT 0 AS seq, 'delete' AS op, 'doc_id' AS id_col,
         |         2 AS n_ids, 'documents' AS "table",
         |         n0 AS rows_before, n0 - 2 AS rows_after FROM n
         |  UNION ALL SELECT 0, 'delete', 'doc_id', 2, 'tombstones',
         |         0, 2 FROM n
         |  UNION ALL SELECT 1, 'reinstate', 'doc_id', 1, 'tombstones',
         |         2, 1 FROM n
         |  UNION ALL SELECT 2, 'delete', 'doc_id', 1, 'documents',
         |         n0 - 2, n0 - 3 FROM n
         |  UNION ALL SELECT 2, 'delete', 'doc_id', 1, 'tombstones',
         |         1, 2 FROM n)
         |ORDER BY seq, "table"""".stripMargin) { (s, d) =>
      CorpusIngest.governanceAudit(s, auditWarehouse(s, d))
        .filter(col("table").isin("documents", "tombstones"))
        .select(col("seq"), col("op"), col("id_col"), col("n_ids"),
          col("table"), col("rows_before"), col("rows_after"))
        .orderBy(col("seq"), col("table"))
    },

    // The snapshot read path a training run pins its corpus with:
    // `curatedAsOf` over a warehouse that was snapshotted and THEN took a
    // takedown. The contract under test is both halves of "membership is
    // pinned, bytes are live": the curated set as of the stamp (unmoved
    // by the delete's label churn) MINUS the removed doc (a takedown
    // flows through historical snapshots). Oracle = the curated chain
    // with the deterministic takedown target (min doc_id) excluded.
    QueryDef.sqlBacked(
      "corpus_snapshot_asof",
      curatedSql(
        "\n  AND sv.doc_id <> (SELECT min(doc_id) FROM documents)")) {
      (s, d) =>
        val (wh, ts, _) = snapshotWarehouse(s, d)
        CorpusIngest.curatedAsOf(s, wh, ts)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
    },

    // The export read path — the trainer's pinned global shuffle:
    // `readExport` over an export cut from the snapshot BEFORE the
    // takedown. The contract: every surviving doc keeps the EXACT
    // (shard, pos) computed over the pre-takedown membership (the
    // removed doc leaves a gap, nothing re-shuffles), and the removed
    // doc is absent. Oracle = `txt_shard_export`'s portable-hash shard
    // assignment over the full curated set, minus the takedown target —
    // position arithmetic INCLUDES the removed doc, exactly as the
    // pinned manifest does.
    QueryDef.sqlBacked(
      "corpus_export_shards",
      s"""SELECT doc_id, shard, pos FROM (
         |  SELECT doc_id,
         |    CAST((doc_id % 1000003) * 40503 % 8 AS BIGINT) AS shard,
         |    CAST(row_number() OVER (
         |      PARTITION BY (doc_id % 1000003) * 40503 % 8
         |      ORDER BY (doc_id % 1000003) * 69069 % 65536, doc_id)
         |      AS BIGINT) AS pos
         |  FROM (
         |${curatedSql("")}
         |  ) c) a
         |WHERE doc_id <> (SELECT min(doc_id) FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val (wh, _, ex) = snapshotWarehouse(s, d)
      CorpusIngest.readExport(s, wh, ex)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))
    },

    // The trainer's pre-run shard verification: `exportIntegrity` over
    // the same post-takedown export — per shard, manifest count and
    // placement fingerprint vs the live view's. The contract: counts
    // differ by exactly the takedown gaps in that shard, and the
    // fingerprints are the portable XOR multiset hash of (doc_id, pos)
    // placements — which the oracle recomputes arithmetically from the
    // curated chain, takedown target excluded on the live side only.
    QueryDef.sqlBacked(
      "corpus_export_integrity",
      s"""WITH c AS (
         |${curatedSql("")}
         |),
         |a AS (SELECT doc_id,
         |    CAST((doc_id % 1000003) * 40503 % 8 AS BIGINT) AS shard,
         |    CAST(row_number() OVER (
         |      PARTITION BY (doc_id % 1000003) * 40503 % 8
         |      ORDER BY (doc_id % 1000003) * 69069 % 65536, doc_id)
         |      AS BIGINT) AS pos
         |  FROM c),
         |f AS (SELECT doc_id, shard, pos,
         |    ((doc_id % 1000003) * 40503 + pos * 69069) % 2147483647 AS fp
         |  FROM a),
         |mn AS (SELECT min(doc_id) AS m FROM documents)
         |SELECT shard,
         |  CAST(count(*) AS BIGINT) AS n_manifest,
         |  CAST(count(*) FILTER (WHERE doc_id <> m) AS BIGINT) AS n_live,
         |  CAST(bit_xor(fp) AS BIGINT) AS fp_manifest,
         |  CAST(COALESCE(bit_xor(fp) FILTER (WHERE doc_id <> m), 0)
         |       AS BIGINT) AS fp_live
         |FROM f CROSS JOIN mn
         |GROUP BY shard
         |ORDER BY shard""".stripMargin) { (s, d) =>
      val (wh, _, ex) = snapshotWarehouse(s, d)
      CorpusIngest.exportIntegrity(s, wh, ex).orderBy(col("shard"))
    },

    // The membership delta between two pinned corpora — what a training
    // team reviews before re-pinning. Over the evolve scenario the diff
    // carries every change class at once: drop-2 survivors are adds,
    // old keepers demoted by a smaller-id newcomer are removes, the
    // takedown is a remove, and keepers promoted by the takedown are
    // adds. Oracle = the two curated chains (subset / post-takedown)
    // anti-joined both ways.
    QueryDef.sqlBacked(
      "corpus_snapshot_diff",
      s"""WITH s1 AS (
         |${curatedSqlWhere(evolveSnap1Pred, "")}
         |),
         |s2 AS (
         |${curatedSqlWhere(evolveSnap2Pred, "")}
         |)
         |SELECT doc_id, change FROM (
         |  SELECT doc_id, 'added' AS change FROM s2
         |  WHERE doc_id NOT IN (SELECT doc_id FROM s1)
         |  UNION ALL
         |  SELECT doc_id, 'removed' AS change FROM s1
         |  WHERE doc_id NOT IN (SELECT doc_id FROM s2))
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val (wh, ts1, _, ts2, _) = evolveWarehouse(s, d)
      CorpusIngest.snapshotDiff(s, wh, ts1, ts2).orderBy(col("doc_id"))
    },

    // The extended export — the continued-pretraining read: every base
    // doc keeps the EXACT (shard, pos) export 1 cut from the subset
    // corpus (demoted keepers included — membership was pinned), the
    // takedown target is absent (live join), and snap-2 additions sit
    // appended past each shard's base high-water mark in portable-hash
    // order. Oracle = base placement chain over the snap-1 set, unioned
    // with the additions ranked after each shard's base max.
    QueryDef.sqlBacked(
      "corpus_export_extended",
      s"""WITH s1 AS (
         |${curatedSqlWhere(evolveSnap1Pred, "")}
         |),
         |s2 AS (
         |${curatedSqlWhere(evolveSnap2Pred, "")}
         |),
         |base AS (
         |  SELECT doc_id,
         |    CAST((doc_id % 1000003) * 40503 % 8 AS BIGINT) AS shard,
         |    CAST(row_number() OVER (
         |      PARTITION BY (doc_id % 1000003) * 40503 % 8
         |      ORDER BY (doc_id % 1000003) * 69069 % 65536, doc_id)
         |      AS BIGINT) AS pos
         |  FROM s1),
         |bm AS (SELECT shard, max(pos) AS mx FROM base GROUP BY shard),
         |adds AS (
         |  SELECT doc_id,
         |    CAST((doc_id % 1000003) * 40503 % 8 AS BIGINT) AS shard
         |  FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM s1)),
         |addpos AS (
         |  SELECT a.doc_id, a.shard,
         |    COALESCE(bm.mx, 0) + CAST(row_number() OVER (
         |      PARTITION BY a.shard
         |      ORDER BY (a.doc_id % 1000003) * 69069 % 65536, a.doc_id)
         |      AS BIGINT) AS pos
         |  FROM adds a LEFT JOIN bm ON bm.shard = a.shard)
         |SELECT doc_id, shard, pos FROM (
         |  SELECT * FROM base UNION ALL SELECT * FROM addpos)
         |WHERE doc_id <> (SELECT min(doc_id) FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val (wh, _, _, _, ex2) = evolveWarehouse(s, d)
      CorpusIngest.readExport(s, wh, ex2)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))
    },

    // The snapshot census AFTER retention: expireCorpusSnapshots(keepLast
    // = 1) over three pins must leave exactly the newest stamp, with the
    // commit-marker count (a metadata read — no manifest scan) equal to
    // the pinned membership. Oracle = the one surviving (stamp, census)
    // row with the count recomputed from the survivor chain.
    QueryDef.sqlBacked(
      "corpus_snapshot_expire",
      s"""SELECT CAST(3000 AS BIGINT) AS snap_ts,
         |  (${survivorCountSql(expirePred)}) AS n_docs""".stripMargin) {
      (s, d) =>
        CorpusIngest.listCorpusSnapshots(s, expireWarehouse(s, d))
          .orderBy(col("snap_ts"))
    },

    // The export census after retention: one surviving export whose
    // sidecar ledgers name its source snapshot, shard count, manifest
    // size, and root lineage (base_ts = -1). All five columns come off
    // ledgers — the list API never scans a manifest.
    QueryDef.sqlBacked(
      "corpus_export_census",
      s"""SELECT CAST(200 AS BIGINT) AS export_ts,
         |  CAST(3000 AS BIGINT) AS snap_ts,
         |  CAST(8 AS BIGINT) AS n_shards,
         |  (${survivorCountSql(expirePred)}) AS n_docs,
         |  CAST(-1 AS BIGINT) AS base_ts""".stripMargin) { (s, d) =>
      CorpusIngest.listCorpusExports(s, expireWarehouse(s, d))
        .orderBy(col("export_ts"))
    },

    // The integrity audit's GREEN PATH as a first-class locked read: the
    // FULL fsck report over the healthy curated warehouse (two modality
    // ingests + links — no crashes, no takedowns). The oracle enumerates
    // the exact check inventory the scenario's store set triggers, every
    // violation count ZERO — locking both halves of "healthy audits
    // clean": no invariant fires, and no check silently disappears from
    // the auditor. Fixture-size independent (the counts are zero at any
    // sf; the inventory depends only on which stores the scenario builds).
    QueryDef.sqlBacked(
      "corpus_fsck_clean",
      """SELECT "check", "table", CAST(violations AS BIGINT) AS violations,
        |       severity
        |FROM (VALUES
        |  ('export_manifest_drift','exports',0,'error'),
        |  ('headless_shingles','shingles',0,'error'),
        |  ('label_orphan_nodes','cc_labels',0,'error'),
        |  ('label_orphan_nodes','emb_cc_labels',0,'error'),
        |  ('missing_threshold_ledger','emb_pairs',0,'error'),
        |  ('missing_threshold_ledger','pairs',0,'error'),
        |  ('snapshot_manifest_drift','snapshots',0,'error'),
        |  ('export_uncommitted','exports',0,'warn'),
        |  ('ghost_emb_pair_refs','emb_pairs',0,'warn'),
        |  ('ghost_pair_refs','pairs',0,'warn'),
        |  ('label_missing_nodes','cc_labels',0,'warn'),
        |  ('label_missing_nodes','emb_cc_labels',0,'warn'),
        |  ('missing_params_ledger','bands',0,'warn'),
        |  ('missing_params_ledger','emb_bands',0,'warn'),
        |  ('orphan_bands','bands',0,'warn'),
        |  ('orphan_emb_bands','emb_bands',0,'warn'),
        |  ('snapshot_uncommitted','snapshots',0,'warn'),
        |  ('stranded_docs','documents',0,'warn'),
        |  ('writeatomic_tmp_residue','warehouse',0,'warn')
        |) AS t("check", "table", violations, severity)
        |ORDER BY severity, "check", "table"""".stripMargin) { (s, d) =>
      CorpusIngest.fsck(s, curatedWarehouse(s, d))
        .orderBy(col("severity"), col("check"), col("table"))
    },

    // The integrity audit's TRUE-POSITIVE half: the fsck findings over a
    // warehouse with six PLANTED violation classes (a ghost pair ref and
    // its uncovered label evidence, a removed threshold ledger, a removed
    // params ledger, a crash-parked swap, an ingest ledger ahead of its
    // promote ledger, a writeAtomic temp-residue file next to a live
    // table — see dirtyWarehouse). Every planted state has an
    // exactly fixture-independent count, so the oracle is the literal
    // finding table: each check fires with the right count, table,
    // and severity, and nothing else fires.
    QueryDef.sqlBacked(
      "corpus_fsck_dirty",
      """SELECT "check", "table", CAST(violations AS BIGINT) AS violations,
        |       severity
        |FROM (VALUES
        |  ('ingest_ledger_ahead','staged_drops',1,'error'),
        |  ('missing_threshold_ledger','pairs',1,'error'),
        |  ('ghost_pair_refs','pairs',2,'warn'),
        |  ('label_missing_nodes','cc_labels',2,'warn'),
        |  ('missing_params_ledger','bands',1,'warn'),
        |  ('parked_swap','corpus/doc_stats',1,'warn'),
        |  ('writeatomic_tmp_residue','warehouse',1,'warn')
        |) AS t("check", "table", violations, severity)
        |ORDER BY severity, "check", "table"""".stripMargin) { (s, d) =>
      CorpusIngest.fsck(s, dirtyWarehouse(s, d))
        .filter(col("violations") > 0)
        .orderBy(col("severity"), col("check"), col("table"))
    },

    // The AUDITOR AUDITED: the compliance trail's own fsck invariants
    // under the documented appendAudit crash window (ledger stamped, rows
    // never landed — see auditChecksWarehouse). The scenario leaves a
    // permanent seq gap in the log plus a not-yet-consumed ledger-ahead
    // window; the oracle is the literal two-row finding table — and, as
    // important, nothing ELSE fires: the three delete cascades leave no
    // dedup-side residue a violations>0 filter could pick up.
    QueryDef.sqlBacked(
      "corpus_fsck_audit",
      """SELECT "check", "table", CAST(violations AS BIGINT) AS violations,
        |       severity
        |FROM (VALUES
        |  ('audit_seq_gaps','audit_log',1,'warn'),
        |  ('audit_seq_ledger_ahead','audit_log',1,'warn')
        |) AS t("check", "table", violations, severity)
        |ORDER BY severity, "check", "table"""".stripMargin) { (s, d) =>
      CorpusIngest.fsck(s, auditChecksWarehouse(s, d))
        .filter(col("violations") > 0)
        .orderBy(col("severity"), col("check"), col("table"))
    },

    // The audit self-checks' ERROR side: a hand-rewound seq ledger makes
    // a real event reuse seq 1 (audit_duplicate_seq — one takedown
    // fabricated out of two, the corruption class stamp-first ordering
    // prevents) and leaves the ledger behind the log (the reuse
    // precondition). Exactly the two error rows fire; the gap count is
    // zero by arithmetic (see auditErrWarehouse).
    QueryDef.sqlBacked(
      "corpus_fsck_audit_errors",
      """SELECT "check", "table", CAST(violations AS BIGINT) AS violations,
        |       severity
        |FROM (VALUES
        |  ('audit_duplicate_seq','audit_log',1,'error'),
        |  ('audit_seq_ledger_behind','audit_log',1,'error')
        |) AS t("check", "table", violations, severity)
        |ORDER BY severity, "check", "table"""".stripMargin) { (s, d) =>
      CorpusIngest.fsck(s, auditErrWarehouse(s, d))
        .filter(col("violations") > 0)
        .orderBy(col("severity"), col("check"), col("table"))
    },

    // The repair read path, locked through its compliance record: one
    // leased repair over the two planted mechanically-healable crash
    // states lands ONE audit event (seq 0 — nothing before it audits)
    // with exactly one row per action taken, keyed action.table — the
    // parked-swap heal reports the warehouse-RELATIVE table name, the
    // torn-create clear the store basename. Zero-delta counts: a repair
    // moves directories, it never changes row counts.
    QueryDef.sqlBacked(
      "corpus_repair_audit",
      """SELECT CAST(0 AS BIGINT) AS seq, 'repair' AS op, 'n/a' AS id_col,
        |  CAST(0 AS BIGINT) AS n_ids, "table",
        |  CAST(0 AS BIGINT) AS rows_before, CAST(0 AS BIGINT) AS rows_after
        |FROM (VALUES ('cleared_torn_label_create.cc_labels'),
        |             ('recovered_swap.corpus/doc_stats')) AS t("table")
        |ORDER BY "table"""".stripMargin) { (s, d) =>
      CorpusIngest.governanceAudit(s, repairWarehouse(s, d))
        .filter(col("op") === "repair")
        .select(col("seq"), col("op"), col("id_col"), col("n_ids"),
          col("table"), col("rows_before"), col("rows_after"))
        .orderBy(col("table"))
    },

    // The UNIFIED takedown (`forget`) locked through its audit trail: one
    // content key resolved across all THREE linked modalities must cascade
    // the doc delete (seq 0), the embedding delete (seq 1), the media
    // delete (seq 2), and the forget marker with the link purge (seq 3),
    // with exact before/after counts on every fixture-derivable table.
    // The derived stores (shingles, bands, pairs) are deliberately
    // projected out — their row counts are shingling/LSH internals the
    // oracle does not replicate.
    QueryDef.sqlBacked(
      "corpus_forget_audit",
      s"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n
         |            FROM documents WHERE doc_id % 11 = 0),
         |nv AS (SELECT CAST(count(*) AS BIGINT) AS n
         |       FROM embeddings WHERE vec_id % 11 = 0)
         |SELECT CAST(seq AS BIGINT) AS seq, op, id_col,
         |       CAST(n_ids AS BIGINT) AS n_ids, "table",
         |       CAST(rows_before AS BIGINT) AS rows_before,
         |       CAST(rows_after AS BIGINT) AS rows_after
         |FROM (
         |  SELECT 0 AS seq, 'delete' AS op, 'doc_id' AS id_col,
         |         1 AS n_ids, 'documents' AS "table",
         |         nd.n AS rows_before, nd.n - 1 AS rows_after FROM nd
         |  UNION ALL SELECT 0, 'delete', 'doc_id', 1, 'tombstones',
         |         0, 1 FROM nd
         |  UNION ALL SELECT 1, 'delete_embeddings', 'vec_id', 1,
         |         'emb_vecs', nv.n, nv.n - 1 FROM nv
         |  UNION ALL SELECT 1, 'delete_embeddings', 'vec_id', 1,
         |         'emb_tombstones', 0, 1 FROM nv
         |  UNION ALL SELECT 2, 'delete_media', 'media_id', 1,
         |         'media_hashes', nd.n, nd.n - 1 FROM nd
         |  UNION ALL SELECT 2, 'delete_media', 'media_id', 1,
         |         'media_tombstones', 0, 1 FROM nd
         |  UNION ALL SELECT 3, 'forget', 'content_key', 1, 'links',
         |         2 * nd.n + nv.n, 2 * nd.n + nv.n - 3 FROM nd, nv)
         |ORDER BY seq, "table"""".stripMargin) { (s, d) =>
      CorpusIngest.governanceAudit(s, forgetWarehouse(s, d))
        .filter(col("table").isin(
          "documents", "tombstones", "emb_vecs", "emb_tombstones",
          "media_hashes", "media_tombstones", "links"))
        .select(col("seq"), col("op"), col("id_col"), col("n_ids"),
          col("table"), col("rows_before"), col("rows_after"))
        .orderBy(col("seq"), col("table"))
    },

    // The SEM-RETRAIN lifecycle locked end-to-end: after retrainSemStore
    // rebuilds the SemDeDup state from scratch over the warehouse's
    // vector store (fresh Lloyd centroids, new assignment + pair tables,
    // persisted durable centroids), `semSurvivors` must equal the batch
    // SemDeDup chain over the same vectors — the oracle re-runs the
    // EXACT integerized Lloyd trajectory in DuckDB (the ann_semdedup
    // CTEs), derives within-cluster pairs at the same cut, and contracts
    // components keep-the-minimum.
    QueryDef.sqlBacked(
      "corpus_sem_retrain", {
        val (ctes, fin) = graft.operators.SimilarityOps
          .kmeansCtes(k = 8, iters = 3)
        s"""WITH RECURSIVE $ctes,
           |e AS (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
           |  FROM embeddings),
           |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
           |  FROM $fin a JOIN $fin b ON a.cid = b.cid AND a.vec_id < b.vec_id
           |  JOIN e ea ON ea.vec_id = a.vec_id
           |  JOIN e eb ON eb.vec_id = b.vec_id
           |  WHERE round(list_cosine_similarity(ea.ed, eb.ed), 6) >= 0.42),
           |edges AS (SELECT vec_a AS s, vec_b AS t FROM p
           |          UNION SELECT vec_b, vec_a FROM p),
           |reach(s, t) AS (
           |  SELECT s, t FROM edges
           |  UNION
           |  SELECT r.s, e2.t FROM reach r JOIN edges e2 ON r.t = e2.s),
           |lab AS (SELECT s AS vec_id, least(s, min(t)) AS cluster_id
           |        FROM reach GROUP BY s)
           |SELECT em.vec_id FROM embeddings em
           |WHERE em.vec_id NOT IN
           |  (SELECT vec_id FROM lab WHERE vec_id <> cluster_id)
           |ORDER BY em.vec_id""".stripMargin
      }) { (s, d) =>
      CorpusIngest.semSurvivors(s, retrainWarehouse(s, d))
        .select(col("vec_id")).orderBy(col("vec_id"))
    },

    // The ONE-STOP operational status read, locked end-to-end: lease
    // state (free at read time — every entry point released; the HELD
    // case is inherently non-deterministic and unit-locked in SinksSpec),
    // the crash-parked swap the scenario plants, the audit seq head after
    // three audited events (snapshot 0, export 1, takedown 2), and the
    // snapshot/export censuses whose pinned counts the oracle recomputes
    // from the survivor chain. Purely metadata-sized — no content scan.
    QueryDef.sqlBacked(
      "corpus_status",
      s"""SELECT kind, name, CAST(n AS BIGINT) AS n FROM (
         |  SELECT 'audit_head' AS kind, 'audit_log' AS name,
         |         CAST(2 AS BIGINT) AS n
         |  UNION ALL SELECT 'export', '100',
         |    (${survivorCountSql(statusPred)})
         |  UNION ALL SELECT 'lease', '<free>', 0
         |  UNION ALL SELECT 'parked_swap', 'corpus/doc_stats', 1
         |  UNION ALL SELECT 'snapshot', '1000',
         |    (${survivorCountSql(statusPred)})
         |) t ORDER BY kind, name""".stripMargin) { (s, d) =>
      // the `coordination` gauge rows are monotonic JVM counters —
      // inherently non-deterministic across runs, so unit-locked
      // (LeaseSpec) rather than oracle-locked; every deterministic row
      // stays under the hash compare
      CorpusIngest.warehouseStatus(s, statusWarehouse(s, d))
        .filter(col("kind") =!= "coordination")
    },

    // The INCREMENTALLY-MAINTAINED datacard read off the warehouse's thin
    // per-doc stats table (landed once per drop at ingest), locked
    // against the SAME DuckDB oracle as the full-scan `txt_datacard` —
    // the two must be indistinguishable by contract (the release report
    // never rescans old text; at 100 TB it aggregates a ~0.1% stats
    // table). The curated scratch warehouse ingested the full documents
    // fixture, so the oracle needs no predicate.
    QueryDef.sqlBacked(
      "corpus_datacard",
      graft.operators.TextOps.defs.find(_.name == "txt_datacard").get
        .oracle.get) { (s, d) =>
      CorpusIngest.datacard(s, curatedWarehouse(s, d))
    }
  )
}
