package graft.core

import org.apache.spark.sql.SparkSession

/** THE warehouse tree traversal — one driver-side recursive listing that
  * feeds every residue recognizer at once. fsck, repair, and status each
  * need the same walk (crash-parked swaps, writeAtomic temp residue, and
  * whatever recognizer comes next); before this seam existed each census
  * ran its own traversal, and at a many-thousand-table warehouse the
  * duplicated metadata storm was the slowest row of the first read every
  * inherited-warehouse operator makes. Now a caller scans ONCE and reads
  * all findings off the result.
  *
  * Cost contract: exactly ONE `listStatus` batch per visited directory
  * (locked by WalkSpec against a call-counting filesystem) — every
  * verdict, including the parked one (`<t>._compact_old` present, live
  * `<t>` absent — both names are siblings by construction), is answered
  * from the directory's own listing, never a per-candidate `exists`
  * round-trip. So a warehouse of tens of thousands of tables costs
  * exactly its directory count in metadata calls, once per scan, not
  * once per recognizer.
  *
  * Descent rule (shared by all recognizers, unchanged from the walks it
  * replaces): control artifacts (`._`-prefixed names and
  * `._compact_old`/`._compact_tmp` park/stage dirs) are never descended
  * into; data dirs are — a table dir's files come back in its one
  * listing and recursion stops where subdirectories stop, which bounds
  * the walk at the warehouse's directory tree, shallow and
  * metadata-sized by layout.
  */
private[graft] object WarehouseWalk {

  /** One scan's findings:
    *   - `parkedSwaps` — `<table>._compact_old` dirs whose live
    *     `<table>` sibling is absent (the crash-parked rewrite-swap
    *     signature, [[SwapProtocol]] doc);
    *   - `tempResidue` — (path, mtimeMs) of every file
    *     [[AtomicFiles.isTempResidue]] recognizes as `writeAtomic`
    *     crash residue. The mtime rides along so census/clear callers
    *     can apply an age bound: a LEASE-FREE scan can catch a live
    *     writer's in-flight temp (the swap-token beat re-stamps one
    *     every TTL/3), and only age separates that from a dead
    *     writer's residue.
    */
  final case class Findings(parkedSwaps: Seq[String],
                            tempResidue: Seq[(String, Long)])

  def scan(spark: SparkSession, root: String): Findings = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rp)) Findings(Seq.empty, Seq.empty)
    else {
      val parked = Seq.newBuilder[String]
      val residue = Seq.newBuilder[(String, Long)]
      def walk(p: org.apache.hadoop.fs.Path): Unit = {
        val listing = fs.listStatus(p)
        // the parked verdict consults the sibling NAME SET from this
        // same listing (one snapshot — a name and its parked twin are
        // read in the same batch, so the verdict is internally
        // consistent, unlike two racing exists probes)
        val names = listing.iterator.map(_.getPath.getName).toSet
        listing.foreach { st =>
          val name = st.getPath.getName
          if (st.isFile) {
            if (AtomicFiles.isTempResidue(name))
              residue += ((st.getPath.toString, st.getModificationTime))
          } else if (name.endsWith("._compact_old")) {
            if (!names.contains(name.stripSuffix("._compact_old")))
              parked += st.getPath.toString
          } else if (!name.startsWith("._") && !name.contains("._compact_"))
            walk(st.getPath)
        }
      }
      walk(rp)
      Findings(parked.result(), residue.result())
    }
  }
}
