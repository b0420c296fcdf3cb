package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.reddit.PostsTable

/** Exactly-once SINK effect for `foreachBatch` over the versioned table:
  * a per-epoch commit ledger stored as a transactional sidecar of
  * [[PostsTable]], so "this epoch's data is in the table" and "this epoch
  * is recorded as committed" become ONE atomic event (the version-pointer
  * flip).
  *
  * Why this is the missing piece: Structured Streaming replays the last
  * uncommitted micro-batch after a crash, so a `foreachBatch` body runs
  * AT-LEAST-once. An idempotent body (keyed upsert) hides that for the
  * table's CONTENT, but anything non-idempotent layered on the batch —
  * row-count metrics, version accounting, downstream notifications —
  * double-fires on replay. The ledger closes the gap the way Delta's
  * `txnAppId`/`txnVersion` does: the sink checks the ledger under the
  * table's own commit protocol and SKIPS a replayed epoch entirely.
  * Crash-window analysis: the ledger entry lands inside `v_<n+1>` before
  * the CURRENT flip, so a crash BEFORE the flip leaves at most an orphan
  * `v_<n+1>` directory that CURRENT never names — no reader sees it,
  * `committed()` doesn't either, and the replayed epoch clobbers it and
  * re-applies cleanly (PostsTable.moveIntoVersion). A crash AFTER the
  * flip leaves data and ledger together (replay skips). There is no
  * window where one is visible without the other — that atomicity is
  * exactly what a ledger in a separate file next to the checkpoint
  * cannot give. Plain (un-ledgered) upserts interleaved on the same
  * table are safe too: PostsTable carries `_graft_*` sidecars forward
  * into every new version.
  *
  * The ledger is tiny (one `epoch\trows` line per commit, cumulative,
  * rewritten into each version), so at 100 TB it stays a metadata-class
  * artifact: O(epochs), independent of data volume.
  */
object EpochLedger {

  private val LedgerName = "_graft_epochs.tsv"

  /** epoch → rows committed in that epoch, from the live version. */
  def committed(root: String): Map[Long, Long] =
    PostsTable.readSidecar(root, LedgerName) match {
      case None => Map.empty
      case Some(body) => body.linesIterator.filter(_.nonEmpty).map { line =>
        val Array(e, r) = line.split("\t", -1)
        e.toLong -> r.toLong
      }.toMap
    }

  private def serialize(ledger: Map[Long, Long]): String =
    ledger.toSeq.sorted.map { case (e, r) => s"$e\t$r" }.mkString("\n")

  /** Apply one micro-batch exactly once: a replayed `epochId` is skipped
    * without touching the table (returns false); a fresh one is counted
    * and upserted with the updated ledger in the same atomic commit
    * (returns true). The batch is counted BEFORE the upsert so the
    * recorded metric describes what this commit added — the count is one
    * extra bounded job over a micro-batch, the same cost class as the
    * upsert's own key-collect.
    */
  def exactlyOnceUpsert(spark: SparkSession, root: String, batch: DataFrame,
                        epochId: Long, key: String = "id"): Boolean = {
    val ledger = committed(root)
    if (ledger.contains(epochId)) false
    else {
      val rows = batch.count()
      PostsTable.upsert(spark, root, batch, key,
        sidecar = Map(LedgerName -> serialize(ledger + (epochId -> rows))))
      true
    }
  }

  /** The ledger as a relation — the sink-side metrics surface
    * (epoch, rows_committed), one row per committed epoch.
    */
  def metrics(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    committed(root).toSeq.sorted.toDF("epoch", "rows_committed")
  }
}
