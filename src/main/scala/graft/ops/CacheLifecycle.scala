package graft.ops

import org.apache.spark.sql.DataFrame

/** Generation-scoped cache retirement shared by the ops objects
  * ([[DedupOps]], [[VectorOps]], [[EventOps]]) — one implementation of
  * the retire step so fixes land once (review r10: the logic was
  * duplicated per object).
  *
  * Retirement must tolerate frames bound to a STOPPED or replaced
  * SparkSession: `unpersist` on a stopped context throws
  * IllegalStateException from the block-manager RPC, and a generation
  * cached by session 1 must not be able to fail session 2's first query
  * (the same replacement-session hazard ADVICE r9 flagged for the
  * shingle memo). A dead session's blocks died with its executors, so
  * skipping them leaks nothing.
  */
private[graft] object CacheLifecycle {

  /** Unpersist every frame in `gen` (best-effort — a frame whose
    * session is stopped is skipped) and clear the buffer. Callers hold
    * their own synchronization. */
  def retire(gen: scala.collection.mutable.ArrayBuffer[DataFrame]): Unit = {
    gen.foreach(f => scala.util.Try(f.unpersist(false)))
    gen.clear()
  }
}
