package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** Filesystem seam for the index MARKER/MANIFEST plane (review r10): the
  * public facades ([[graft.api.GraftAPI.writeMinhashIndex]], the delete
  * legs, `buildAnnIndex`) accept arbitrary table paths, and
  * `java.io.File` silently no-ops or throws on object-store URIs
  * (s3a://, hdfs://) — exactly the 100 TB deployments the
  * marker-commits-last crash-safety rules exist for. All marker and
  * geometry-manifest I/O resolves through Hadoop's `FileSystem` for the
  * path's scheme, using the active session's `hadoopConfiguration` when
  * one exists (so credentials/endpoints configured on the session
  * apply); plain local paths keep byte-identical behavior with the old
  * `java.io.File` form. The DATA plane always went through Spark's own
  * writers and needed no change. Registry-internal scratch layouts
  * under `/tmp` (Artifacts.root) are local by construction and stay on
  * `java.io.File`.
  */
private[graft] object IndexFs {

  // getActiveSession is THREAD-LOCAL (ADVICE r10): marker I/O issued from
  // a helper thread that never touched the session would silently fall
  // back to a bare Configuration without the session's object-store
  // credentials/endpoints — fall through the process-wide default
  // session before giving up.
  private def conf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def withFs[T](path: String)(f: (FileSystem, Path) => T): T = {
    val p = new Path(path)
    f(p.getFileSystem(conf), p)
  }

  def isFile(path: String): Boolean = withFs(path)((fs, p) =>
    fs.exists(p) && fs.getFileStatus(p).isFile)

  /** Create an empty file; true if the file exists afterwards (matches
    * the old `createNewFile() || isFile` commit idiom). */
  def touch(path: String): Boolean = withFs(path)((fs, p) =>
    fs.createNewFile(p) || fs.exists(p))

  def delete(path: String): Boolean = withFs(path)((fs, p) => fs.delete(p, false))

  /** Recursive delete of a retired index SIBLING (delta generations a
    * compact has folded in). Only lifecycle code that has already
    * retired the root commit marker may call this. */
  def deleteRecursive(path: String): Boolean =
    withFs(path)((fs, p) => !fs.exists(p) || fs.delete(p, true))

  def parent(path: String): String = new Path(path).getParent.toString

  def child(root: String, name: String): String = new Path(root, name).toString

  def write(path: String)(body: java.io.OutputStream => Unit): Unit =
    withFs(path) { (fs, p) =>
      val out = fs.create(p, true)
      try body(out) finally out.close()
    }

  /** Child DIRECTORIES of `path` (empty when absent) — the delta-batch
    * listing the facade probe-root resolver uses; sorted by name so the
    * resolved union is deterministic. */
  def listDirs(path: String): Seq[String] = withFs(path) { (fs, p) =>
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.toString).sorted
  }

  def readIfExists[T](path: String)(body: java.io.InputStream => T): Option[T] =
    withFs(path) { (fs, p) =>
      if (!fs.exists(p)) None
      else { val in = fs.open(p); try Some(body(in)) finally in.close() }
    }
}
