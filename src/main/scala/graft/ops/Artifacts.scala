package graft.ops

/** Shared root/fingerprint scheme for persisted index artifacts
  * ([[IvfPqIndex]], [[MinhashIndex]]): the artifact root is keyed by a
  * fingerprint of the SOURCE table's files, so a regenerated corpus
  * invalidates the stored index automatically and two SFs never collide.
  * Bump the version tag when an artifact's recipe changes.
  *
  * At 100 TB the same idea is a catalog property (source table snapshot id
  * → index table) rather than an mtime fold; the local form keeps the
  * build-once / probe-many contract testable in this harness.
  */
private[ops] object Artifacts {

  /** Fold (name, mtime, length) over the source file (or every file under
    * it when it's a directory, in name order). */
  private def fingerprint(dir: String, table: String): Long = {
    def fold(f: java.io.File): Long =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName).foldLeft(17L)((a, c) => a * 31 + fold(c))
      else f.getName.hashCode.toLong * 31 + f.lastModified * 7 + f.length
    fold(new java.io.File(s"$dir/$table"))
  }

  /** `/tmp/graft_<tag>_<sf-digits>_<fingerprint-hex>` — same scheme the
    * round-7 ANN index introduced (kept byte-compatible for `annix_v1`). */
  def root(tag: String, dir: String, table: String): String =
    s"/tmp/graft_${tag}_${dir.replaceAll("[^0-9.]", "")}_" +
      java.lang.Long.toHexString(fingerprint(dir, table))
}
