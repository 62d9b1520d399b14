package graft.jobs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dev utility: write selected `SparkEntry.oracleSql` entries to files so
  * they can be run / profiled directly in DuckDB (e.g. when tuning an
  * oracle's execution shape at a scale the driver never checks). No Spark
  * session — the oracle map is pure strings.
  *
  * usage: DumpOracle <outDir> <key> [<key> ...]
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DumpOracle <outDir> <key> [<key> ...]")
    val out = Paths.get(args(0))
    Files.createDirectories(out)
    val oracles = graft.SparkEntry.oracleSql
    args.drop(1).foreach { key =>
      val sql = oracles.getOrElse(key, sys.error(s"no oracle for key $key"))
      Files.write(out.resolve(s"$key.sql"), sql.getBytes(StandardCharsets.UTF_8))
      println(s"wrote ${out.resolve(s"$key.sql")} (${sql.length} chars)")
    }
  }
}
