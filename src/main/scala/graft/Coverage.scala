package graft

/** Dev tool: prints queries/oracle coverage so the gap list never drifts.
  * (The driver's correctness gate only reports queries it ran; this audits
  * the registry itself.)
  */
object Coverage {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println("QUERIES=" + q.size + " ORACLES=" + o.size)
    println("NO_ORACLE: " + (q -- o).toSeq.sorted.mkString(","))
    println("ORPHAN: " + (o -- q).toSeq.sorted.mkString(","))
  }
}
