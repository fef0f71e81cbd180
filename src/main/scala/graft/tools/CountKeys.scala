package graft.tools

/** Diagnostic: print the declared inventory size and keys lacking oracles. */
object CountKeys {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries
    val o = graft.SparkEntry.oracleSql
    println(s"queries=${q.size} oracles=${o.size}")
    println("no-oracle: " + q.keySet.diff(o.keySet).toSeq.sorted.mkString(","))
    println("orphan-oracle: " + o.keySet.diff(q.keySet).toSeq.sorted.mkString(","))
  }
}
