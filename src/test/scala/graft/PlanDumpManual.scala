package graft

/** Manual plan inspection helper (not a test): run with
  * `sbt "Test/runMain graft.PlanDumpManual"` to eyeball formatted plans.
  */
object PlanDumpManual {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    Seq(
      "sim_cosine_pairs" -> sim.Similarity.simCosinePairs(spark, sf),
      "dedup_ngram_jaccard" -> text.Dedup.dedupNgramJaccard(spark, sf)
    ).foreach { case (name, df) =>
      println(s"===== $name ====="); df.explain("formatted")
    }
    spark.stop()
  }
}
