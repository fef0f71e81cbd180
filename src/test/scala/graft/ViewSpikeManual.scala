package graft

/** Scratch spike — deleted before commit. */
object ViewSpikeManual {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.catalog.lake", classOf[graft.sources.SnapshotCatalog].getName)
      .config("spark.sql.catalog.lake.warehouse", "/tmp/spike/wh")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE TABLE IF NOT EXISTS lake.main.base (id BIGINT, v DOUBLE)")
    try {
      spark.sql("CREATE VIEW lake.main.v1 AS SELECT id, v * 2 AS v2 FROM lake.main.base")
      println("CREATE VIEW ok"); spark.sql("SELECT * FROM lake.main.v1").show(); println(spark.sql("SHOW VIEWS IN lake.main").collect().mkString(","))
    } catch { case e: Throwable => println("CREATE VIEW failed: " + e.getClass.getName + ": " + e.getMessage.take(400)) }
    try {
      val p = spark.sql("SELECT 1").queryExecution  // noop
      println(org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parsePlan(
        "CREATE VIEW lake.main.v1 AS SELECT id FROM lake.main.base").treeString.take(800))
    } catch { case e: Throwable => println("parse failed: " + e) }
    spark.stop()
  }
}
// appended spike round 2 marker
