package object graft {
  /** Every declared query: (session, sf-dir) => result frame. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
