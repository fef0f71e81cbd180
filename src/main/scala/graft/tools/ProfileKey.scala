package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement harness (optimization round 19, guide §1): runs one or
  * more declared bench keys under a SparkListener that attributes every
  * Spark job to its call site, so a lifecycle key's wall time decomposes
  * into its phases (create / insert / delete / refresh / serve) without
  * touching the keys themselves. Reads the same env contract as Bench.
  *
  * Usage: SPARK_GRAFT_PROFILE_KEYS=agg_mv_serve_hll sbt "runMain graft.tools.ProfileKey"
  */
object ProfileKey {

  private final case class JobRec(id: Int, site: String, desc: String, start: Long, var end: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keys = sys.env
      .getOrElse("SPARK_GRAFT_PROFILE_KEYS", "agg_mv_serve_hll")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val props = Option(e.properties).getOrElse(new java.util.Properties())
        def p(k: String) = Option(props.getProperty(k))
        if (sys.env.contains("SPARK_GRAFT_PROFILE_DUMP_PROPS") && e.jobId < 3) {
          val en = props.propertyNames()
          while (en.hasMoreElements) {
            val k = en.nextElement().toString
            println(s"  prop[$k]=${props.getProperty(k).take(80)}")
          }
        }
        val site = p("callSite.short").orElse(p("spark.job.callSite.short")).getOrElse("?")
        val desc = p("spark.job.description").getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, site, desc, System.nanoTime()))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId)
        if (r != null) r.end = System.nanoTime()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // per-action attribution: every Dataset action (incl. each spark.sql
    // DDL/DML execution) reports its duration and a plan fingerprint
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Double, Long)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val head = qe.logical.getClass.getSimpleName
        val snip = qe.logical.toString.linesIterator.take(1).mkString.take(100)
        actions.add((funcName, s"$head | $snip", durationNs / 1e9, System.nanoTime()))
      }
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })

    val mainThread = Thread.currentThread()
    keys.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"== $name: NOT A DECLARED KEY ==")
        case Some(fn) =>
          jobs.clear()
          actions.clear()
          // poor-man's driver profiler: sample the main thread's stack
          // every 10 ms; attribute each sample to its deepest
          // interesting frame (graft code or a spark phase marker)
          val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
          @volatile var sampling = true
          val sampler = new Thread(() => {
            while (sampling) {
              val st = mainThread.getStackTrace
              if (st.nonEmpty) {
                val top = st.head
                val blocked = top.getClassName.startsWith("jdk.internal.misc.Unsafe") ||
                  top.getMethodName == "park" || top.getMethodName == "wait0" ||
                  top.getMethodName == "wait" || top.getClassName.contains("Object")
                val frame =
                  if (blocked && st.exists(f => f.getClassName.contains("SparkThreadUtils") || f.getClassName.contains("ThreadUtils")))
                    "WAITING-for-executors"
                  else if (blocked)
                    "WAITING-other: " + st.drop(1).take(4)
                      .map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
                      .mkString(" < ")
                  else st.find { f =>
                    val c = f.getClassName
                    c.startsWith("graft.") ||
                      c.contains("ParquetFileReader") ||
                      c.contains("RuleExecutor") ||
                      c.contains("Analyzer") ||
                      c.contains("CodeGenerator") ||
                      c.contains("FileFormatWriter") ||
                      c.contains("DataSourceV2Strategy") ||
                      c.contains("parser")
                  }.orElse(st.headOption)
                    .map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
                    .getOrElse("?")
                samples.merge(frame, 1, (a, b) => a + b)
              }
              Thread.sleep(10)
            }
          })
          sampler.setDaemon(true)
          sampler.start()
          val t0 = System.nanoTime()
          val n = try fn(spark, sfDir).count() catch { case t: Throwable => println(t); -1L }
          val wall = (System.nanoTime() - t0) / 1e9
          sampling = false
          Thread.sleep(300) // let the listener bus drain job-end events
          import scala.jdk.CollectionConverters._
          val recs = jobs.values().asScala.toSeq.filter(_.end > 0)
          val byId = recs.sortBy(_.start)
          val jobSum = recs.map(r => (r.end - r.start) / 1e9).sum
          println(f"== $name rows=$n wall=$wall%.2f s, ${recs.size} jobs, job-sum=$jobSum%.2f s ==")
          // per-callsite rollup
          recs.groupBy(_.site).toSeq
            .map { case (s, rs) => (s, rs.map(r => (r.end - r.start) / 1e9).sum, rs.size) }
            .sortBy(-_._2)
            .take(30)
            .foreach { case (s, sec, cnt) => println(f"  $sec%8.3f s  x$cnt%-4d $s") }
          println("  -- timeline (jobs > 0.1s) --")
          byId.foreach { r =>
            val sec = (r.end - r.start) / 1e9
            if (sec > 0.1)
              println(f"  job ${r.id}%4d  $sec%7.3f s  off=${(r.start - t0) / 1e9}%7.2f  ${r.site}  ${r.desc.take(60)}")
          }
          println("  -- driver main-thread samples (10ms) --")
          samples.entrySet().asScala.toSeq
            .sortBy(-_.getValue.intValue())
            .take(25)
            .foreach(e => println(f"  ${e.getValue.intValue() * 0.01}%7.2f s  ${e.getKey}"))
          println("  -- actions (QueryExecutionListener, incl. driver time) --")
          import scala.jdk.CollectionConverters._
          actions.asScala.toSeq.sortBy(_._4).foreach { case (f, p, sec, at) =>
            if (sec > 0.05)
              println(f"  act $sec%7.3f s  end=${(at - t0) / 1e9}%7.2f  [$f]  ${p.take(110)}")
          }
      }
    }
    spark.stop()
  }
}
