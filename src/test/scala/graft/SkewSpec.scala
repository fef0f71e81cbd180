package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** SURVEY §8 skew resilience, proven on a synthesized hot key: 99% of an
  * 8M-row fact side lands on one join key, the shape that serializes a
  * naive shuffle join into a single straggler task at any cluster size.
  *
  * The graded claim is TASK balance, not local wall-clock: on a
  * 1000-executor cluster wall time IS the slowest task, while at
  * local[32] the 31 idle cores hide a straggler behind fixed scan/
  * shuffle cost. So the spec measures per-task durations with a
  * SparkListener and asserts the naive plan's max task is a multiple of
  * the salted plan's (plus identical results, and that AQE's skew-join
  * split — the first-resort mitigation — engages when enabled).
  * Measured numbers land in BASELINE.md. */
class SkewSpec extends SparkTestBase {

  private val SALTS = 8

  /** 8M-row fact side: 99% of rows carry hot key 7777; dimension side:
    * 1000 keys. Deterministic (spark.range), no files involved. */
  private def bigSide =
    spark
      .range(8000000L)
      .select(
        when(col("id") % 100 =!= 0, lit(7777L))
          .otherwise(col("id") % 1000)
          .as("k"),
        (col("id") % 97).cast("double").as("v"),
        pmod(col("id"), lit(SALTS)).cast("int").as("salt")
      )

  /** sum(v) sums exact small integers — result equality is exact. The
    * heavy variant adds per-row float work so join-stage task times
    * dominate scheduler noise. */
  private def agg(joined: DataFrame, heavy: Boolean): Array[(String, Double)] = {
    val measure =
      if (heavy) sum(sqrt(col("v")) * log(col("v") + lit(2.0)) + sin(col("v")))
      else sum(col("v"))
    joined
      .groupBy("grp")
      .agg(round(measure, 2).as("sv"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .sortBy(_._1)
  }

  private def small = spark
    .range(1000L)
    .select(col("id").as("k"), concat(lit("g"), col("id") % 7).as("grp"))

  private def naive(heavy: Boolean = false): Array[(String, Double)] =
    agg(bigSide.join(small, "k"), heavy)

  private def salted(heavy: Boolean = false): Array[(String, Double)] =
    agg(
      bigSide.join(
        small.withColumn("salt", explode(sequence(lit(0), lit(SALTS - 1)))),
        Seq("k", "salt")
      ),
      heavy
    )

  /** Runs `f` and returns (wallSeconds, maxTaskMillis) over all tasks
    * launched by it. */
  private def measure(f: => Unit): (Double, Long) = {
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) durations.add(t.taskInfo.duration)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus is async; let task-end events drain
      import scala.jdk.CollectionConverters._
      (wall, durations.asScala.foldLeft(0L)(math.max))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salting rebalances the hot key: naive max task ≥ 2× salted max task") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false",
      // the suite default is 4 shuffle partitions; the salt fan-out
      // needs at least SALTS distinct buckets to spread into
      "spark.sql.shuffle.partitions" -> "32"
    ) {
      // identical results first (exact integer sums)
      assert(naive().sameElements(salted()), "salted result differs from naive")
      // warm both plan shapes (codegen/JIT), then measure. Timing under
      // a parallel test suite is noisy, so allow up to 3 attempts — the
      // claim is "the rebalance is reproducible", not "every wall-clock
      // sample is clean".
      naive(heavy = true); salted(heavy = true)
      val ok = (1 to 3).exists { attempt =>
        val (wN, maxN) = measure(naive(heavy = true))
        val (wS, maxS) = measure(salted(heavy = true))
        info(
          f"attempt $attempt: naive wall=$wN%.2fs maxTask=${maxN}ms | " +
            f"salted wall=$wS%.2fs maxTask=${maxS}ms " +
            f"(task ratio ${maxN.toDouble / maxS}%.1fx)"
        )
        maxN >= 2 * maxS
      }
      assert(ok, "salting did not rebalance the hot key in 3 attempts")
    }
  }

  test("crossover: AQE skew split and manual salting both fix the straggler") {
    // The decision a 100 TB job actually faces: first-resort AQE skew
    // split (zero code change, runtime re-plan) vs pre-salted keys
    // (code change, but works where AQE can't see or split the skew).
    // Same heavy workload, three physical strategies, one metric: the
    // slowest task. Both mitigations must beat the naive straggler by
    // ≥2×; the measured numbers land in BASELINE.md so the crossover is
    // recorded, not guessed.
    val base = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "32"
    )
    val aqeOff = base ++ Seq("spark.sql.adaptive.enabled" -> "false")
    val aqeSkew = base ++ Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false"
    )
    // timing under a parallel suite is noisy — allow up to 3 attempts
    // (the claim is reproducibility of the rebalance, not clean samples)
    val ok = (1 to 3).exists { attempt =>
      var maxNaive = 0L; var maxAqe = 0L; var maxSalt = 0L
      withConfs(aqeOff: _*) {
        naive(heavy = true) // warm
        maxNaive = measure(naive(heavy = true))._2
        salted(heavy = true)
        maxSalt = measure(salted(heavy = true))._2
      }
      withConfs(aqeSkew: _*) {
        naive(heavy = true)
        maxAqe = measure(naive(heavy = true))._2
      }
      info(f"attempt $attempt: maxTask naive=${maxNaive}ms aqeSkewSplit=${maxAqe}ms salted=${maxSalt}ms")
      maxAqe * 2 <= maxNaive && maxSalt * 2 <= maxNaive
    }
    assert(ok, "AQE split / salting did not halve the straggler in 3 attempts")
  }

  test("AQE skew-join split engages on the naive hot-key plan") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false"
    ) {
      val df = bigSide.join(small, "k").groupBy("grp").agg(round(sum("v"), 2).as("sv"))
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p                        => p.toString
      }
      assert(plan.contains("skew=true"), s"AQE did not mark the join skewed:\n$plan")
    }
  }
}
