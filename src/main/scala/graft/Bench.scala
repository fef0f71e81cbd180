package graft
import org.apache.spark.sql.SparkSession
object Bench {
  // DCE sink for the calibration loop (volatile so the JIT cannot
  // prove the loop result unused and elide the work).
  @volatile private var calibSink: Long = 0L

  /** One fixed-work CPU rep: 64-bit multiplicative mix over a fixed
    * iteration count. Deterministic, IO-free, data-free, allocation-
    * free — the same instruction stream on every machine and every
    * HEAD, so its wall time measures ONLY current machine speed.
    */
  private def calibRep(iters: Long): Double = {
    val t0 = System.nanoTime()
    var h = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < iters) {
      h ^= i
      h *= 0xFF51AFD7ED558CCDL
      h ^= (h >>> 33)
      i += 1L
    }
    calibSink = h
    (System.nanoTime() - t0) / 1e9
  }

  /** Machine-calibration anchor (round-18, VERDICT r17 #1): emitted
    * with every bench run so any two readings — driver or builder,
    * any session — are machine-normalizable by their calib ratio.
    * Returns (single-thread median-of-3, parallel wall median-of-3).
    * The parallel rep runs `par` concurrent copies of the same loop,
    * matching how a contended shared machine slows the 32-thread
    * Spark run; the single-thread rep isolates per-core speed.
    */
  private def calibrate(par: Int): (Double, Double) = {
    val iters = 400000000L // ~1 s/rep on an uncontended modern core
    calibRep(iters / 8) // JIT warm, discarded
    val st = Seq.fill(3)(calibRep(iters)).sorted.apply(1)
    def parRep(): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until par).map { _ =>
        val t = new Thread(() => { calibRep(iters); () })
        t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    val pw = Seq.fill(3)(parRep()).sorted.apply(1)
    (st, pw)
  }

  /** IO calibration anchor (round 18): the text_index_refresh drift
    * investigation showed a machine-day slowdown living ENTIRELY in
    * bulk write throughput — invisible to the CPU loop (calib healthy,
    * fsync latency healthy, the key 2× slower on BOTH HEADs). This
    * rep writes a fixed 64 MiB pattern to the same tmp filesystem the
    * bench tables use, fsyncs, reads it back, and deletes — a
    * deterministic, data-free measure of the sequential write+read
    * path the IO-heavy keys actually ride. Median of 3. */
  private def calibIoRep(): Double = {
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_io")
    java.nio.file.Files.createDirectories(dir)
    val p = dir.resolve(s"_calib_io_${System.nanoTime()}.bin")
    val block = new Array[Byte](1 << 20)
    var i = 0
    while (i < block.length) { block(i) = (i * 31).toByte; i += 1 }
    val t0 = System.nanoTime()
    try {
      val ch = java.nio.channels.FileChannel.open(
        p, java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        var b = 0
        while (b < 64) { ch.write(java.nio.ByteBuffer.wrap(block)); b += 1 }
        ch.force(true)
      } finally ch.close()
      val in = java.nio.channels.FileChannel.open(
        p, java.nio.file.StandardOpenOption.READ)
      try {
        val buf = java.nio.ByteBuffer.allocate(1 << 20)
        var n = 0L
        var r = in.read(buf)
        while (r >= 0) {
          n += r; buf.clear()
          calibSink ^= n
          r = in.read(buf)
        }
      } finally in.close()
      (System.nanoTime() - t0) / 1e9
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  /** The anchors must never take the bench down: a full tmp disk or a
    * read-only filesystem degrades the calibration to -1.0 (readable
    * as "anchor unavailable" downstream), and the measured queries —
    * the artifact that actually matters — still run and land in
    * bench_out.json. */
  private def calibrateIo(): Double =
    try Seq.fill(3)(calibIoRep()).sorted.apply(1)
    catch { case _: Throwable => -1.0 }

  private def calibrateSafe(par: Int): (Double, Double) =
    try calibrate(par)
    catch { case _: Throwable => (-1.0, -1.0) }

  /** Combine the start/end readings of one anchor into the headline
    * value: -1.0 ("anchor unavailable") when EITHER endpoint degraded
    * to the -1.0 failure sentinel, else their mean. Averaging a
    * healthy endpoint with a sentinel (r18 What's-wrong #2) yields a
    * garbage number — e.g. (0.9 + -1.0)/2 = -0.05 — that silently
    * poisons exactly the cross-run normalization the anchor exists
    * for; a consumer can work with "unavailable", not with a wrong
    * magnitude. */
  private[graft] def combineAnchors(start: Double, end: Double): Double =
    if (start < 0.0 || end < 0.0) -1.0 else (start + end) / 2.0

  /** One mid-run mini-anchor (round-19, VERDICT r18 #1): the start/end
    * anchors normalize ACROSS runs but are blind to a contention burst
    * that hits mid-run, inside one key's window (the r18 driver run:
    * healthy endpoint anchors, yet three keys 9-26x their same-HEAD
    * builder readings). This rep runs the same fixed parallel loop at
    * 1/10 the iteration count (~0.1 s healthy wall) every N keys; a
    * burst then shows as a localized spike in the calib_trace that
    * overlaps the outlier keys' start_sec window, making burst-vs-
    * regression readable from bench_out.json alone. */
  private def miniCalibSafe(par: Int): Double =
    try {
      val iters = 40000000L // 1/10 of the full anchor rep
      val t0 = System.nanoTime()
      val ts = (0 until par).map { _ =>
        val t = new Thread(() => { calibRep(iters); () })
        t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(
        "spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JIT, codegen compiler, FS metadata) so the first
    // measured query isn't charged ~4s of JVM startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    // Calibration anchor BEFORE the measured queries (machine state
    // at run start) and again after (calib_end_* below) so mid-run
    // degradation on a shared machine is visible in the artifact.
    val calibPar = math.max(1, cpus.toInt)
    val (calibSt0, calibPw0) = calibrateSafe(calibPar)
    val calibIo0 = calibrateIo()
    // Optional comma-separated key subset (SPARK_GRAFT_BENCH_KEYS) for
    // fresh-JVM per-key medians — the driver sets no subset and always
    // measures the full inventory.
    val subset = sys.env.get("SPARK_GRAFT_BENCH_KEYS").map(_.split(",").toSet)
    val picked = subset match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None        => SparkEntry.queries
    }
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // Per-key attribution (round 19): wall-clock offset of every key
    // from run start, plus a ~0.1 s parallel mini-anchor every
    // traceEvery keys. Both go to bench_out.json only — the stdout
    // line keeps the exact driver-parsed shape.
    val runT0 = System.nanoTime()
    def sinceStart: Double = (System.nanoTime() - runT0) / 1e9
    val traceEvery = 25
    val calibTrace = scala.collection.mutable.ArrayBuffer[String]()
    val keyTrace = scala.collection.mutable.ArrayBuffer[String]()
    var keyIdx = 0
    val results = picked.toSeq.map { case (name, fn) =>
      if (keyIdx % traceEvery == 0) {
        val at = sinceStart
        val sec = miniCalibSafe(calibPar)
        calibTrace += s"""{"after_key":$keyIdx,"at_sec":${r3(at)},"par_sec":${r3(sec)}}"""
      }
      val startAt = sinceStart
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      keyTrace += s"""{"key":"$name","start_sec":${r3(startAt)},"sec":${r3(sec)}}"""
      keyIdx += 1
      name -> sec
    }
    // Closing trace point so the last window is bounded on both sides.
    calibTrace += s"""{"after_key":$keyIdx,"at_sec":${r3(sinceStart)},"par_sec":${r3(miniCalibSafe(calibPar))}}"""
    val (calibSt1, calibPw1) = calibrateSafe(calibPar)
    val calibIo1 = calibrateIo()
    // The driver tail-captures only the LAST 2000 chars of stdout, and
    // sbt's trailing "[success] ..." line costs ~75 of them — a full
    // 105-query map (~3.4 KB) gets its head clipped and parses as null
    // (BENCH_r01..r03). The stdout line is therefore budgeted to 1500
    // chars: slowest queries itemized until the budget, the remainder
    // summed under "_rest". The complete per-query map is always
    // written to bench_out.json.
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // calib_sec is the PARALLEL anchor (32 concurrent fixed loops —
    // the contention profile a local[32] Spark run actually feels),
    // mean of the start/end readings, or -1.0 if either endpoint
    // degraded; the per-phase and single-thread values go to
    // bench_out.json for diagnosis. Normalize two runs by dividing
    // each key by its run's calib_sec.
    val calibSec = combineAnchors(calibPw0, calibPw1)
    def mkLine(qs: String) =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","calib_sec":${r3(calibSec)},"queries":$qs,"sf":"$sfDir"}"""
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // per-area rollup (key prefix before the first '_') — budget
    // tracking for the sidecar file only; the stdout line stays in the
    // exact driver-parsed shape
    val areas = results
      .groupBy { case (k, _) => k.takeWhile(_ != '_') }
      .toSeq
      .sortBy { case (_, vs) => -vs.map(_._2).sum }
      .map { case (a, vs) =>
        "\"" + a + "\":{\"sec\":" + r3(vs.map(_._2).sum) + ",\"n\":" + vs.size + "}"
      }
      .mkString("{", ",", "}")
    val calibDetail =
      s""""calib":{"par":$calibPar,"start_par_sec":${r3(calibPw0)},"end_par_sec":${r3(calibPw1)},"start_st_sec":${r3(calibSt0)},"end_st_sec":${r3(calibSt1)},"start_io_sec":${r3(calibIo0)},"end_io_sec":${r3(calibIo1)},"io_sec":${r3(combineAnchors(calibIo0, calibIo1))}}"""
    val traceDetail =
      s""""calib_trace":${calibTrace.mkString("[", ",", "]")},"key_trace":${keyTrace.mkString("[", ",", "]")}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"),
      mkLine(fullQs).dropRight(1) + s""","areas":$areas,$calibDetail,$traceDetail}""" + "\n")
    val budget = 1500
    val bySlow = results.toSeq.sortBy { case (k, v) => (-v, k) }
    val overhead = mkLine("{}").length + "\"_rest\":9999.999,".length
    var used = overhead
    val (kept, rest) = bySlow.span { case (k, v) =>
      val cost = k.length + r3(v).length + 4 // quotes, colon, comma
      if (used + cost <= budget) { used += cost; true } else false
    }
    val keptQs = (kept.map { case (k, v) => "\"" + k + "\":" + r3(v) } :+
      ("\"_rest\":" + r3(rest.map(_._2).sum))).mkString("{", ",", "}")
    println(mkLine(keptQs))
    spark.stop()
  }
}
