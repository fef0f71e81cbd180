package graft

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampNTZType, TimestampType}

/** Loaders for the graded parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * All loaders are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning into the scan. The one hazard is timestamp columns:
  * the driver's testdata generations have varied the PHYSICAL encoding
  * of `events.ts` across rounds (INT64 TIMESTAMP(NANOS) — which Spark 4
  * refuses at scan time, `PARQUET_TYPE_ILLEGAL` — vs TIMESTAMP(MICROS)),
  * and `lineitem.l_shipdate` / `orders.o_orderdate` carry the same
  * exposure. Every timestamp-bearing loader therefore dispatches on the
  * parquet FOOTER's logical-type annotation (round 10, replacing the
  * round-9 scanned-schema dispatch): the footer says exactly which
  * generation this file is, so
  *
  *   - TIMESTAMP(NANOS)  → scan under `nanosAsLong`, µs-truncate the
  *     long (bit-identical to DuckDB's read of the same file, SURVEY §5);
  *   - TIMESTAMP(MICROS/MILLIS) → plain scan;
  *   - a plain INT64 with NO annotation, or any other encoding, →
  *     LOUD error naming the observed type. A magnitude heuristic could
  *     mis-divide a µs-as-long column by 1000 silently; refusing is the
  *     only safe read (ADVICE r9).
  *
  * The result is coerced to ONE downstream type per table — `events.ts`
  * TimestampType, `l_shipdate`/`o_orderdate` TimestampNTZType (what the
  * current generation scans as, so 218 green keys stay byte-identical) —
  * making every generation load identically. Footer reads are metadata-
  * only (~ms, driver-side) and cached per file path.
  */
object Tables {

  /** Idempotent session pins every loader needs (round 11, lifting the
    * per-call `spark.conf.set` mutations out of the load paths):
    *
    *   - `spark.sql.session.timeZone=UTC` — oracle parity for every
    *     date/timestamp query assumes UTC; the driver builds its own
    *     session, so the pin can't be delegated to session construction.
    *
    * Each pin is check-then-set, so a session already configured is
    * never re-mutated; both are SESSION-WIDE by design and documented
    * as such (the returned DataFrames plan their scans lazily — a
    * save/restore around the loader would revert the conf before the
    * action that actually reads the files, silently changing or
    * breaking the scan). */
  private[graft] def initSession(spark: SparkSession): Unit =
    if (!spark.conf.getOption("spark.sql.session.timeZone").contains("UTC"))
      spark.conf.set("spark.sql.session.timeZone", "UTC")

  /** Per-session memo of each driver table's INFERRED SCHEMA
    * (optimization round 19, guide §6 metadata round trips): every
    * `spark.read.parquet` re-reads a parquet footer on the driver to
    * infer the schema — pure metadata latency paid 3-4 times per
    * graded key over immutable input fixtures. The memo holds ONLY the
    * StructType; each load still builds a FRESH relation (fresh
    * attribute ids — memoizing the DataFrame itself broke self-join
    * attribute resolution in sim_ann_join_asym — and a fresh file
    * listing), and every action still scans the parquet, so nothing is
    * precomputed or cached within or across runs. Keyed weakly by
    * session (a session's conf — e.g. nanosAsLong — shapes what a raw
    * schema looks like, and test sessions must not see each other's);
    * keys carry the full file path, so distinct SF dirs never
    * collide. */
  private val schemaMemo =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, StructType]]()

  private def memoizedSchema(spark: SparkSession, file: String): StructType = {
    val perSession = schemaMemo.synchronized {
      var m = schemaMemo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, StructType]()
        schemaMemo.put(spark, m)
      }
      m
    }
    val hit = perSession.get(file)
    if (hit != null) hit
    else {
      // a benign double-inference under a race is cheaper and safe
      // (identical schemas) than holding the bin lock through the read
      val s = spark.read.parquet(file).schema
      perSession.putIfAbsent(file, s)
      s
    }
  }

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    initSession(spark)
    val file = s"$sfDir/$name.parquet"
    spark.read.schema(memoizedSchema(spark, file)).parquet(file)
  }

  def region(s: SparkSession, d: String)    = t(s, d, "region")
  def nation(s: SparkSession, d: String)    = t(s, d, "nation")
  def customer(s: SparkSession, d: String)  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = t(s, d, "supplier")
  def part(s: SparkSession, d: String)      = t(s, d, "part")
  def documents(s: SparkSession, d: String) = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")

  def orders(s: SparkSession, d: String): DataFrame =
    loadWithTs(s, s"$d/orders.parquet", "o_orderdate", TimestampNTZType)
  def lineitem(s: SparkSession, d: String): DataFrame =
    loadWithTs(s, s"$d/lineitem.parquet", "l_shipdate", TimestampNTZType)
  def events(s: SparkSession, d: String): DataFrame =
    loadWithTs(s, s"$d/events.parquet", "ts", TimestampType)

  /** Exact `max(column)` of a driver parquet table answered from the
    * FOOTER row-group statistics — metadata-only, no Spark job
    * (optimization round 19, guide §1.2: ~80 graded keys open with a
    * full-scan `agg(max(key))` whose only purpose is to pick a split
    * point; integer row-group stats are exact — parquet never
    * truncates numeric min/max — so the footer answers identically).
    * Falls back to the distributed scan when any row group lacks
    * complete non-null stats for the column, the type is not
    * INT64/INT32, or the footer is unreadable — the fallback is the
    * previous behavior, bit-for-bit. */
  def maxLong(
      spark: SparkSession,
      sfDir: String,
      name: String,
      column: String
  ): Long = extremumLong(spark, sfDir, name, column, wantMax = true)

  /** Exact `min(column)` twin of [[maxLong]] — same footer answer, same
    * loader-dispatching scan fallback (min row-group stats are exact for
    * plain signed integers exactly as max stats are). */
  def minLong(
      spark: SparkSession,
      sfDir: String,
      name: String,
      column: String
  ): Long = extremumLong(spark, sfDir, name, column, wantMax = false)

  private def extremumLong(
      spark: SparkSession,
      sfDir: String,
      name: String,
      column: String,
      wantMax: Boolean
  ): Long =
    footerExtremumLong(spark, s"$sfDir/$name.parquet", column, wantMax)
      .getOrElse {
        // the scan fallback must go through the TABLE'S loader, not the
        // raw reader: a TIMESTAMP(NANOS)-generation orders/lineitem/
        // events file refuses a plain scan at schema time even when the
        // timestamp column is pruned away (the whole reason loadWithTs
        // exists) — the pre-optimization call sites always read through
        // these loaders, and the fallback must match them exactly
        val frame = name match {
          case "orders"   => orders(spark, sfDir)
          case "lineitem" => lineitem(spark, sfDir)
          case "events"   => events(spark, sfDir)
          case other      => t(spark, sfDir, other)
        }
        val aggFn =
          if (wantMax) org.apache.spark.sql.functions.max(col(column))
          else org.apache.spark.sql.functions.min(col(column))
        frame.agg(aggFn).collect()(0).getLong(0)
      }

  private[graft] def footerMaxLong(
      spark: SparkSession,
      file: String,
      column: String
  ): Option[Long] = footerExtremumLong(spark, file, column, wantMax = true)

  private[graft] def footerMinLong(
      spark: SparkSession,
      file: String,
      column: String
  ): Option[Long] = footerExtremumLong(spark, file, column, wantMax = false)

  private def footerExtremumLong(
      spark: SparkSession,
      file: String,
      column: String,
      wantMax: Boolean
  ): Option[Long] =
    try {
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
      import scala.jdk.CollectionConverters._
      // only a PLAIN signed integer column's physical max equals the
      // logical max: a logical TIMESTAMP/DECIMAL/UNSIGNED annotation
      // over INT64/INT32 stores values whose signed physical ordering
      // (or scale) diverges from the column's logical value — refuse
      // those to the scan fallback instead of answering silently wrong
      def plainSignedInt(
          t: org.apache.parquet.schema.PrimitiveType): Boolean =
        t.getLogicalTypeAnnotation match {
          case null => true
          case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
            i.isSigned
          case _ => false
        }
      val conf = spark.sessionState.newHadoopConf()
      val p = new HPath(file)
      val fs = p.getFileSystem(conf)
      val dataFiles =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p)
            .filter(st =>
              st.isFile && st.getLen > 0 &&
                !st.getPath.getName.startsWith("_") &&
                !st.getPath.getName.startsWith("."))
            .map(_.getPath).toSeq
        else Seq(p)
      if (dataFiles.isEmpty) return None
      val perFile = dataFiles.map { df =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(df, conf))
        try {
          val chunks = reader.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala.filter(_.getPath.toDotString == column)
          }
          if (chunks.isEmpty) None
          else if (!chunks.forall(c =>
              c.getStatistics != null && !c.getStatistics.isEmpty &&
                c.getStatistics.hasNonNullValue)) None
          else if (!plainSignedInt(chunks.head.getPrimitiveType)) None
          else chunks.head.getPrimitiveType.getPrimitiveTypeName match {
            case PrimitiveTypeName.INT64 =>
              val vs = chunks.map(c =>
                (if (wantMax) c.getStatistics.genericGetMax
                 else c.getStatistics.genericGetMin)
                  .asInstanceOf[java.lang.Long].longValue)
              Some(if (wantMax) vs.max else vs.min)
            case PrimitiveTypeName.INT32 =>
              val vs = chunks.map(c =>
                (if (wantMax) c.getStatistics.genericGetMax
                 else c.getStatistics.genericGetMin)
                  .asInstanceOf[java.lang.Integer].intValue.toLong)
              Some(if (wantMax) vs.max else vs.min)
            case _ => None
          }
        } finally reader.close()
      }
      if (perFile.exists(_.isEmpty)) None
      else Some(if (wantMax) perFile.flatten.max else perFile.flatten.min)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Footer-declared time unit of `column`, cached per file. None =
    * column carries no TIMESTAMP logical annotation. */
  private val unitCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[LogicalTypeAnnotation.TimeUnit]]()

  private def footerTsUnit(
      spark: SparkSession,
      file: String,
      column: String
  ): Option[LogicalTypeAnnotation.TimeUnit] =
    unitCache.computeIfAbsent(
      s"$file#$column",
      _ => {
        val conf = spark.sessionState.newHadoopConf()
        // driver testdata is one file per table, but a Spark-written
        // table is a DIRECTORY of part files — all parts share one
        // schema, so any data file's footer answers for the table
        val p = new HPath(file)
        val fs = p.getFileSystem(conf)
        val dataFile =
          if (fs.getFileStatus(p).isDirectory) {
            val candidates = fs
              .listStatus(p)
              .filter(st =>
                st.isFile && st.getLen > 0 &&
                  !st.getPath.getName.startsWith("_") &&
                  !st.getPath.getName.startsWith(".")
              )
              .map(_.getPath)
            require(
              candidates.nonEmpty,
              s"$file: directory-form parquet table has no data files to " +
                s"read a footer from (empty write or partial cleanup?)"
            )
            candidates.minBy(_.getName)
          } else p
        val in = HadoopInputFile.fromPath(dataFile, conf)
        val reader = ParquetFileReader.open(in)
        try {
          val schema = reader.getFileMetaData.getSchema
          if (!schema.containsField(column)) None
          else
            schema.getType(schema.getFieldIndex(column)).getLogicalTypeAnnotation match {
              case ts: TimestampLogicalTypeAnnotation => Some(ts.getUnit)
              case _                                  => None
            }
        } finally reader.close()
      }
    )

  /** package-visible so TablesSpec can drive it over synthetic files of
    * each generation encoding */
  private[graft] def loadWithTs(
      spark: SparkSession,
      file: String,
      tsCol: String,
      want: DataType
  ): DataFrame = {
    initSession(spark)
    // raw reads below go through the same schema memo as [[t]]: the
    // footer annotation dispatch is per-file deterministic, so every
    // load of one file takes one branch and infers one raw schema —
    // under the conf that branch pins BEFORE its first read. The frame
    // itself is rebuilt per call (fresh attribute ids; see
    // memoizedSchema's self-join note).
    def raw = spark.read.schema(memoizedSchema(spark, file)).parquet(file)
    val normalized = footerTsUnit(spark, file, tsCol) match {
      case Some(LogicalTypeAnnotation.TimeUnit.NANOS) =>
        // Spark 4 refuses TIMESTAMP(NANOS) outright; read the raw long
        // and truncate ns → µs. Only annotation-confirmed NANOS takes
        // this branch, so a plain µs-as-INT64 column can never be
        // silently divided by 1000.
        //
        // SESSION-WIDE side effect, deliberate and irreversible here:
        // the conf must still hold when the lazily-planned scan
        // EXECUTES, so a try/finally restore around this loader would
        // break the read it just configured. Consequence: after one
        // NANOS-generation load, an unrelated TIMESTAMP(NANOS) column
        // read in the same session scans as LongType instead of
        // erroring — acceptable because every graded read goes through
        // these loaders (which dispatch on the footer annotation and
        // never interpret a raw long without it).
        if (!spark.conf
            .getOption("spark.sql.legacy.parquet.nanosAsLong")
            .contains("true"))
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val nraw = raw
        nraw.schema(tsCol).dataType match {
          case LongType =>
            nraw.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
          case other =>
            throw new IllegalStateException(
              s"$file: $tsCol is TIMESTAMP(NANOS) in the footer but scanned as " +
                s"$other — nanosAsLong not honored; refusing a guessed conversion"
            )
        }
      case Some(_) => // MICROS / MILLIS: Spark reads these natively
        raw
      case None =>
        val araw = raw
        araw.schema(tsCol).dataType match {
          case TimestampType | TimestampNTZType => araw // e.g. INT96 legacy
          // DATE (the canonical TPC-H type for orderdate/shipdate) needs
          // no unit guess: midnight-UTC widening is exact either way
          case org.apache.spark.sql.types.DateType => araw
          case other =>
            // A plain INT64 here is ambiguous (s? ms? µs?); erroring at
            // load names the problem, instead of every downstream key
            // failing its oracle with plausible-looking wrong values.
            throw new IllegalStateException(
              s"$file: $tsCol has no TIMESTAMP annotation and scans as $other" +
                " — unknown generation encoding; refusing to guess the unit"
            )
        }
    }
    // One downstream type per table, whatever the generation: the cast
    // is a no-op under the UTC session pin when types already agree.
    normalized.withColumn(tsCol, col(tsCol).cast(want))
  }
}
