package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-tbl`: a complete DataSource V2 connector for a pipe-delimited
  * flat-file format — the extension surface a Spark-native engine hands
  * to users whose feeds arrive in a format Spark doesn't ship.
  *
  * What makes this the SCALE shape rather than an RDD-of-lines parse:
  *
  *   - **Column pruning reaches the reader** (`SupportsPushDownRequiredColumns`):
  *     Catalyst hands the post-pushdown required schema down, and the
  *     reader emits rows with exactly those fields. A filter column a
  *     fully-pushed predicate consumed is not even projected.
  *   - **Filter pushdown reaches the reader** (`SupportsPushDownFilters`):
  *     comparison/null-check predicates on the file's columns are
  *     evaluated inside the partition reader against the parsed line,
  *     before any row object crosses into the query — the rows a filter
  *     would drop never leave the scan. Unsupported predicates are
  *     returned to Spark for residual evaluation, so correctness never
  *     depends on the connector's ambition.
  *   - **Byte-range splits within large files** (round 10): a file
  *     larger than the split size becomes multiple InputPartitions,
  *     each owning the byte range `[start, start+length)` with the
  *     line-boundary convention of Hadoop's TextInputFormat: a reader
  *     whose range starts mid-file discards everything up to and
  *     including the first newline at-or-after `start` (that prefix
  *     belongs to the previous split), then reads every line whose
  *     first byte offset is ≤ `end` — including a line that starts
  *     exactly at `end`, which the next reader unconditionally
  *     discards. Each line is thus owned by exactly one split, however
  *     the boundaries fall. Without this, a feed of a few giant
  *     pipe-delimited files collapses to a few tasks at 100 TB. Split
  *     size: `split_bytes` read option, defaulting to
  *     `spark.sql.files.maxPartitionBytes` — the same knob that sizes
  *     Spark's own file scans.
  *
  * The provider requires an explicit read schema
  * (`supportsExternalMetadata`), the honest contract for a headerless
  * format — inference would be a guess. Supported field types: LONG,
  * DOUBLE, STRING (empty string ⇒ null for all three).
  */
/** Java-serializable Hadoop `Configuration` carrier for shipping the
  * SESSION'S conf inside reader/writer factories to executors. Without
  * it, executor code building `new Configuration()` loads only the
  * default resources — any non-default filesystem configuration the
  * session carries (object-store credentials, endpoints, timeouts)
  * silently vanishes on a real cluster (invisible in local mode, where
  * driver and "executor" share defaults). Hadoop's Configuration is
  * Writable but not Serializable, hence the custom hooks. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

class GraftTblSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft-tbl is a headerless format: supply an explicit schema via .schema(...)"
    )

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = {
    val path = properties.get("path")
    require(path != null, "graft-tbl requires a path")
    GraftTblTable(schema, path)
  }
}

case class GraftTblTable(tableSchema: StructType, path: String)
    extends Table
    with SupportsRead
    with SupportsWrite {
  override def name(): String = s"graft_tbl($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE
    )
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftTblScanBuilder(
      tableSchema,
      path,
      Option(options.get("split_bytes")).map(_.toLong)
    )
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftTblWriteBuilder(info.schema(), path)
}

class GraftTblScanBuilder(
    fullSchema: StructType,
    path: String,
    splitBytes: Option[Long]
) extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst calls this after filter pushdown with the columns the
    // query still needs; the reader projects exactly these.
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, unsupported) =
      filters.partition(GraftTblFilters.evaluable(_, fullSchema))
    pushed = supported
    // Only the predicates we cannot evaluate go back to Spark; the
    // accepted ones are enforced inside the reader, so the Filter node
    // above the scan drops them entirely.
    unsupported
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    GraftTblScan(fullSchema, required, pushed, path, splitBytes)
}

case class GraftTblScan(
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    path: String,
    splitBytes: Option[Long]
) extends Scan
    with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // Mirror FileSourceScanExec's metadata vocabulary so plan audits (and
  // PlanShapeSpec) read DSv2 scans the same way as parquet scans.
  override def description(): String =
    s"GraftTblScan ReadSchema: ${required.fieldNames.mkString("[", ",", "]")}" +
      s", PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val session = SparkSession.active
    val conf = session.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    // option > session files.maxPartitionBytes — the same sizing knob
    // Spark's own FileScan uses, so executor-memory tuning covers both.
    val split = splitBytes
      .getOrElse(session.sessionState.conf.filesMaxPartitionBytes)
      .max(1L)
    fs.listStatus(new Path(path))
      .filter(st => st.isFile && st.getLen > 0)
      .filterNot { st =>
        val p = st.getPath.toString
        p.contains("_SUCCESS") || p.contains("/.")
      }
      .sortBy(_.getPath.toString) // deterministic partition order
      .flatMap { st =>
        val len = st.getLen
        (0L until len by split).map { start =>
          GraftTblPartition(
            st.getPath.toString,
            start,
            math.min(split, len - start)
          ): InputPartition
        }
      }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // driver-side: capture the session's Hadoop conf into the factory
    // so executor-side readers resolve filesystems under it
    GraftTblReaderFactory(
      fullSchema,
      required,
      pushed,
      new SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf()
      )
    )
}

case class GraftTblPartition(file: String, start: Long, length: Long)
    extends InputPartition

case class GraftTblReaderFactory(
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    conf: SerializableHadoopConf
) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftTblPartition]
    new GraftTblReader(
      gp.file, gp.start, gp.length, fullSchema, required, pushed, conf.value)
  }
}

/** Executor-side line reader over the byte range `[start, start+length)`:
  * parse the full row once, evaluate the pushed predicates on it, then
  * emit only the required fields.
  *
  * Split ownership (see [[GraftTblSource]] doc): a mid-file reader
  * discards through the first newline at-or-after `start`, then reads
  * every line whose first byte is at offset ≤ `start+length` (the
  * boundary line is read here and discarded by the next reader) —
  * lines are counted in raw BYTES, so multi-byte UTF-8 never shifts
  * the boundary arithmetic. */
class GraftTblReader(
    file: String,
    start: Long,
    length: Long,
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    hadoopConf: Configuration
) extends PartitionReader[InternalRow] {

  private val fs = new Path(file).getFileSystem(hadoopConf)
  private val end = start + length
  private val stream = fs.open(new Path(file))
  private val in: java.io.InputStream = {
    if (start > 0) stream.seek(start)
    new java.io.BufferedInputStream(stream, 1 << 16)
  }
  // byte offset of the NEXT unread byte in the file
  private var pos: Long = start
  private val buf = new java.io.ByteArrayOutputStream(256)
  if (start > 0) readLineBytes() // discard the previous split's tail

  /** Reads one '\n'-terminated line (newline consumed, not returned);
    * null at EOF with nothing read. Advances `pos` by raw bytes. */
  private def readLineBytes(): Array[Byte] = {
    buf.reset()
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
    if (b == '\n') pos += 1
    buf.toByteArray
  }

  private val fieldIndex = fullSchema.fieldNames.zipWithIndex.toMap
  private val outIndices = required.fieldNames.map(fieldIndex)
  private var row: InternalRow = _

  override def next(): Boolean = {
    // a line STARTING beyond `end` belongs to the next split; starting
    // exactly AT `end` it is ours (the next reader's skip discards it)
    while (pos <= end) {
      val bytes = readLineBytes()
      if (bytes == null) return false
      var n = bytes.length
      if (n > 0 && bytes(n - 1) == '\r') n -= 1 // tolerate CRLF feeds
      val line = new String(bytes, 0, n, java.nio.charset.StandardCharsets.UTF_8)
      val parsed = parse(line)
      if (pushed.forall(GraftTblFilters.eval(_, name => parsed(fieldIndex(name))))) {
        val out = new Array[Any](outIndices.length)
        var i = 0
        while (i < outIndices.length) {
          val v = parsed(outIndices(i))
          out(i) = v match {
            case s: String => UTF8String.fromString(s)
            case other     => other
          }
          i += 1
        }
        row = new GenericInternalRow(out)
        return true
      }
    }
    false
  }

  private def parse(line: String): Array[Any] = {
    // -1 keeps trailing empty fields; empty string is the null marker.
    val parts = line.split("\\|", -1)
    require(
      parts.length == fullSchema.length,
      s"graft-tbl row has ${parts.length} fields, schema has ${fullSchema.length}"
    )
    fullSchema.fields.zipWithIndex.map { case (f, i) =>
      val s = parts(i)
      if (s.isEmpty) null
      else
        f.dataType match {
          case LongType   => java.lang.Long.parseLong(s)
          case DoubleType => java.lang.Double.parseDouble(s)
          case StringType => s
          case dt =>
            throw new UnsupportedOperationException(s"graft-tbl: $dt")
        }
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** The WRITE half: the standard two-phase commit protocol every
  * distributed file sink needs. Each task writes its rows to a
  * uniquely-named temp file under `_temp/` (unique per task ATTEMPT, so
  * speculative or retried attempts never collide), task `commit()`
  * reports the temp path to the driver, and only the driver-side
  * `BatchWrite.commit` — which Spark calls with EXACTLY ONE message per
  * partition — renames winners into place. A failed/losing attempt's
  * file is deleted by `abort()` and the job-level abort sweeps `_temp`.
  * Truncate (SaveMode.Overwrite) deletes prior committed files inside
  * the same driver commit, after the new files land — the swap is as
  * atomic as a rename-based protocol gets without a manifest (the
  * manifest/snapshot upgrade is what a table format adds on top; see
  * sink_manifest / sink_exactly_once for those postures). */
class GraftTblWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder
    with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      GraftTblBatchWrite(schema, path, doTruncate)
  }
}

case class GraftTblBatchWrite(
    schema: StructType,
    path: String,
    truncate: Boolean
) extends BatchWrite {

  // Job-unique suffix: final names can never collide with a previous
  // generation's, so the rename-commit never lands on an existing
  // target (HDFS/local rename does NOT overwrite — it returns false
  // and the stale file would silently win; measured exactly that).
  private val jobId = java.util.UUID.randomUUID.toString.take(8)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo
  ): DataWriterFactory =
    // driver-side: session conf rides the factory to executor writers
    GraftTblWriterFactory(
      schema,
      path,
      new SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf()
      )
    )

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    val committed = messages.collect { case GraftTblCommit(temp, part) =>
      (temp, part)
    }
    // snapshot the superseded generation BEFORE landing the new one
    val previous =
      if (truncate && fs.exists(new Path(path)))
        fs.listStatus(new Path(path))
          .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
          .map(_.getPath)
      else Array.empty[Path]
    committed.foreach { case (temp, part) =>
      val target = new Path(s"$path/part-$part-$jobId.gtbl")
      require(
        fs.rename(new Path(temp), target),
        s"graft-tbl commit: rename $temp -> $target failed"
      )
    }
    previous.foreach(fs.delete(_, false))
    fs.delete(new Path(s"$path/_temp"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    fs.delete(new Path(s"$path/_temp"), true)
  }
}

case class GraftTblCommit(tempPath: String, partitionId: Int)
    extends WriterCommitMessage

case class GraftTblWriterFactory(
    schema: StructType,
    path: String,
    conf: SerializableHadoopConf
) extends DataWriterFactory {
  override def createWriter(
      partitionId: Int,
      taskId: Long
  ): DataWriter[InternalRow] =
    new GraftTblWriter(schema, path, partitionId, taskId, conf.value)
}

class GraftTblWriter(
    schema: StructType,
    path: String,
    partitionId: Int,
    taskId: Long,
    hadoopConf: Configuration
) extends DataWriter[InternalRow] {

  private val temp = s"$path/_temp/attempt-$partitionId-$taskId.gtbl"
  private val fs = new Path(temp).getFileSystem(hadoopConf)
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(
      fs.create(new Path(temp), true),
      java.nio.charset.StandardCharsets.UTF_8
    )
  )

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append('|')
      if (!row.isNullAt(i)) // null ⇒ empty field, the reader's marker
        schema.fields(i).dataType match {
          case LongType   => sb.append(row.getLong(i))
          case DoubleType => sb.append(row.getDouble(i))
          case StringType => sb.append(row.getUTF8String(i).toString)
          case dt =>
            throw new UnsupportedOperationException(s"graft-tbl: $dt")
        }
      i += 1
    }
    out.write(sb.toString)
    out.newLine()
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftTblCommit(temp, partitionId)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(new Path(temp), false)
  }

  override def close(): Unit = ()
}

/** The connector's predicate dialect: simple comparisons and null
  * checks against literal values, SQL null semantics (a comparison with
  * a null field is not-true). Everything else is left to Spark. */
object GraftTblFilters {

  def evaluable(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(a, v)            => ok(a, v, schema)
    case GreaterThan(a, v)        => ok(a, v, schema)
    case GreaterThanOrEqual(a, v) => ok(a, v, schema)
    case LessThan(a, v)           => ok(a, v, schema)
    case LessThanOrEqual(a, v)    => ok(a, v, schema)
    case IsNotNull(a)             => schema.fieldNames.contains(a)
    case IsNull(a)                => schema.fieldNames.contains(a)
    case _                        => false
  }

  private def ok(attr: String, v: Any, schema: StructType): Boolean =
    schema.fieldNames.contains(attr) && (v match {
      case _: Long | _: Int | _: Double | _: String => true
      case _                                        => false
    })

  def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v)            => cmp(get(a), v).contains(0)
    case GreaterThan(a, v)        => cmp(get(a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(get(a), v).exists(_ >= 0)
    case LessThan(a, v)           => cmp(get(a), v).exists(_ < 0)
    case LessThanOrEqual(a, v)    => cmp(get(a), v).exists(_ <= 0)
    case IsNotNull(a)             => get(a) != null
    case IsNull(a)                => get(a) == null
    case other =>
      throw new IllegalStateException(s"unreachable: $other was not pushed")
  }

  /** None = null operand (comparison yields not-true, SQL semantics). */
  private def cmp(field: Any, lit: Any): Option[Int] = (field, lit) match {
    case (null, _) | (_, null)  => None
    case (a: String, b: String) => Some(a.compareTo(b))
    // integral pairs stay in long space — a double route would corrupt
    // comparisons on 64-bit surrogate keys past 2^53
    case (a: Long, b: Long) => Some(java.lang.Long.compare(a, b))
    case (a: Long, b: Int)  => Some(java.lang.Long.compare(a, b.toLong))
    case (a, b) => // mixed numeric: Long/Int/Double in either slot
      Some(java.lang.Double.compare(toD(a), toD(b)))
  }

  private def toD(x: Any): Double = x match {
    case l: Long   => l.toDouble
    case i: Int    => i.toDouble
    case d: Double => d
    case other =>
      throw new IllegalStateException(s"non-numeric comparison operand $other")
  }
}
