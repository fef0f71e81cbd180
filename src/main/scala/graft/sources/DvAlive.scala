package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side lazy deletion-vector lookup. Serialized into each scan
  * task carrying only O(DV'd files) METADATA — a (base file name →
  * sidecar path) string map — never the positions themselves. The
  * sidecar bytes are read ON THE EXECUTOR, on first touch of that
  * file's rows, and cached per task instance, so:
  *
  *   - the driver performs ZERO sidecar round trips for a read
  *     (pinned by [[SnapshotLog.driverDvReads]] in MorSpec);
  *   - no global (file → all positions) broadcast exists anywhere —
  *     at 10⁹ deleted positions across 10⁵ files, the old
  *     driver-assembled map cost 10⁵ driver round trips and a
  *     multi-GB broadcast before the first task ran;
  *   - each task holds at most the DVs of the files IT scans
  *     (typically one: Spark packs parquet splits file-contiguously),
  *     which is the same memory the table formats' per-task position
  *     -delete readers pay.
  *
  * The cache is per-instance and transient: each task deserializes its
  * own lookup, so there is no cross-task sharing to synchronize beyond
  * the CHM and no lifecycle to manage — task ends, cache unreachable.
  */
private[sources] class DvSidecarLookup(
    dvPathByFile: Map[String, String],
    conf: SerializableHadoopConf
) extends Serializable {

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  def alive(file: UTF8String, pos: Long): Boolean = {
    val f = file.toString
    val side = dvPathByFile.getOrElse(f, null)
    if (side == null) true
    else {
      var arr = cache.get(f)
      if (arr == null) {
        arr = SnapshotLog.readDvFile(conf.value, new Path(side))
        cache.put(f, arr)
      }
      java.util.Arrays.binarySearch(arr, pos) < 0
    }
  }
}

/** `dv_alive(file, pos)` — true iff the row at in-file position `pos`
  * of data file `file` is NOT listed in that file's deletion vector.
  * A native codegen'd predicate (stays inside WholeStageCodegen; the
  * round-11 UDF it replaces broke the span), evaluated against the
  * per-task [[DvSidecarLookup]] via a reference object — the
  * per-partition DV application the MoR read path needs at scale. */
private[sources] case class DvAlive(
    left: Expression,
    right: Expression,
    lookup: DvSidecarLookup
) extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "dv_alive"

  override def nullSafeEval(f: Any, p: Any): Any =
    lookup.alive(f.asInstanceOf[UTF8String], p.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref =
      ctx.addReferenceObj("dvLookup", lookup, classOf[DvSidecarLookup].getName)
    nullSafeCodeGen(ctx, ev, (f, p) => s"${ev.value} = $ref.alive($f, $p);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}
