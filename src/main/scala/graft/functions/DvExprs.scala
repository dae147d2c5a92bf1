package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector membership as a broadcast-indexed NATIVE predicate —
  * the shuffle-free read path for merge-on-read tables.
  *
  * The plan-level alternative (anti-join the scan against the DV frame
  * on `(file_path, row_index)`) is correct but degrades to a FULL
  * SHUFFLE of the table scan on a per-row key the moment the DV
  * outgrows the broadcast-join threshold — the exact window right
  * before a compaction folds it. Iceberg/Delta readers instead apply
  * DVs per file inside the reader with zero data movement; this
  * expression reproduces that shape at the plan level: the whole DV is
  * loaded ONCE on the driver as `file path → sorted positions`,
  * broadcast (torrent, executor-count-bounded, NOT scan-sized), and
  * each scanned row does one hash probe + binary search inside the
  * scan's own whole-stage-codegen span. No exchange exists in the plan
  * at any DV size; [[graft.sources.GraftCatalog]] bounds driver memory
  * by falling back to the anti-join above a positions threshold.
  */
object DvIndex {

  /** Position membership probe. Called from generated code — keep the
    * signature stable. */
  def hit(idx: java.util.HashMap[UTF8String, Array[Long]],
      path: UTF8String, pos: Long): Boolean = {
    val arr = idx.get(path)
    arr != null && java.util.Arrays.binarySearch(arr, pos) >= 0
  }
}

/** TRUE iff `(path, pos)` is a deleted position in the broadcast DV
  * index. Children are the scan's own `_metadata` columns (path
  * pre-normalized to the DV writer's scheme-less key form). */
case class DvHit(left: Expression, right: Expression,
    index: Broadcast[java.util.HashMap[UTF8String, Array[Long]]])
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_dv_hit"

  override protected def nullSafeEval(path: Any, pos: Any): Any =
    DvIndex.hit(index.value, path.asInstanceOf[UTF8String],
      pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("graftDvIdx", index,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, (p, x) =>
      s"""${ev.value} = graft.functions.DvIndex.hit(
         |  (java.util.HashMap) $idx.value(), $p, $x);""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
