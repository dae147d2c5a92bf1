package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable-sketch aggregates beyond Spark's built-in HLL family.
  *
  * Spark 4 ships Datasketches HLL (`hll_sketch_agg` — distinct COUNTS
  * only). The two sketch families a 100 TB dataset card additionally
  * needs are native here, built on the same bundled datasketches-java:
  *
  *  - **Theta** ([[ThetaSketchAgg]] + the set-op scalars): distinct
  *    SET ALGEBRA — intersection / difference cardinalities across
  *    cohorts, the month-over-month retention/churn shape that HLL
  *    (union-only) structurally cannot answer. Below the nominal-
  *    entries capacity (lgK=16 → 65536) a theta sketch retains every
  *    distinct hash with theta=1, so estimates — including through
  *    intersections and A-NOT-B — are EXACT and oracle-checkable
  *    (q108, the q106 exactness-boundary contract); above it they
  *    degrade to bounded estimates with the same code path.
  *  - **KLL** ([[KllSketchAgg]] / [[KllMergeAgg]] / [[KllQuantiles]]):
  *    mergeable QUANTILES — persisted per-batch percentile partials
  *    under q103's MV maintenance contract (q107), with the published
  *    normalized-rank-error bound (k=200 → ~1.65%).
  *
  * All three aggregates are TypedImperativeAggregate: the buffer is
  * the live sketch object, serialized ONLY at shuffle/spill
  * boundaries (compact theta bytes / KLL byte image) — the partial/
  * final split Catalyst already plans for every aggregate, so the map
  * side streams rows into a local sketch and only sketch states cross
  * the wire. Update paths are plain JVM calls on primitives: no
  * per-row allocation beyond the sketch's own amortized growth.
  *
  * Reference anchor: docs/6_aggregates.md (partial aggregation);
  * estimates follow the Datasketches published error tables.
  */
object SketchExprs {
  private[functions] def heapifyTheta(bytes: Array[Byte]): CompactSketch =
    CompactSketch.heapify(Memory.wrap(bytes))

  private[functions] def emptyUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
}

/** `theta_sketch_agg(x)` → compact theta sketch bytes of the distinct
  * set of `x` (long / int / string). lgK=16: exact below 65536
  * retained entries, bounded estimate above. */
final case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 16,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg takes long/int/string, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): Union = SketchExprs.emptyUnion(lgK)

  override def update(u: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => u.update(v.asInstanceOf[Long])
      case IntegerType => u.update(v.asInstanceOf[Int].toLong)
      case StringType  => u.update(v.toString) // UTF8String → String
      case _           => ()
    }
    u
  }

  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }

  override def eval(u: Union): Any = u.getResult.toByteArray

  override def serialize(u: Union): Array[Byte] = u.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(SketchExprs.heapifyTheta(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `theta_count(sketch)` → rounded distinct-count estimate (exact in
  * the exact regime: theta=1 ⇒ the estimate IS the retained count). */
final case class ThetaCount(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "theta_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"theta_count takes a theta sketch (binary), got ${dt.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    math.round(SketchExprs.heapifyTheta(v.asInstanceOf[Array[Byte]]).getEstimate)
  override protected def withNewChildInternal(newChild: Expression): ThetaCount =
    copy(child = newChild)
}

/** Set-algebra counts over two theta sketches: `op` ∈ intersect |
  * anotb | union. A tiny scalar on already-aggregated sketch rows
  * (one per group), so CodegenFallback costs nothing measurable. */
final case class ThetaSetOpCount(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = s"theta_${op}_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta set ops take two theta sketches (binary), got ${l.catalogString}, ${r.catalogString}")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = SketchExprs.heapifyTheta(a.asInstanceOf[Array[Byte]])
    val sb = SketchExprs.heapifyTheta(b.asInstanceOf[Array[Byte]])
    val est = op match {
      case "intersect" =>
        SetOperation.builder().buildIntersection().intersect(sa, sb).getEstimate
      case "anotb" =>
        SetOperation.builder().buildANotB().aNotB(sa, sb).getEstimate
      case "union" =>
        val u = SketchExprs.emptyUnion(16); u.union(sa); u.union(sb)
        u.getResult.getEstimate
      case other => throw new IllegalArgumentException(s"unknown theta op $other")
    }
    math.round(est)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOpCount =
    copy(left = newLeft, right = newRight)
}

/** `kll_sketch_agg(x)` → KLL doubles quantile-sketch bytes of `x`
  * (numeric). k=200: ~1.65% normalized rank error at 99% confidence,
  * mergeable partials a few KB each regardless of input size. */
final case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg takes a numeric column, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(s: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) s.update(v.asInstanceOf[Number].doubleValue())
    s
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(s: KllDoublesSketch): Any = s.toByteArray
  override def serialize(s: KllDoublesSketch): Array[Byte] = s.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `kll_merge_agg(sketch)` → merge of persisted KLL partial states
  * (binary column) into one sketch — the MV refresh read path:
  * O(batches) sketch rows in, one sketch out, never the raw rows. */
final case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg takes KLL sketch bytes (binary), got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(s: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      s.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    s
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(s: KllDoublesSketch): Any = s.toByteArray
  override def serialize(s: KllDoublesSketch): Array[Byte] = s.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_quantiles(sketch, array(p…))` → array of quantile estimates
  * (INCLUSIVE search criteria — the `percentile_disc` cume_dist ≥ p
  * convention, so an uncompacted sketch reproduces exact discrete
  * percentiles). NULL sketch → NULL. */
final case class KllQuantiles(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "kll_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(_: NumericType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantiles takes (sketch binary, array<double>), got ${l.catalogString}, ${r.catalogString}")
    }
  override protected def nullSafeEval(sk: Any, ps: Any): Any = {
    val s = KllDoublesSketch.heapify(Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    val arr = ps.asInstanceOf[ArrayData].toDoubleArray()
    if (s.isEmpty) new GenericArrayData(Array.fill(arr.length)(Double.NaN))
    else new GenericArrayData(
      s.getQuantiles(arr, QuantileSearchCriteria.INCLUSIVE))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantiles =
    copy(left = newLeft, right = newRight)
}
