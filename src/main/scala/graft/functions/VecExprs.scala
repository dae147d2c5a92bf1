package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math over embedding columns (array<float> or
  * array<double>).
  *
  * Semantics match the higher-order-function formulation exactly —
  * elements are widened to double and accumulated left-to-right — so
  * results are bit-identical to the DuckDB oracle's list_reduce fold;
  * only the interpreter overhead (a lambda dispatch per element) is
  * gone. Unlike the sketch expressions, these implement doGenCode
  * (a one-line call into the static loop below), so they keep the
  * surrounding whole-stage-codegen span fused — at cluster scale the
  * cosine filter/projection stays a single generated loop per batch.
  */
object VecOps {
  def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  /** Σ a_i·b_i in double, left-to-right. Called from generated code. */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** sqrt(Σ a_i²) in double, left-to-right. Called from generated code. */
  def norm(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }
}

/** Random-hyperplane LSH over embedding vectors (the scale path for
  * ANN, reference-free: sign-of-projection bucketing is the classic
  * SimHash-for-vectors construction).
  *
  * The hyperplane matrix is a deterministic pseudo-random constant —
  * derived from xxhash64 at class load, identical on every executor —
  * so the per-row work is exactly NumPlanes dot products in a tight
  * JVM loop. This replaces the round-1 formulation that rebuilt the
  * matrix per row inside interpreted HOFs (measured 6-9× slower than
  * the brute-force scan it was meant to beat).
  */
object LshOps {
  val NumPlanes = 8
  private[functions] val MaxDim = 2048

  /** The hyperplanes cover MaxDim dimensions; a longer vector would be
    * silently sketch-truncated (degraded Hamming ranking with no
    * error), so fail loudly instead — same contract as the decoders. */
  private[functions] def checkDim(n: Int): Unit =
    require(n <= MaxDim, s"vector dim $n exceeds hyperplane coverage MaxDim=$MaxDim")

  /** Flat NumPlanes × MaxDim matrix, values uniform-ish in [-1, 1):
    * planes(p * MaxDim + j) is plane p's coefficient for dimension j. */
  val planes: Array[Double] = {
    val a = new Array[Double](NumPlanes * MaxDim)
    var i = 0
    while (i < a.length) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(i.toLong, 42L)
      a(i) = java.lang.Math.floorMod(h, 2000003L).toDouble / 1000001.5 - 1.0
      i += 1
    }
    a
  }

  /** Query-side multi-probe plan: the `budget` XOR masks with the
    * smallest flipped-margin mass (sum of squared projections over the
    * flipped planes), applied to the query's own bucket. Mask 0 scores
    * 0, so the query bucket is always probed first. Driver-side by
    * design — the probe list is O(2^NumPlanes) query metadata, exactly
    * what an ANN library's query planner computes before touching the
    * index; it never sees table data. */
  def probePlan(q: Array[Float], budget: Int): Array[Long] = {
    checkDim(q.length)
    val n = q.length
    val proj = new Array[Double](NumPlanes)
    var p = 0
    while (p < NumPlanes) {
      val off = p * MaxDim
      var acc = 0.0
      var j = 0
      while (j < n) { acc += q(j) * planes(off + j); j += 1 }
      proj(p) = acc
      p += 1
    }
    var qb = 0L
    p = 0
    while (p < NumPlanes) { if (proj(p) > 0) qb |= 1L << p; p += 1 }
    (0 until (1 << NumPlanes)).map { m =>
      var sc = 0.0
      var i = 0
      while (i < NumPlanes) {
        if (((m >> i) & 1) == 1) sc += proj(i) * proj(i)
        i += 1
      }
      (m, sc)
    }.sortBy { case (m, sc) => (sc, m) }
      .take(budget)
      .map { case (m, _) => m.toLong ^ qb }
      .toArray
  }

  /** Sign-bit bucket: bit p of the result is 1 iff v · plane_p > 0.
    * Called from generated code. */
  def bucket(v: ArrayData, isFloat: Boolean): Long = {
    val n = v.numElements()
    checkDim(n)
    var out = 0L
    var p = 0
    while (p < NumPlanes) {
      val off = p * MaxDim
      var acc = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        acc += x * planes(off + j)
        j += 1
      }
      if (acc > 0) out |= 1L << p
      p += 1
    }
    out
  }
}

/** 64-plane sign signature for sketch-scan ANN (s05): an 8-byte
  * Hamming proxy for angle, precomputed at index-build time so the
  * query-time stage-1 scan reads 8 bytes per row (plus the id) and
  * ranks by XOR+popcount instead of a 64-MAC dot product. Distinct
  * from LshOps (8 planes → 256 partition buckets): the signature is a
  * per-row payload column, not a partition key. Plane seed differs
  * from LshOps so the two sketches are independent.
  */
object SignOps {
  val NumPlanes = 64
  private val MaxDim = LshOps.MaxDim

  val planes: Array[Double] = {
    val a = new Array[Double](NumPlanes * MaxDim)
    var i = 0
    while (i < a.length) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(i.toLong, 4242L)
      a(i) = java.lang.Math.floorMod(h, 2000003L).toDouble / 1000001.5 - 1.0
      i += 1
    }
    a
  }

  /** v · plane_p over the first n dims; `at` abstracts the two element
    * sources (ArrayData vs Array[Float]) — Function1[Int, Double] is
    * @specialized, so the loop stays box-free. */
  private def planeDot(p: Int, n: Int, at: Int => Double): Double = {
    val off = p * MaxDim
    var acc = 0.0
    var j = 0
    while (j < n) { acc += at(j) * planes(off + j); j += 1 }
    acc
  }

  private def signature(n: Int, at: Int => Double): Long = {
    LshOps.checkDim(n)
    var out = 0L
    var p = 0
    while (p < NumPlanes) {
      if (planeDot(p, n, at) > 0) out |= 1L << p
      p += 1
    }
    out
  }

  /** Bit p of the result is 1 iff v · plane_p > 0. Called from
    * generated code. */
  def sign(v: ArrayData, isFloat: Boolean): Long = {
    val at: Int => Double =
      if (isFloat) v.getFloat(_).toDouble else v.getDouble(_)
    signature(v.numElements(), at)
  }

  /** Driver-side signature of the query vector (same math as sign). */
  def signOf(q: Array[Float]): Long = signature(q.length, q(_).toDouble)
}

/** vec_sign64(a): 64-bit random-hyperplane sign signature. */
final case class VecSign64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecOps.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sign64 needs array<float|double>, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_sign64"

  override def nullSafeEval(input: Any): Any =
    SignOps.sign(input.asInstanceOf[ArrayData], VecOps.isFloat(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = VecOps.isFloat(child.dataType).toString
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SignOps.sign($a, $f);")
  }

  override protected def withNewChildInternal(newChild: Expression): VecSign64 =
    copy(child = newChild)
}

/** lsh_bucket64(a): NumPlanes-bit random-hyperplane LSH bucket id. */
final case class LshBucket64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecOps.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket64 needs array<float|double>, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket64"

  override def nullSafeEval(input: Any): Any =
    LshOps.bucket(input.asInstanceOf[ArrayData], VecOps.isFloat(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = VecOps.isFloat(child.dataType).toString
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LshOps.bucket($a, $f);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket64 =
    copy(child = newChild)
}

/** vec_dot(a, b): Σ a_i·b_i in double, left-to-right. */
final case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecOps.isVec(left.dataType) && VecOps.isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs array<float|double>, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any =
    VecOps.dot(
      l.asInstanceOf[ArrayData], VecOps.isFloat(left.dataType),
      r.asInstanceOf[ArrayData], VecOps.isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val af = VecOps.isFloat(left.dataType).toString
    val bf = VecOps.isFloat(right.dataType).toString
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.dot($a, $af, $b, $bf);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization asymmetric-distance scoring (s07): the
  * stage-1 scan evaluates Σ_m lut[m·K + codes[m]] per row — M table
  * lookups against the query's precomputed per-subspace dot-product
  * table instead of a full-dimension MAC loop. K is inferred from the
  * table length so the expression works for any (M, K) codebook. */
object PqOps {
  /** Called from generated code. Out-of-range codes (corrupt index or
    * a codebook/codes mismatch) fail loudly via the bounds check. */
  def adc(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val k = lut.numElements() / m
    var acc = 0.0
    var i = 0
    while (i < m) {
      val c = codes.getInt(i)
      require(c >= 0 && c < k, s"PQ code $c out of range [0, $k) at subspace $i")
      acc += lut.getDouble(i * k + c)
      i += 1
    }
    acc
  }
}

/** pq_adc(codes, lut): PQ asymmetric-distance lookup-table sum. */
final case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc needs (array<int>, array<double>), got $l, $r")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(l: Any, r: Any): Any =
    PqOps.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqOps.adc($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** vec_norm(a): sqrt(Σ a_i², double, left-to-right). */
final case class VecNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecOps.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_norm needs array<float|double>, got ${child.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(input: Any): Any =
    VecOps.norm(input.asInstanceOf[ArrayData], VecOps.isFloat(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = VecOps.isFloat(child.dataType).toString
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecOps.norm($a, $f);")
  }

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Equi-depth bucket search for the Z-order layout writer
  * (GraftCatalog.zOrderWriteN): the bucket of `v` against a sorted
  * boundary array is the COUNT of boundaries <= v — the upper-bound
  * binary-search index. The round-1 lesson (SURVEY §4) is that
  * interpreted higher-order functions don't belong on hot paths;
  * `size(filter(bnd, x -> x <= v))` walks all 255 boundaries per row
  * per cluster column through a lambda dispatch each, while this is
  * ~8 primitive comparisons inside whole-stage codegen. */
object BucketOps {
  /** Upper-bound binary search: #elements <= v in an ascending array
    * (duplicates from a collapsed quantile sketch count correctly —
    * the result is the count, not a match position). Called from
    * generated code. */
  def bucketOf(v: Double, bnd: ArrayData): Int = {
    var lo = 0
    var hi = bnd.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bnd.getDouble(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** bucket_of(v, boundaries): #boundaries <= v by binary search. */
final case class BucketOf(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (DoubleType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bucket_of needs (double, array<double>), got $l, $r")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bucket_of"

  override def nullSafeEval(l: Any, r: Any): Any =
    BucketOps.bucketOf(l.asInstanceOf[Double], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BucketOps.bucketOf($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketOf =
    copy(left = newLeft, right = newRight)
}
