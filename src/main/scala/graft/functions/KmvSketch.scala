package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * RANDOM'02; Beyer et al., SIGMOD'07) as a native Catalyst aggregate.
  *
  * Why beside Spark's built-in HLL: KMV sketches support SET
  * INTERSECTION estimates (via the Jaccard of the k-min union), which
  * HLL fundamentally cannot — the operation a training-data pipeline
  * needs for "how much does corpus A overlap corpus B" without a
  * distributed join of the full key sets.
  *
  * Input is a 64-bit hash column (compose with the codegen'd
  * `xxhash64(col)` so the per-row hot path stays in whole-stage
  * codegen); the aggregate keeps the k smallest distinct hashes in
  * unsigned order. Mergeable: union-and-trim, so Spark's partial
  * aggregation (map-side combine) applies and the shuffled state is
  * ≤ k longs per group regardless of input size.
  */
object Kmv {

  /** Unsigned-order key for a 64-bit hash. */
  @inline def uns(h: Long): Long = h ^ Long.MinValue

  /** Serializable unsigned comparator (the aggregate ships it inside
    * its buffer factory to executors). */
  object UnsignedOrder extends java.util.Comparator[java.lang.Long]
      with Serializable {
    override def compare(a: java.lang.Long, b: java.lang.Long): Int =
      java.lang.Long.compare(uns(a), uns(b))
  }

  /** hash → (0, 1]: the fraction of the unsigned 64-bit space at or
    * below h. */
  def fraction(h: Long): Double =
    (uns(h).toDouble - Long.MinValue.toDouble + 1.0) / math.pow(2.0, 64)

  /** Distinct-count estimate from a sketch (unsigned-sorted hashes).
    * Fewer than k values ⇒ every distinct value was seen ⇒ exact. */
  def estimate(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / fraction(sketch.last)

  /** Jaccard estimate of the sets behind two sketches built with the
    * same k and hash: share of the union's k smallest hashes present in
    * both sketches. */
  def jaccard(a: Array[Long], b: Array[Long], k: Int): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    val union = (a ++ b).distinct.sortBy(uns).take(k)
    val sa = a.toSet
    val sb = b.toSet
    union.count(h => sa.contains(h) && sb.contains(h)).toDouble / union.length
  }

  /** Intersection-size estimate: Jaccard × union-size estimate. */
  def intersectionEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    val union = (a ++ b).distinct.sortBy(uns).take(k)
    jaccard(a, b, k) * estimate(union, k)
  }
}

/** kmv_sketch(hash64, k) → array<bigint> — the k smallest distinct
  * hashes in unsigned order. */
case class KmvSketchAgg(
    child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, int), got " +
          s"(${child.dataType}, ${kExpr.dataType})")
    else if (!kExpr.foldable || kExpr.eval() == null ||
      kExpr.eval().asInstanceOf[Int] < 2)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal k >= 2")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](Kmv.UnsignedOrder)

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.pollLast()
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** Scalar helpers over sketch arrays. Group-cardinality work (arrays of
  * ≤ k longs, evaluated once per group), so interpreted eval is off the
  * per-row hot path by construction. */
abstract class KmvScalar extends Expression {
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  /** Every argument but the last is a sketch (array<bigint>); the last
    * is the literal k — mirrors [[KmvSketchAgg]]'s check so a wrong
    * type fails analysis, not mid-job with a ClassCastException.
    * Callers must pass the SAME k the sketches were built with (the
    * array carries no k; mixing ks silently skews estimates). */
  override def checkInputDataTypes(): TypeCheckResult = {
    val sketches = children.init
    val kExpr = children.last
    if (sketches.exists(c => c.dataType != ArrayType(LongType, false) &&
        c.dataType != ArrayType(LongType, true)))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> sketch arguments, got " +
          children.init.map(_.dataType.simpleString).mkString(", "))
    else if (kExpr.dataType != IntegerType || !kExpr.foldable ||
      kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] < 2)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal int k >= 2 as its last argument")
    else TypeCheckResult.TypeCheckSuccess
  }

  protected def sketchArg(v: Any): Array[Long] =
    v.asInstanceOf[ArrayData].toLongArray()
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null else compute(vs)
  }
  protected def compute(vs: Seq[Any]): Any
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val expr = ctx.addReferenceObj("kmvScalar", this)
    val childGens = children.map(_.genCode(ctx))
    val args = childGens.map(_.value).mkString(
      "new Object[] {", ", ", "}")
    val anyNull = childGens.map(_.isNull).mkString(" || ")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
        ${childGens.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = $anyNull;
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = ((graft.functions.KmvScalar) $expr)
            .computeJava($args);
        }
      """)
  }
  def computeJava(args: Array[Object]): Double =
    compute(args.toSeq).asInstanceOf[Double]
}

/** kmv_estimate(sketch, k) → double — distinct-count estimate. */
case class KmvEstimate(left: Expression, right: Expression)
    extends KmvScalar {
  override def children: Seq[Expression] = Seq(left, right)
  override def prettyName: String = "kmv_estimate"
  override protected def compute(vs: Seq[Any]): Any =
    Kmv.estimate(sketchArg(vs(0)), vs(1).asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvEstimate =
    copy(left = newChildren(0), right = newChildren(1))
}

/** kmv_jaccard(sketch_a, sketch_b, k) → double. */
case class KmvJaccard(a: Expression, b: Expression, kExpr: Expression)
    extends KmvScalar {
  override def children: Seq[Expression] = Seq(a, b, kExpr)
  override def prettyName: String = "kmv_jaccard"
  override protected def compute(vs: Seq[Any]): Any =
    Kmv.jaccard(sketchArg(vs(0)), sketchArg(vs(1)),
      vs(2).asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvJaccard =
    copy(a = newChildren(0), b = newChildren(1), kExpr = newChildren(2))
}

/** kmv_intersect(sketch_a, sketch_b, k) → double — |A∩B| estimate. */
case class KmvIntersect(a: Expression, b: Expression, kExpr: Expression)
    extends KmvScalar {
  override def children: Seq[Expression] = Seq(a, b, kExpr)
  override def prettyName: String = "kmv_intersect"
  override protected def compute(vs: Seq[Any]): Any =
    Kmv.intersectionEstimate(sketchArg(vs(0)), sketchArg(vs(1)),
      vs(2).asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvIntersect =
    copy(a = newChildren(0), b = newChildren(1), kExpr = newChildren(2))
}
