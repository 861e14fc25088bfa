package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary (Misra & Gries 1982; mergeable
  * form per Agarwal et al., PODS'12 "Mergeable Summaries") as a native
  * Catalyst aggregate: `mg_topk(term, k) → array<struct<term,count>>`.
  *
  * What it answers at 100 TB: "which terms/domains/values dominate this
  * corpus" in ONE scan with O(k) state per group — no term-cardinality
  * shuffle (the exact `groupBy(term)` pays a shuffle keyed by every
  * distinct term; this shuffles ≤ k (term,count) pairs per partial).
  *
  * Guarantees: every item with true frequency > N/(k+1) is present in
  * the summary, and each reported count is an UNDERCOUNT by at most
  * N/(k+1). When the number of distinct items never exceeds k (per
  * partial and after merges), no decrement ever fires and the counts
  * are EXACT — the bound under which the oracle checks this aggregate
  * hash-exactly on the testdata.
  *
  * Output is sorted (count desc, term asc) for deterministic rank
  * assignment downstream.
  */
object MisraGries {
  /** Merge-side trim: keep at most k entries by subtracting the
    * (k+1)-th largest count from all (Agarwal et al. §3.2), preserving
    * the undercount bound. */
  def trim(buf: java.util.HashMap[String, Long], k: Int): Unit = {
    if (buf.size <= k) return
    val counts = new Array[Long](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { counts(i) = it.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val d = counts(buf.size - k - 1) // (k+1)-th largest
    val entries = buf.entrySet().iterator()
    while (entries.hasNext) {
      val e = entries.next()
      if (e.getValue <= d) entries.remove()
      else e.setValue(e.getValue - d)
    }
  }
}

/** mg_topk(term, k) → array<struct<term: string, count: bigint>>. */
case class MisraGriesAgg(
    child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got " +
          s"(${child.dataType.simpleString}, ${kExpr.dataType.simpleString})")
    else if (!kExpr.foldable || kExpr.eval() == null ||
      kExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal k >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString // copy out of the row
      val cur = buf.get(t)
      if (cur != 0L || buf.containsKey(t)) buf.put(t, cur + 1L)
      else if (buf.size < k) buf.put(t, 1L)
      else {
        // classic MG decrement: every tracked count loses 1
        val entries = buf.entrySet().iterator()
        while (entries.hasNext) {
          val e = entries.next()
          if (e.getValue <= 1L) entries.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long])
      : java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // absent key unboxes to 0L (BoxesRunTime.unboxToLong(null))
      buf.put(e.getKey, buf.get(e.getKey) + e.getValue)
    }
    MisraGries.trim(buf, k)
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    // deterministic order: count desc, term asc
    val sorted = entries.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  // Terms serialize as length-prefixed UTF-8 bytes, NOT writeUTF
  // (ADVICE r3): modified-UTF-8 caps at 65535 bytes and one >64 KiB
  // token — routine in whitespace-tokenized web/minified text — would
  // throw UTFDataFormatException at partial-serialize time,
  // deterministically killing the job on every retry.
  override def serialize(buf: java.util.HashMap[String, Long])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val term = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      buf.put(term, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
