package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `bounded_collect_set(key, cap)` — a `collect_set` over BIGINT keys whose
  * per-group buffer is BOUNDED at `cap + 1` distinct values by construction.
  *
  * The aggregate exists for the document-frequency-cutoff pattern the
  * curation operators share (llm_substring_dup, llm_boilerplate, the
  * decontamination index): "group by token/window, keep only groups whose
  * distinct-document count lies in [2, cap], then fan the survivors out
  * into pairs". Stock `collect_set` materializes the FULL distinct set
  * before the cutoff filter runs — a boilerplate window shared by 10⁸
  * documents at the 100 TB scale buffers gigabytes in one aggregation
  * buffer before being discarded. This aggregate SATURATES instead: once a
  * buffer holds `cap + 1` distinct values the group is already provably
  * over-cutoff, so further inputs are dropped and the buffer never grows
  * again. Groups at or under the cap are exact (no input is ever skipped
  * below saturation — updates stop only when `cap + 1` distinct values are
  * present, which itself proves df > cap), so the downstream
  * `size(docs) BETWEEN 2 AND cap` filter selects exactly the same groups
  * with exactly the same member sets as unbounded collect_set would.
  *
  * Saturation survives merges: partial buffers are each ≤ cap + 1; a merge
  * stops adding at cap + 1, and a union that would exceed the cap always
  * reaches cap + 1 before exhausting its inputs, so over-cap groups stay
  * visibly over-cap. Result is the SORTED value array (deterministic, and
  * pair generators downstream get doc1 < doc2 for free).
  *
  * Implementation notes, written for the billions-of-groups regime this
  * runs in (one group per distinct 24-char window of the corpus):
  *  - the buffer is a primitive `long[cap + 2]` — `buf(0)` is the fill
  *    count, values live at 1..n, membership is a linear scan (for
  *    cap ≤ ~32 that beats any hash structure and allocates NOTHING per
  *    update). The first cut used `java.util.HashSet[Long]`; at sf1 the
  *    per-group HashSet + boxed-Long garbage drove full-GC pauses that
  *    swung the query 8→100 s run-to-run.
  *  - ObjectHashAggregateExec falls back to sort-based aggregation at 128
  *    in-memory groups (spark.sql.objectHashAggregate.sortBased.
  *    fallbackThreshold), so on a mostly-unique key stream this aggregate
  *    effectively runs as ONE binary sort of the window stream — which is
  *    exactly the plan we want at scale (spillable, no group map), and
  *    serialize/deserialize below are flat little-endian long arrays to
  *    keep that sort cheap.
  */
case class BoundedCollectSet(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(cap >= 1 && cap <= (1 << 20),
    s"bounded_collect_set cap must be in [1, 2^20], got $cap")

  // buf(0) = n (number of values); values at indices 1..n; saturated when
  // n == cap + 1. The buffer GROWS lazily (doubling, bounded by cap + 2):
  // with a large cap (the exact-anchor kernel uses 10 000) an eager
  // cap-sized allocation per group would cost 80 KB for the df=1 groups
  // that dominate every shingle stream; typical groups never leave the
  // initial 10-slot array. TypedImperativeAggregate stores the buffer
  // returned by update/merge, so reallocation is safe.
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](math.min(cap + 2, 10))

  private def ensure(buf: Array[Long], idx: Int): Array[Long] =
    if (idx < buf.length) buf
    else java.util.Arrays.copyOf(buf,
      math.min(cap + 2, math.max(buf.length * 2, idx + 1)))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val n = buf(0).toInt
    if (n <= cap) { // not yet saturated
      val v = child.eval(input)
      if (v != null) {
        val x = v.asInstanceOf[Long]
        var i = 1
        while (i <= n && buf(i) != x) i += 1
        if (i > n) {
          val b = ensure(buf, i)
          b(i) = x; b(0) = n + 1
          return b
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var b = b1
    val n2 = b2(0).toInt
    var j = 1
    while (j <= n2 && b(0).toInt <= cap) {
      val x = b2(j)
      val n = b(0).toInt
      var i = 1
      while (i <= n && b(i) != x) i += 1
      if (i > n) { b = ensure(b, i); b(i) = x; b(0) = n + 1 }
      j += 1
    }
    b
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(0).toInt
    val xs = java.util.Arrays.copyOfRange(buf, 1, n + 1)
    java.util.Arrays.sort(xs)
    new GenericArrayData(xs)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val n = buf(0).toInt
    val bb = java.nio.ByteBuffer.allocate((n + 1) * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i <= n) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // size to the serialized content (n + 1 longs), not to the cap —
    // merge grows the array on demand
    val buf = new Array[Long](math.max(bytes.length / 8, 1))
    var i = 0
    while (bb.remaining() >= 8 && i < buf.length) {
      buf(i) = bb.getLong(); i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect_set"

  override def withNewMutableAggBufferOffset(
      newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedCollectSet = copy(child = newChild)
}
