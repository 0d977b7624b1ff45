package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native bounded top-k aggregate: keeps the k best (score DESC, item
  * ASC on ties) `(BIGINT score, STRING item)` pairs per group and
  * returns them best-first as `array<struct<score,item>>`.
  *
  * This is the scale-shape answer to "top-k per key": the usual
  * `row_number() OVER (PARTITION BY key ORDER BY score)` formulation
  * shuffles EVERY input row to its key's reducer and sorts there —
  * at 100 TB that is a full-data exchange to discard all but k rows
  * per key. A TypedImperativeAggregate participates in partial
  * aggregation: each map task reduces its slice to ≤k entries per
  * key before the exchange, so shuffle volume is k·keys·tasks worst
  * case, independent of input row count. Exact integer scores keep
  * the result engine-reproducible; ties break on the item string so
  * the output is deterministic under any partitioning.
  *
  * Buffer is a worst-first binary heap of bounded size k; update is
  * O(log k) only when the candidate beats the current worst, O(1)
  * otherwise (the common case once the heap saturates). */
case class TopKLongAgg(
    score: Expression,
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKLongAgg.Buffer] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(score, item)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKLongAgg.resultType
  override def prettyName: String = "topk_long"

  override def createAggregationBuffer(): TopKLongAgg.Buffer =
    new TopKLongAgg.Buffer(k)

  override def update(
      buf: TopKLongAgg.Buffer, input: InternalRow): TopKLongAgg.Buffer = {
    val s = score.eval(input)
    val it = item.eval(input)
    if (s != null && it != null) {
      buf.offer(s.asInstanceOf[Long], it.asInstanceOf[UTF8String])
    }
    buf
  }

  override def merge(
      buf: TopKLongAgg.Buffer,
      other: TopKLongAgg.Buffer): TopKLongAgg.Buffer = {
    other.foreach((s, it) => buf.offer(s, it))
    buf
  }

  override def eval(buf: TopKLongAgg.Buffer): Any = buf.toSortedArrayData

  override def serialize(buf: TopKLongAgg.Buffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TopKLongAgg.Buffer =
    TopKLongAgg.Buffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(off: Int): TopKLongAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKLongAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongAgg =
    copy(score = newChildren(0), item = newChildren(1))
}

/** Fused first/second-moment aggregate over integer vectors: one pass
  * over `array<bigint>` rows accumulating the count, the d first-moment
  * sums Σxᵢ and the d(d+1)/2 upper-triangle co-moment sums Σxᵢxⱼ
  * (i ≤ j) in a single flat Long buffer.
  *
  * This is the covariance-shaped sibling of [[TopKLongAgg]]'s
  * scale argument: the compositional formulation (explode d(d+1)/2
  * structs per row, hash-aggregate the cells) materializes ~2k rows
  * per input vector before the partial aggregate collapses them —
  * an order of magnitude of pure allocation. The fused buffer does
  * the identical Long multiply-adds in place; each map task emits ONE
  * buffer, so shuffle volume is d² per task independent of row count,
  * and merge is elementwise addition. Long accumulation matches the
  * compositional plan bit for bit (Java Long addition is commutative
  * and associative even at wraparound); with micro-quantized unit-ish
  * components (|x| ≤ ~2²⁰) the diagonal sums stay exact to ~2²³ rows
  * per partition times 2⁴⁰ per product — far past any test scale, and
  * the 128-bit widening happens downstream on the evaluated sums.
  *
  * Rows whose array is null or not exactly `d` elements are skipped
  * (same totality convention as the built-in aggregates on null);
  * elements must be non-null BIGINTs — the quantization transform
  * that feeds this always produces them.
  * Eval returns `struct(n, s array<long>, pairs array<struct<i, j,
  * s_ij>>)` — the pairs list is generated ONCE at eval (2080 structs
  * total, not per row) so consumers keep the familiar exploded-cell
  * shape. */
case class VectorCoMomentAgg(
    vec: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1, "d must be >= 1")
  private val tri = d * (d + 1) / 2

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = VectorCoMomentAgg.resultType
  override def prettyName: String = "vector_comoment"

  // layout: [0]=n, [1..d]=s_i, [1+d ..]=upper-triangle s_ij row-major
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + d + tri)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = vec.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() == d) {
        val v = arr.toLongArray()
        buf(0) += 1L
        var i = 0
        var k = 1 + d
        while (i < d) {
          val vi = v(i)
          buf(1 + i) += vi
          var j = i
          while (j < d) {
            buf(k) += vi * v(j)
            j += 1
            k += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val s = new GenericArrayData(
      java.util.Arrays.copyOfRange(buf, 1, 1 + d).asInstanceOf[Array[Long]])
    val pairs = new Array[Any](tri)
    var i = 0
    var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        pairs(k) = InternalRow(i, j, buf(1 + d + k))
        j += 1
        k += 1
      }
      i += 1
    }
    InternalRow(buf(0), s, new GenericArrayData(pairs))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): VectorCoMomentAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VectorCoMomentAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorCoMomentAgg =
    copy(vec = newChildren(0))
}

/** Fused Poisson-bootstrap replicate aggregate: per input row,
  * derives the row's B deterministic Poisson(1) multiplicities from
  * md5 draws (one digest per 4 replicates — the same hex-chunk recipe
  * the DuckDB oracle replays) and adds `m` / `m·value` straight into
  * a 2B-long buffer.
  *
  * The compositional formulation (explode B/4 slots, hash, explode 4
  * chunks, partial-aggregate) materializes B rows per input row
  * before the combine — at B=40 that is 40× the corpus streamed
  * through a hash aggregate just to be summed down to B cells per
  * group. The fused buffer does the identical arithmetic in place:
  * each map task emits ONE 2B-long buffer per group, merge is
  * elementwise addition, and the digest count (B/4 per row, the
  * actually-expensive part) is unchanged.
  *
  * Determinism contract: the multiplicity of (row, replicate) is a
  * pure function of `md5(eventId:slot)` — identical across engines,
  * partitionings, and re-plans; sums are plain BIGINTs. Eval returns
  * `array<struct<b, n_b, sc_b>>` with all B entries (consumers drop
  * empty replicates themselves). Null ids/values are skipped. */
case class PoissonBootstrapAgg(
    id: Expression,
    value: Expression,
    b: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(b >= 4 && b % 4 == 0, "b must be a positive multiple of 4")

  override def children: Seq[Expression] = Seq(id, value)
  override def nullable: Boolean = false
  override def dataType: DataType = PoissonBootstrapAgg.resultType
  override def prettyName: String = "poisson_bootstrap"

  // layout: [0..b-1] = n_b, [b..2b-1] = sc_b
  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * b)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val idv = id.eval(input)
    val v = value.eval(input)
    if (idv != null && v != null) {
      val cents = v.asInstanceOf[Long]
      val idStr = idv.toString
      val md = PoissonBootstrapAgg.digest.get()
      var slot = 0
      while (slot < b / 4) {
        md.reset()
        val d = md.digest(s"$idStr:$slot".getBytes
          (java.nio.charset.StandardCharsets.UTF_8))
        var chunk = 0
        while (chunk < 4) {
          var bp = 0L
          var k = 0
          while (k < 4) { bp = (bp << 8) | (d(chunk * 4 + k) & 0xffL); k += 1 }
          bp = bp % 10000L
          // Poisson(1) CDF in basis points, tail capped at 6 — the
          // identical thresholds the SQL/oracle formulation uses
          val m =
            if (bp < 3679L) 0L else if (bp < 7358L) 1L
            else if (bp < 9197L) 2L else if (bp < 9810L) 3L
            else if (bp < 9963L) 4L else if (bp < 9994L) 5L else 6L
          if (m > 0L) {
            val r = slot * 4 + chunk
            buf(r) += m
            buf(b + r) += m * cents
          }
          chunk += 1
        }
        slot += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](b)
    var r = 0
    while (r < b) {
      out(r) = InternalRow(r, buf(r), buf(b + r))
      r += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): PoissonBootstrapAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): PoissonBootstrapAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PoissonBootstrapAgg =
    copy(id = newChildren(0), value = newChildren(1))
}

object PoissonBootstrapAgg {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("b", IntegerType, nullable = false),
      StructField("n_b", LongType, nullable = false),
      StructField("sc_b", LongType, nullable = false))),
    containsNull = false)

  def apply(id: Column, value: Column, b: Int): Column =
    ColumnShim.column(
      PoissonBootstrapAgg(
        ColumnShim.expression(id), ColumnShim.expression(value), b)
        .toAggregateExpression())
}

object VectorCoMomentAgg {

  val resultType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("pairs", ArrayType(
      StructType(Seq(
        StructField("i", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("s_ij", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  def apply(vec: Column, d: Int): Column =
    ColumnShim.column(
      VectorCoMomentAgg(ColumnShim.expression(vec), d)
        .toAggregateExpression())
}

object TopKLongAgg {

  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("item", StringType, nullable = false))),
    containsNull = false)

  def apply(score: Column, item: Column, k: Int): Column =
    ColumnShim.column(
      TopKLongAgg(
        ColumnShim.expression(score), ColumnShim.expression(item), k)
        .toAggregateExpression())

  /** Bounded worst-first binary heap. Entry a is WORSE than b when
    * a.score < b.score, or scores tie and a.item sorts after b.item
    * (ties prefer the smaller item). Heap root = current worst, so
    * saturation rejects non-improving candidates with one compare. */
  final class Buffer(k: Int) {
    private val scores = new Array[Long](k)
    private val items = new Array[UTF8String](k)
    private var n = 0

    private def worse(s1: Long, i1: UTF8String, s2: Long, i2: UTF8String): Boolean =
      s1 < s2 || (s1 == s2 && i1.compareTo(i2) > 0)

    private def siftUp(pos0: Int): Unit = {
      var pos = pos0
      while (pos > 0) {
        val parent = (pos - 1) / 2
        if (worse(scores(pos), items(pos), scores(parent), items(parent))) {
          swap(pos, parent); pos = parent
        } else return
      }
    }

    private def siftDown(pos0: Int): Unit = {
      var pos = pos0
      while (true) {
        val l = 2 * pos + 1
        val r = l + 1
        var m = pos
        if (l < n && worse(scores(l), items(l), scores(m), items(m))) m = l
        if (r < n && worse(scores(r), items(r), scores(m), items(m))) m = r
        if (m == pos) return
        swap(pos, m); pos = m
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
      val ti = items(i); items(i) = items(j); items(j) = ti
    }

    def offer(s: Long, item: UTF8String): Unit =
      if (n < k) {
        scores(n) = s
        items(n) = item.clone() // input row memory is reused by the scan
        n += 1
        siftUp(n - 1)
      } else if (worse(scores(0), items(0), s, item)) {
        scores(0) = s
        items(0) = item.clone()
        siftDown(0)
      }

    def foreach(f: (Long, UTF8String) => Unit): Unit = {
      var i = 0
      while (i < n) { f(scores(i), items(i)); i += 1 }
    }

    def toSortedArrayData: GenericArrayData = {
      val idx = (0 until n).sortWith { (a, b) =>
        scores(a) > scores(b) ||
          (scores(a) == scores(b) && items(a).compareTo(items(b)) < 0)
      }
      new GenericArrayData(idx.map { i =>
        InternalRow(scores(i), items(i))
      }.toArray[Any])
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(n)
      var i = 0
      while (i < n) {
        out.writeLong(scores(i))
        val b = items(i).getBytes
        out.writeInt(b.length)
        out.write(b)
        i += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Buffer {
    def fromBytes(k: Int, bytes: Array[Byte]): Buffer = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = new Buffer(k)
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val s = in.readLong()
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        buf.offer(s, UTF8String.fromBytes(b))
        i += 1
      }
      buf
    }
  }
}
