package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expressions for the vector hot path (SURVEY §7.4:
  * "optional codegen Expression for dot-product if bench demands") —
  * the (b) rung of the custom-operator ladder: a scalar `Expression`
  * with `doGenCode`, before reaching for a custom physical operator.
  *
  * Semantics match `graft.functions.Vectors.dot` on equal-length,
  * null-free arrays (sequential double accumulation in element order
  * — the domain every caller and spec exercises), so swapping one for
  * the other never changes oracle results — only removes the
  * per-element lambda-call overhead of the higher-order-function path.
  * Outside that domain they differ: the HOF form yields null on a
  * length mismatch or null element; DotProductD min-truncates and
  * must not be fed null elements.
  */
object ArrayExpressions {

  /** Dot product of two ArrayType(DoubleType) columns, whole-stage
    * codegen'd to a tight primitive loop.
    */
  case class DotProductD(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |${ev.value} = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Dot product of two ArrayType(LongType) columns — the quantized
    * scoring kernel (SQ/PQ code dots are exact BIGINT arithmetic).
    * Replaces `aggregate(zip_with(a, b, (x,y) -> x*y), 0, +)`, which
    * Spark interprets per element AND allocates the zipped array per
    * row — measured r11b on the 30× fixture: sqTopK's scoring join
    * at 2.4× over linear purely from HOF allocation pressure; this
    * kernel restored the linear exponent. Same caveats as
    * [[DotProductD]]: min-truncates, null elements must not occur.
    */
  case class DotProductL(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {

    // ImplicitCastInputTypes (not bare ExpectsInputTypes): an
    // array<int> input — easy to produce through the generic *Over
    // seams — widens to array<bigint> like Spark's own collection
    // expressions instead of failing analysis (ADVICE r11)
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_dot_l"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0L
      var i = 0
      while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |${ev.value} = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Sum of squared differences of two ArrayType(LongType) columns —
    * the integer L2 kernel of the IVF/PQ centroid-assignment and ADC
    * paths. Replaces `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)),
    * 0, +)` for the same reason as [[DotProductL]].
    */
  case class SqDistL(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {

    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_sqdist_l"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0L
      var i = 0
      while (i < n) {
        val d = x.getLong(i) - y.getLong(i)
        s += d * d
        i += 1
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val d = ctx.freshName("d")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |${ev.value} = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $d = $a.getLong($i) - $b.getLong($i);
           |  ${ev.value} += $d * $d;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Hamming distance between two 64-bit signature halves packed as
    * longs (the SimHash near-dup comparator), codegen'd to Long.bitCount.
    */
  case class HammingDistance64(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(LongType, LongType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hamming64"

    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        (a, b) => s"${ev.value} = (long) java.lang.Long.bitCount($a ^ $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** 64-bit SimHash of a feature-string array, packed as two 32-bit
    * halves `struct(hi, lo)` — the row-level replacement for the
    * higher-order-function fold in `Dedup.simhash`, which is
    * interpreted PER ELEMENT (features × 64 positions of lambda
    * dispatch: 7 s at sf0.1 against ~0.3 s here). Bit-identical to
    * that fold and to the DuckDB oracle's hex-digit arithmetic: bit p
    * of a feature is bit (7−p%8) of byte p/8 of its md5.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = StructType(Seq(
      StructField("hi", LongType, nullable = false),
      StructField("lo", LongType, nullable = false)))
    override def prettyName: String = "graft_simhash64"

    override def nullSafeEval(a: Any): Any =
      SimHashUtil.compute(a.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.SimHashUtil.compute($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 16 MinHashes of a feature-string array: 4 seeded md5 digests per
    * feature, each sliced into four 8-hex-char chunks, minimised
    * per-slot over all features — the in-row replacement for
    * `Dedup.signatures`' explode → 4 md5 projections → 16 min
    * aggregates, which shuffles one row per (doc, feature). Chunk
    * values and the lexicographic min order are identical (fixed-width
    * lowercase hex), so signatures are bit-equal to the aggregate
    * form and to the DuckDB oracle.
    */
  case class MinHash16(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    // null for an empty feature array (the aggregate twin emits no row)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_minhash16"

    override def nullSafeEval(a: Any): Any =
      SimHashUtil.minhash16(a.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.plans.SimHashUtil.minhash16($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Winnowing fingerprints of a token array — the span-evidence hot
    * path shared by `text_winnow`, `text_shared_spans` and the whole
    * graph family, collapsed into ONE pass: per token the 16-bit md5
    * prefix, per position the rolling trigram hash, per 4-window the
    * min, distinct-preserving-first-occurrence — exactly the
    * `TextAnalysis.winnowOfHof` HOF chain (spec-pinned bit-equal),
    * without materialising the three intermediate arrays per row or
    * paying per-element lambda dispatch. Null for arrays under 3
    * tokens (the HOF twin's callers filter those; the kernel makes the
    * contract explicit). Null ELEMENTS hash as empty strings — a
    * domain the engine never produces (token arrays come from
    * splitting non-null text), same caveat as [[DotProductD]].
    */
  case class Winnow(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_winnow"

    override def nullSafeEval(a: Any): Any =
      SimHashUtil.winnow(a.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.plans.SimHashUtil.winnow($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct word-3-gram 60-bit posting keys of a token array — the
    * shingle pair core's scan step (`Dedup.shinglePairCounts`) in one
    * pass: per position the `"a b c"` shingle, distinct by STRING (not
    * by key — a key collision must merge postings identically to the
    * DuckDB oracle, which also keys distinct strings), each hashed to
    * the first 15 md5 hex chars as a long. Replaces the HOF
    * shingle-array build + per-element explode + md5/conv projection;
    * also serves `size()` for the per-doc shingle counts, so both
    * consumers read one expression. Null for under-3-token arrays
    * (callers filter; [[Winnow]]'s contract).
    */
  case class ShingleKeys(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_shingle_keys"

    override def nullSafeEval(a: Any): Any =
      SimHashUtil.shingleKeys(a.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.plans.SimHashUtil.shingleKeys($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct word-3-gram STRING shingles of a token array — the
    * feature input of the minhash/simhash signature kernels, built in
    * one pass instead of the HOF transform + array_distinct chain.
    * Same distinct-by-string first-occurrence order as the expression
    * twin (order is immaterial to the min/fold consumers, but equality
    * keeps the differential spec exact). Null for under-3-token
    * arrays.
    */
  case class Shingles(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_shingles"

    override def nullSafeEval(a: Any): Any =
      SimHashUtil.shingles(a.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.plans.SimHashUtil.shingles($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-string character statistics in ONE pass — `(n_chars,
    * n_distinct, ss)` where ss = Σ count(c)² over distinct characters
    * (code points, matching `substr(text, i, 1)` semantics): the
    * in-row replacement for [[graft.operators.TextAnalysis.charDiversity]]'s
    * explode → (doc, char) count → per-doc aggregate, which shuffles
    * ONE ROW PER CHARACTER of the corpus. The Gini impurity downstream
    * needs exactly these three integers; computing them where the
    * characters already are makes the diversity score a projection
    * with zero shuffles. Bit-equal to the exploded form (same
    * grouping key: one code point ≡ one `substr` character) —
    * differential-spec'd; the DuckDB oracle is untouched.
    */
  case class CharCounts(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("n_chars", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("ss", LongType, nullable = false)))
    override def prettyName: String = "graft_char_counts"

    override def nullSafeEval(a: Any): Any =
      CharCountsUtil.compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.CharCountsUtil.compute($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column builders (usable without any session registration). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProductD(Bridge.expression(a), Bridge.expression(b)))

  def dotL(a: Column, b: Column): Column =
    Bridge.column(DotProductL(Bridge.expression(a), Bridge.expression(b)))

  def sqDistL(a: Column, b: Column): Column =
    Bridge.column(SqDistL(Bridge.expression(a), Bridge.expression(b)))

  def hamming64(a: Column, b: Column): Column =
    Bridge.column(HammingDistance64(Bridge.expression(a), Bridge.expression(b)))

  def simhash64(features: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(features)))

  def minhash16(features: Column): Column =
    Bridge.column(MinHash16(Bridge.expression(features)))

  def winnow(tokens: Column): Column =
    Bridge.column(Winnow(Bridge.expression(tokens)))

  def shingleKeys(tokens: Column): Column =
    Bridge.column(ShingleKeys(Bridge.expression(tokens)))

  def shingles(tokens: Column): Column =
    Bridge.column(Shingles(Bridge.expression(tokens)))

  def charCounts(text: Column): Column =
    Bridge.column(CharCounts(Bridge.expression(text)))
}

/** Row-level character-count kernel called from both interpreted eval
  * and the generated code of [[ArrayExpressions.CharCounts]]. Counts
  * per Unicode CODE POINT — identical grouping to the exploded
  * `substr(text, i, 1)` form (UTF8String substring is code-point
  * addressed), so the two paths are bit-equal on any input.
  */
object CharCountsUtil {
  def compute(s: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
    }
    var ss = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next()(0); ss += c * c }
    new GenericInternalRow(Array[Any](n, counts.size.toLong, ss))
  }
}

/** Row-level SimHash kernel called from both interpreted eval and the
  * generated code of [[ArrayExpressions.SimHash64]].
  */
object SimHashUtil {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(arr: ArrayData): InternalRow = {
    val md = digests.get()
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      // null elements are skipped (the engine never produces them:
      // shingle arrays are built from non-null text)
      if (!arr.isNullAt(i)) {
        val h = md.digest(arr.getUTF8String(i).getBytes)
        var p = 0
        while (p < 64) {
          counts(p) += ((h(p >> 3) >> (7 - (p & 7))) & 1) * 2 - 1
          p += 1
        }
      }
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var p = 0
    while (p < 32) { if (counts(p) > 0) hi |= 1L << (31 - p); p += 1 }
    while (p < 64) { if (counts(p) > 0) lo |= 1L << (63 - p); p += 1 }
    new GenericInternalRow(Array[Any](hi, lo))
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** 16 min-of-seeded-md5-chunk values over the feature array; null
    * for an empty array (no features → no signature), matching the
    * aggregate form where min() over zero rows is null.
    */
  def minhash16(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = digests.get()
    val mins = new Array[String](16)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val feat = arr.getUTF8String(i).getBytes
        var s = 0
        while (s < 4) {
          md.reset()
          md.update((48 + s).toByte) // '0'+s
          md.update('|'.toByte)
          md.update(feat)
          val h = md.digest()
          // hex-encode the 16 digest bytes → four 8-hex-char chunks
          val hex = new Array[Char](32)
          var b = 0
          while (b < 16) {
            hex(b * 2) = HexDigits((h(b) >> 4) & 0xf)
            hex(b * 2 + 1) = HexDigits(h(b) & 0xf)
            b += 1
          }
          var c = 0
          while (c < 4) {
            val chunk = new String(hex, c * 8, 8)
            val k = s * 4 + c
            if (mins(k) == null || chunk.compareTo(mins(k)) < 0) mins(k) = chunk
            c += 1
          }
          s += 1
        }
      }
      i += 1
    }
    // all-null feature arrays contribute nothing — same "no features →
    // no signature" null as the empty array (the declared element type
    // is non-null, so half-filled output is never allowed to escape)
    if (mins(0) == null) return null
    val out = new Array[Any](16)
    var k = 0
    while (k < 16) {
      out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(mins(k))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Winnowing-fingerprint kernel — one pass over the token array:
    * 16-bit md5 prefixes, INJECTIVE base-2¹⁶ trigram codes
    * `v[i-1]·2³² + v[i]·2¹⁶ + v[i+1]` (48-bit values; two trigrams
    * share a code iff their token-hash triples are identical — no
    * hash-layer aliasing), 4-window mins, distinct in first-occurrence
    * order. The r11 scale study measured the previous `mod 1000003`
    * compression CREATING 18% of the span graph's edges at 10× sf0.1
    * (814,938 cross-copy collision pairs): bucket df grows linearly
    * with corpus size, so collision pairs grow quadratically — the
    * fingerprint space must outgrow the corpus, and 2⁴⁸ does. Arithmetic
    * and window clipping replicate the HOF chain exactly (1-based
    * `slice(hs, j, 4)` over `j = 1..max(|hs|−3, 1)`); null for
    * under-3-token arrays.
    */
  def winnow(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = arr.numElements()
    if (n < 3) return null
    val md = digests.get()
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val h =
        if (arr.isNullAt(i)) md.digest(Array.emptyByteArray)
        else md.digest(arr.getUTF8String(i).getBytes)
      vals(i) = (((h(0) & 0xff) << 8) | (h(1) & 0xff)).toLong
      i += 1
    }
    val m = n - 2
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      hs(i) = vals(i) * 4294967296L + vals(i + 1) * 65536L + vals(i + 2)
      i += 1
    }
    val w = math.max(m - 3, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < w) {
      var mn = Long.MaxValue
      var k = j
      val end = math.min(j + 4, m)
      while (k < end) { if (hs(k) < mn) mn = hs(k); k += 1 }
      seen.add(mn)
      j += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Distinct `"a b c"` trigram strings in first-occurrence order —
    * shared by [[shingleKeys]] (which hashes them) and the
    * string-array kernel consumers.
    */
  private def distinctShingles(arr: ArrayData): java.util.LinkedHashSet[String] = {
    val n = arr.numElements()
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < n) {
      val sb = new java.lang.StringBuilder()
      sb.append(if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString)
      sb.append(' ')
      sb.append(if (arr.isNullAt(i + 1)) "" else arr.getUTF8String(i + 1).toString)
      sb.append(' ')
      sb.append(if (arr.isNullAt(i + 2)) "" else arr.getUTF8String(i + 2).toString)
      seen.add(sb.toString)
      i += 1
    }
    seen
  }

  /** String-shingle kernel: the distinct trigram set as an array of
    * UTF8 strings (feature input for minhash16/simhash64).
    */
  def shingles(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    if (arr.numElements() < 3) return null
    val seen = distinctShingles(arr)
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      o += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Shingle-key kernel: distinct `"a b c"` word trigrams (first-
    * occurrence order, distinct by string so md5-key collisions merge
    * postings exactly like the string-keyed oracle), each mapped to
    * `conv(substr(md5(s), 1, 15), 16, 10)` — the 60-bit value of the
    * first 15 hex chars: bytes 0–6 big-endian, then the high nibble
    * of byte 7.
    */
  def shingleKeys(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    if (arr.numElements() < 3) return null
    val seen = distinctShingles(arr)
    val md = digests.get()
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      md.reset()
      val h = md.digest(it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
      v = (v << 4) | ((h(7) >> 4) & 0xfL)
      out(o) = v
      o += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** SQL-name registration via SparkSessionExtensions — enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`, then call `graft_dot(a, b)`
  * / `graft_hamming64(x, y)` from SQL. For an already-built session use
  * `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {
  private val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayExpressions.DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) =>
        ArrayExpressions.DotProductD(children(0), children(1))),
    (FunctionIdentifier("graft_hamming64"),
      new ExpressionInfo(classOf[ArrayExpressions.HammingDistance64].getName, "graft_hamming64"),
      (children: Seq[Expression]) =>
        ArrayExpressions.HammingDistance64(children(0), children(1))),
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[ArrayExpressions.SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) =>
        ArrayExpressions.SimHash64(children(0))),
    (FunctionIdentifier("graft_minhash16"),
      new ExpressionInfo(classOf[ArrayExpressions.MinHash16].getName, "graft_minhash16"),
      (children: Seq[Expression]) =>
        ArrayExpressions.MinHash16(children(0))),
    (FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[ArrayExpressions.Winnow].getName, "graft_winnow"),
      (children: Seq[Expression]) =>
        ArrayExpressions.Winnow(children(0))),
    (FunctionIdentifier("graft_shingle_keys"),
      new ExpressionInfo(classOf[ArrayExpressions.ShingleKeys].getName, "graft_shingle_keys"),
      (children: Seq[Expression]) =>
        ArrayExpressions.ShingleKeys(children(0))),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ArrayExpressions.Shingles].getName, "graft_shingles"),
      (children: Seq[Expression]) =>
        ArrayExpressions.Shingles(children(0))),
    (FunctionIdentifier("graft_char_counts"),
      new ExpressionInfo(classOf[ArrayExpressions.CharCounts].getName, "graft_char_counts"),
      (children: Seq[Expression]) =>
        ArrayExpressions.CharCounts(children(0))))

  /** Register into a live session (withExtensions only applies at
    * construction time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    registrations.foreach { case (name, info, builder) =>
      Bridge.registerFunction(spark, name, info, builder)
    }
    ScaleGuard.install(spark)
  }
}
