package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native twins of the declarative MD5 text-hash folds in
  * [[graft.operators.Dedup]] — same values bit-for-bit (asserted by
  * TextHashSpec; the DuckDB oracles are unchanged), but one `eval` call
  * per row instead of thousands of interpreted higher-order-function
  * lambda dispatches and intermediate array/string allocations.
  *
  * Spark evaluates `transform`/`aggregate`/`zip_with` lambdas
  * interpreted (no codegen), allocating a fresh array per hash function
  * per row; for signature-heavy dedup that is the dominant query cost.
  * These expressions keep the whole fold in one tight JVM loop over a
  * thread-local MessageDigest. They extend the same §7.2 escalation
  * already taken for `cosine_sim` — compose built-ins first, go native
  * where the interpreted overhead is the bottleneck.
  *
  * `CodegenFallback` (not `doGenCode`): the per-row work is MD5-bound,
  * so inlining into whole-stage codegen buys nothing; fallback keeps
  * the surrounding stage fused while calling `eval` for this column.
  */
private object Md5Local {
  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def digest(prefix: Array[Byte], body: Array[Byte]): Array[Byte] = {
    val md = local.get()
    md.reset()
    md.update(prefix)
    md.update(body)
    md.digest()
  }
  /** First 48 bits of the digest as a non-negative Long — identical to
    * parsing the first 12 hex chars base-16 ([[PortableHash]]).
    */
  def prefix48(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
}

/** `minhash_sig(shingles, n)` ≡
  * `transform(sequence(0, n-1), h -> array_min(transform(shingles,
  *    s -> substr(md5(concat(h div 4, ':', s)), 8 * (h % 4) + 1, 8))))`
  * — the per-document MinHash signature of [[graft.operators.Dedup]]:
  * hash lane `h` is the `(h % 4)`-th 8-hex-char (32-bit) slice of
  * `md5((h div 4) || ':' || s)`, so one MD5 call feeds FOUR lanes.
  * Lexicographic min over fixed-width lowercase hex ≡ unsigned numeric
  * min of the 32-bit value, which is what the tight loop tracks.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val numGroups = (numHashes + 3) / 4
    val prefixes = MinHashSig.prefixes(numGroups)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).getBytes
      var g = 0
      while (g < numGroups) {
        val d = Md5Local.digest(prefixes(g), s)
        val maxLane = math.min(4, numHashes - 4 * g)
        var lane = 0
        while (lane < maxLane) {
          val v = ((d(4 * lane) & 0xffL) << 24) | ((d(4 * lane + 1) & 0xffL) << 16) |
            ((d(4 * lane + 2) & 0xffL) << 8) | (d(4 * lane + 3) & 0xffL)
          val h = 4 * g + lane
          if (v < mins(h)) mins(h) = v
          lane += 1
        }
        g += 1
      }
      i += 1
    }
    // Empty input: the declarative array_min over an empty transform
    // yields null elements; Dedup always feeds >= 1 shingle (whole-text
    // fallback), so mirror with an empty signature only if n == 0.
    if (n == 0) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(
      mins.map(v => UTF8String.fromString(f"$v%08x"): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private[functions] def prefixes(numGroups: Int): Array[Array[Byte]] =
    cache.computeIfAbsent(numGroups, n =>
      Array.tabulate(n)(g => s"$g:".getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "minhash_sig expects (shingles, numHashes)")
      val n = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"minhash_sig numHashes must be an integer literal, got $other")
      }
      MinHashSig(args.head, n)
    })
}

/** `shingle3(words)` ≡ the declarative word-3-gram shingle builder of
  * [[graft.operators.Dedup]]:
  * `array_distinct(transform(sequence(0, n-3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])))`
  * with the whole-text (`concat_ws`) fallback for inputs shorter than
  * one shingle. Distinctness keeps first-occurrence order, exactly like
  * `array_distinct`. One pass, one LinkedHashSet — versus n interpreted
  * lambda dispatches plus a second distinct pass over freshly allocated
  * strings.
  *
  * `containsNull = true` because a null input WORD yields a null
  * shingle (concat propagates null), exactly like the declarative
  * fold; `split()` never produces null words, but SQL callers can.
  */
case class Shingle3(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingle3 expects array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val space = UTF8String.fromString(" ")
    if (n < 3) {
      val joined = UTF8String.concatWs(
        space, Array.tabulate(n)(i => arr.getUTF8String(i)): _*)
      new GenericArrayData(Array[Any](joined))
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
      var i = 0
      while (i <= n - 3) {
        seen.add(UTF8String.concat(
          arr.getUTF8String(i), space, arr.getUTF8String(i + 1), space,
          arr.getUTF8String(i + 2)))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle3"
}

object Shingle3 {
  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle3"),
    new ExpressionInfo(classOf[Shingle3].getName, "shingle3"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "shingle3 expects exactly 1 argument")
      Shingle3(args.head)
    })
}

/** `simhash48(words)` ≡ the declarative per-bit majority vote of
  * [[graft.operators.Dedup.simhash]]: 48-bit SimHash where word hashes
  * are the portable 48-bit MD5 prefix ([[PortableHash]]).
  */
case class SimHash48(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash48 expects array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  private val emptyPrefix = Array.emptyByteArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](48)
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i).getBytes
      val h = Md5Local.prefix48(Md5Local.digest(emptyPrefix, w))
      var b = 0
      while (b < 48) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 48) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash48"
}

object SimHash48 {
  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash48"),
    new ExpressionInfo(classOf[SimHash48].getName, "simhash48"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "simhash48 expects exactly 1 argument")
      SimHash48(args.head)
    })
}

/** `rolling_hash48(words)` ≡ the position-mixed commutative rolling hash
  * of [[graft.operators.TextAnalysis.fingerprints]]: the sum over i of
  * the 48-bit MD5 prefix of `"i:word_i"`. Sums of 48-bit terms stay
  * far inside a signed 64-bit Long for any realistic document.
  */
case class RollingHash48(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash48 expects array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val prefix = s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val w = arr.getUTF8String(i).getBytes
      acc += Md5Local.prefix48(Md5Local.digest(prefix, w))
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash48"
}

object RollingHash48 {
  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash48"),
    new ExpressionInfo(classOf[RollingHash48].getName, "rolling_hash48"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "rolling_hash48 expects exactly 1 argument")
      RollingHash48(args.head)
    })
}

/** `srp_bucket(emb, numPlanes[, table])` ≡ the signed-random-projection
  * bucket id of [[graft.operators.Similarity.lshSearch]]: bit h = sign
  * of the index-order dot product of `emb` with pseudo-random
  * hyperplane h, whose component j is
  * `(hash48("h:j") % 1000001) / 500000 - 1`. The optional `table`
  * (default 0) selects an independent plane matrix per LSH hash table
  * (key becomes `"table:h:j"` for table > 0; table 0 keeps the
  * original key so existing buckets/oracles are unchanged) — the
  * multi-table search unions candidates across tables to trade cost
  * for recall.
  *
  * The plane matrix is a pure function of (table, numPlanes, dim):
  * computed once per executor per dim (cached), so the scan does zero
  * hash calls per row — the declarative form needed the matrix shipped
  * as a plan literal plus a driver-side job just to read the dimension.
  */
case class SrpBucket(child: Expression, numPlanes: Int, table: Int = 0)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket expects array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val planes = SrpBucket.planes(numPlanes, dim, table)
    var bucket = 0L
    var h = 0
    while (h < numPlanes) {
      val p = planes(h)
      var dot = 0.0
      var j = 0
      while (j < dim) {
        dot += arr.getDouble(j) * p(j)
        j += 1
      }
      if (dot > 0.0) bucket |= 1L << h
      h += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "srp_bucket"
}

object SrpBucket {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  /** Plane component formula shared with the declarative twin and the
    * DuckDB oracle: hash48("h:j") (table 0) / hash48("table:h:j")
    * (table > 0) mapped into [-1, 1].
    */
  def planes(numPlanes: Int, dim: Int, table: Int = 0): Array[Array[Double]] =
    cache.computeIfAbsent((numPlanes, dim, table), { case (np, d, t) =>
      Array.tabulate(np)(h => Array.tabulate(d) { j =>
        val key = if (t == 0) s"$h:$j" else s"$t:$h:$j"
        (graft.streaming.SyncCore.hash48(key) % 1000001L) / 500000.0 - 1.0
      })
    })

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"srp_bucket $what must be an integer literal, got $other")
  }

  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("srp_bucket"),
    new ExpressionInfo(classOf[SrpBucket].getName, "srp_bucket"),
    (args: Seq[Expression]) => {
      require(args.length == 2 || args.length == 3,
        "srp_bucket expects (embedding, numPlanes[, table])")
      SrpBucket(args.head, intLit(args(1), "numPlanes"),
        if (args.length == 3) intLit(args(2), "table") else 0)
    })
}
