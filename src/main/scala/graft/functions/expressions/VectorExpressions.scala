package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * The composed `zip_with`+`aggregate` form allocates an intermediate array
  * and evaluates a lambda per element per pair — measured ~65s for the 2M
  * pair x 64-dim near-dup sweep at sf0.1. These expressions generate a
  * primitive double loop over the unsafe array data (no boxing, no
  * allocation) inside whole-stage codegen; same sweep runs in ~2s.
  * (Custom-operator ladder step (b): a scalar `Expression` with
  * `doGenCode`, SURVEY §4.2.)
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires two array<double> inputs, got ${l.sql} / ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Driver-built codebook carrier for the centroid expressions.
  *
  * Small books ride the serialized expression as plain data — one object
  * in the codegen references array, shipped once per task binary. Past
  * [[CodebookHandle.BROADCAST_CELLS]] cells the payload moves to a Spark
  * Broadcast: the expression then serializes as a tiny handle and each
  * EXECUTOR fetches the cells once over the torrent protocol, instead of
  * every task binary carrying them (at the 65536-cell clamp an inline
  * 64-dim book is ~33 MB per task — ExpressionsSizeSpec pins the
  * broadcast path's serialized bound). The split point is far below the
  * clamp so the heavy regime never ships inline, while the per-Lloyd-round
  * training codebooks (tens of cells, rebuilt every round) skip broadcast
  * churn entirely. */
sealed trait CodebookHandle extends Serializable {
  def cells: Array[Array[Double]]
  def nCells: Int

  /** Content digest — the handle's IDENTITY: equality is digest
    * equality, so two expressions built from equal codebooks stay
    * semantically equal (Catalyst subexpression elimination and plan
    * canonicalization keep firing) whether the payload rides inline or
    * behind different Broadcast objects. Cryptographic, so digest
    * equality is content equality for any realistic purpose. */
  def digest: String

  override def equals(o: Any): Boolean = o match {
    case h: CodebookHandle => h.digest == digest
    case _ => false
  }
  override def hashCode: Int = digest.hashCode
}

object CodebookHandle {
  val BROADCAST_CELLS = 4096

  private[expressions] def digestRows(rows: Iterator[Array[Double]],
      tag: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val buf = java.nio.ByteBuffer.allocate(8192)
    rows.foreach { row =>
      row.foreach { x =>
        if (buf.remaining() < 8) { md.update(buf.array(), 0, buf.position()); buf.clear() }
        buf.putLong(java.lang.Double.doubleToLongBits(x))
      }
    }
    md.update(buf.array(), 0, buf.position())
    tag + md.digest().map(b => f"$b%02x").mkString
  }

  private final class Inline(cb: Array[Array[Double]], val digest: String)
      extends CodebookHandle {
    def cells: Array[Array[Double]] = cb
    def nCells: Int = cb.length
  }
  private final class Bcast(
      b: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      val nCells: Int, val digest: String) extends CodebookHandle {
    def cells: Array[Array[Double]] = b.value
  }

  // driver-side reuse: constructing the same big codebook twice (bench's
  // repeated passes, a retrained-but-identical book) reuses ONE broadcast
  // instead of shipping a fresh multi-MB block each time. Keyed by
  // (context identity, digest) so a restarted SparkContext never serves a
  // dead broadcast; bounded — eviction only costs the reuse, the orphaned
  // broadcast stays valid until ContextCleaner collects it
  private val bcastCache =
    new java.util.concurrent.ConcurrentHashMap[String, CodebookHandle]()

  def apply(codebook: Seq[Seq[Double]]): CodebookHandle = {
    val cb = codebook.map(_.toArray).toArray
    val dig = digestRows(cb.iterator, s"cb${cb.length}:")
    if (cb.length > BROADCAST_CELLS) {
      val sc = org.apache.spark.sql.SparkSession.active.sparkContext
      val key = s"${sc.applicationId}/${sc.startTime}/$dig"
      if (bcastCache.size > 64) bcastCache.clear()
      bcastCache.computeIfAbsent(key,
        _ => new Bcast(sc.broadcast(cb), cb.length, dig))
    } else new Inline(cb, dig)
  }
}

/** [[CodebookHandle]]'s shape for the per-cell threshold vector — same
  * digest identity and broadcast-reuse story. */
sealed trait ThresholdsHandle extends Serializable {
  def values: Array[Double]
  def n: Int
  def digest: String

  override def equals(o: Any): Boolean = o match {
    case h: ThresholdsHandle => h.digest == digest
    case _ => false
  }
  override def hashCode: Int = digest.hashCode
}

object ThresholdsHandle {
  private final class Inline(th: Array[Double], val digest: String)
      extends ThresholdsHandle {
    def values: Array[Double] = th
    def n: Int = th.length
  }
  private final class Bcast(
      b: org.apache.spark.broadcast.Broadcast[Array[Double]],
      val n: Int, val digest: String) extends ThresholdsHandle {
    def values: Array[Double] = b.value
  }

  private val bcastCache =
    new java.util.concurrent.ConcurrentHashMap[String, ThresholdsHandle]()

  def apply(thresholds: Seq[Double]): ThresholdsHandle = {
    val th = thresholds.toArray
    val dig = CodebookHandle.digestRows(Iterator.single(th), s"th${th.length}:")
    if (th.length > CodebookHandle.BROADCAST_CELLS) {
      val sc = org.apache.spark.sql.SparkSession.active.sparkContext
      val key = s"${sc.applicationId}/${sc.startTime}/$dig"
      if (bcastCache.size > 64) bcastCache.clear()
      bcastCache.computeIfAbsent(key,
        _ => new Bcast(sc.broadcast(th), th.length, dig))
    } else new Inline(th, dig)
  }
}

/** The `k` nearest codebook centroids of a vector, best first, as
  * `array<int>` of centroid ids.
  *
  * The codebook rides the expression as a REFERENCE OBJECT (a
  * [[CodebookHandle]] handed to the generated class), not as C inlined
  * literal sub-expressions: a `typedlit`-per-centroid encoding grows the
  * Catalyst tree — and the generated method body — linearly in C, which
  * blows past JIT/codegen method limits long before a real IVF codebook
  * size (C ~ sqrt(N)). Here the tree is one node at any C and the scan
  * stays a tight primitive loop (C x dim multiply-adds per row, no
  * boxing, no intermediate array); large books additionally ride a
  * Broadcast so the task binary stays O(1) in C.
  *
  * Tiebreak matches the `struct(s, cid)` max/sort it replaces: equal
  * scores prefer the HIGHER centroid id, so codebook assignment is
  * deterministic and bit-identical to the prior implementation. */
case class CentroidTopK(child: Expression, codebook: CodebookHandle, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"centroid_topk needs k >= 1, got $k")
  require(codebook.nCells > 0, "centroid_topk needs a non-empty codebook")

  @transient private lazy val cb: Array[Array[Double]] = codebook.cells

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"centroid_topk requires an array<double> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "centroid_topk"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val kk = math.min(k, cb.length)
    val topS = Array.fill(kk)(Double.NegativeInfinity)
    val topC = Array.fill(kk)(-1)
    var c = 0
    while (c < cb.length) {
      val row = cb(c)
      val n = math.min(dim, row.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * row(i); i += 1 }
      val last = kk - 1
      if (s > topS(last) || (s == topS(last) && c > topC(last))) {
        topS(last) = s; topC(last) = c
        var j = last
        while (j > 0 && (topS(j) > topS(j - 1) ||
            (topS(j) == topS(j - 1) && topC(j) > topC(j - 1)))) {
          val ts = topS(j); topS(j) = topS(j - 1); topS(j - 1) = ts
          val tc = topC(j); topC(j) = topC(j - 1); topC(j - 1) = tc
          j -= 1
        }
      }
      c += 1
    }
    new GenericArrayData(topC)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the reference object is the small HANDLE; the cells resolve once
      // per operator instance (mutable-state init), so a broadcast book
      // is fetched per executor, never per row or per task binary
      val handleRef = ctx.addReferenceObj("codebookHandle", codebook,
        classOf[CodebookHandle].getName)
      val cbRef = ctx.addMutableState("double[][]", "graftCb",
        v => s"$v = $handleRef.cells();")
      val kk = math.min(k, codebook.nCells)
      val dim = ctx.freshName("dim")
      val topS = ctx.freshName("topS")
      val topC = ctx.freshName("topC")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ts = ctx.freshName("ts")
      val tc = ctx.freshName("tc")
      s"""
         |int $dim = $a.numElements();
         |double[] $topS = new double[$kk];
         |int[] $topC = new int[$kk];
         |for (int $j = 0; $j < $kk; $j++) {
         |  $topS[$j] = Double.NEGATIVE_INFINITY; $topC[$j] = -1;
         |}
         |for (int $c = 0; $c < $cbRef.length; $c++) {
         |  double[] $row = $cbRef[$c];
         |  int $n = java.lang.Math.min($dim, $row.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $row[$i]; }
         |  if ($s > $topS[${kk - 1}] ||
         |      ($s == $topS[${kk - 1}] && $c > $topC[${kk - 1}])) {
         |    $topS[${kk - 1}] = $s; $topC[${kk - 1}] = $c;
         |    for (int $j = ${kk - 1};
         |         $j > 0 && ($topS[$j] > $topS[$j - 1] ||
         |                    ($topS[$j] == $topS[$j - 1] && $topC[$j] > $topC[$j - 1]));
         |         $j--) {
         |      double $ts = $topS[$j]; $topS[$j] = $topS[$j - 1]; $topS[$j - 1] = $ts;
         |      int $tc = $topC[$j]; $topC[$j] = $topC[$j - 1]; $topC[$j - 1] = $tc;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($topC);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidTopK =
    copy(child = newChild)
}

/** The ids of every codebook cell whose threshold the vector clears:
  * `{ c | dot(v, codebook(c)) >= thresholds(c) * nrm }`, as `array<int>`
  * in ascending cell order.
  *
  * This is the probe-list generator for EXACT cosine-threshold search over
  * a cell index: with normalized centroids and per-cell angular radii
  * `amax(c)`, setting `thresholds(c) = cos(acos(t) + amax(c))` (or -1 when
  * that angle wraps past pi) makes the kept cells exactly those the
  * spherical triangle inequality cannot exclude for a `cos >= t` match —
  * scaling by the row's own `nrm` keeps the comparison on the normalized
  * query without materializing a normalized copy of the vector. Same
  * reference-object codebook shape as [[CentroidTopK]]: one tree node and
  * one primitive loop at any C. */
case class CentroidsAbove(left: Expression, right: Expression,
    codebook: CodebookHandle, thresholds: ThresholdsHandle)
    extends BinaryExpression {
  require(codebook.nCells > 0, "centroids_above needs a non-empty codebook")
  require(codebook.nCells == thresholds.n,
    s"centroids_above: ${codebook.nCells} cells vs ${thresholds.n} thresholds")

  @transient private lazy val cb: Array[Array[Double]] = codebook.cells
  @transient private lazy val th: Array[Double] = thresholds.values

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"centroids_above requires (array<double>, double), got ${l.sql} / ${r.sql}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "centroids_above"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val dim = v.numElements()
    val out = new Array[Int](cb.length)
    var k = 0
    var c = 0
    while (c < cb.length) {
      val row = cb(c)
      val n = math.min(dim, row.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * row(i); i += 1 }
      if (s >= th(c) * nrm) { out(k) = c; k += 1 }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // handles in the references array, cells resolved once per operator
      // instance — see CentroidTopK
      val cbHandleRef = ctx.addReferenceObj("codebookHandle", codebook,
        classOf[CodebookHandle].getName)
      val thHandleRef = ctx.addReferenceObj("thresholdsHandle", thresholds,
        classOf[ThresholdsHandle].getName)
      val cbRef = ctx.addMutableState("double[][]", "graftCb",
        v => s"$v = $cbHandleRef.cells();")
      val thRef = ctx.addMutableState("double[]", "graftTh",
        v => s"$v = $thHandleRef.values();")
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $dim = $a.numElements();
         |int[] $out = new int[$cbRef.length];
         |int $k = 0;
         |for (int $c = 0; $c < $cbRef.length; $c++) {
         |  double[] $row = $cbRef[$c];
         |  int $n = java.lang.Math.min($dim, $row.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $row[$i]; }
         |  if ($s >= $thRef[$c] * $b) { $out[$k] = $c; $k++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($out, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidsAbove =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd dot product of two array<double> columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      VecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd k-nearest-centroid ids (best first) for an array<double>
    * column against a driver-held codebook (auto-broadcast past
    * [[CodebookHandle.BROADCAST_CELLS]] cells). */
  def centroidTopK(v: Column, codebook: Seq[Seq[Double]], k: Int): Column =
    GraftSqlBridge.column(CentroidTopK(GraftSqlBridge.expression(v),
      CodebookHandle(codebook), k))

  /** Codegen'd thresholded centroid scan: the ids of every codebook cell
    * `c` with `dot(v, codebook(c)) >= thresholds(c) * nrm`, i.e. cells a
    * cosine-ball query centered on `v` cannot prove empty. One loop per
    * row like [[centroidTopK]] — the codebook and per-cell thresholds ride
    * as reference objects, so the expression tree is O(1) in C. */
  def centroidsAbove(v: Column, nrm: Column, codebook: Seq[Seq[Double]],
      thresholds: Seq[Double]): Column =
    GraftSqlBridge.column(CentroidsAbove(GraftSqlBridge.expression(v),
      GraftSqlBridge.expression(nrm), CodebookHandle(codebook),
      ThresholdsHandle(thresholds)))

  /** Make `vec_dot` callable from SQL text in this session
    * (`SELECT vec_dot(a, b) FROM ...`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")
}
