package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Distance kernels over `ArrayType(FloatType)` — the Spark-native analog of
  * the reference's SIMD distance functions (knn/space.cpp:37-1488; metric ids
  * L2/IP/COSINE knn/knn.h:32-37).
  *
  * Design: a custom Catalyst `Expression` with `doGenCode` keeps the float
  * loop inside whole-stage codegen (JIT autovectorizes it), exactly where the
  * reference hand-writes AVX — no UDF/serialization boundary in the hot path.
  *
  * Numerics: elements are read as float and accumulated in double, strictly
  * left-to-right — bit-identical to an oracle that casts to DOUBLE[] and
  * accumulates sequentially, so top-k result sets hash-match.
  *
  * Semantics vs reference: `l2_dist` returns the Euclidean distance (sqrt of
  * hnswlib's squared L2 — monotonic, same ordering); `ip_score`/`cosine_sim`
  * return similarities (reference's IP/cosine *distances* are `1 - score`,
  * knn/space.cpp cosine = IP over normalized) — [[Knn]] flips sign for
  * ordering.
  */
abstract class FloatVecBinary extends BinaryExpression {
  // Inputs must be ArrayType(FloatType); constructed only via the
  // [[distances]] API over float-vector columns, so no analysis-time
  // type-check machinery is wired in (AbstractDataType is private[sql]).
  override def dataType: DataType = DoubleType

  /** Scalar reference implementation (also used by unit tests). */
  protected def compute(a: Array[Float], b: Array[Float]): Double

  /** Java loop body for codegen: given array vars `a`,`b`,`n`, set `ev` (a
    * declared double). Every local the body declares MUST come from
    * `ctx.freshName` — Janino rejects shadowing an outer generated local
    * ("Redefinition of local variable"), and Spark's surrounding consume
    * code routinely holds `i`/`value`-style names in scope (r20: the
    * braced block protected against SIBLING distance expressions but not
    * against the ENCLOSING scope; the fixed-name `i` fell back to
    * interpreted eval in whole plans). */
  protected def genLoop(ctx: CodegenContext, a: String, b: String,
                        n: String, ev: String): String

  protected def checkDims(an: Int, bn: Int): Unit =
    if (an != bn) throw new IllegalArgumentException(
      s"vector dimensions differ: $an vs $bn")

  // NULL elements would silently read as 0.0 (toFloatArray and the
  // codegen getFloat both ignore the null bitmap), yielding plausible
  // but wrong distances — the loud-contract analog of the dim check
  // (review r18-8). The check is generated ONLY when a child's schema
  // admits null elements (containsNull), so engine-written
  // containsNull=false columns pay nothing; when generated it is a
  // separate bitmap pre-pass, keeping the compute loop branch-free.
  private lazy val mayHaveNullElems: Boolean = Seq(left, right).exists(
    _.dataType match {
      case org.apache.spark.sql.types.ArrayType(_, cn) => cn
      case _ => true
    })

  private def requireNoNulls(a: ArrayData, side: String): Unit = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"null vector element at index $i ($side input) — distances over " +
          "vectors with null elements are undefined")
      i += 1
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    if (mayHaveNullElems) {
      requireNoNulls(la, "left"); requireNoNulls(ra, "right")
    }
    val a = la.toFloatArray()
    val b = ra.toFloatArray()
    checkDims(a.length, b.length)
    compute(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val z = ctx.freshName("z")
      // Braces keep sibling distance expressions in one projection from
      // colliding; freshName-d locals (here AND in genLoop) keep the body
      // from shadowing the ENCLOSING generated scope — Java forbids local
      // shadowing, so a fixed name that merely NESTS inside an outer `i`
      // still fails compilation and drops the plan to interpreted eval.
      // ev.value is declared outside, so assigning it inside braces is fine.
      s"""
         |{
         |int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vector dimensions differ: " + $n + " vs " + $r.numElements());
         |}
         |${if (mayHaveNullElems) s"""
         |for (int $z = 0; $z < $n; $z++) {
         |  if ($l.isNullAt($z) || $r.isNullAt($z)) {
         |    throw new IllegalArgumentException(
         |      "null vector element at index " + $z +
         |      " — distances over vectors with null elements are undefined");
         |  }
         |}""".stripMargin else ""}
         |${genLoop(ctx, l, r, n, ev.value.toString)}
         |}
       """.stripMargin
    })
}

/** Euclidean (L2) distance — ref knn/space.cpp L2Sqr kernels (we take the
  * sqrt; ordering is unchanged). */
case class L2Distance(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "l2_dist"
  protected def compute(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
    }
    math.sqrt(acc)
  }
  protected def genLoop(ctx: CodegenContext, a: String, b: String,
                        n: String, ev: String): String = {
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = (double)$a.getFloat($i) - (double)$b.getFloat($i);
       |  $acc += $d * $d;
       |}
       |$ev = Math.sqrt($acc);
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Inner-product similarity (dot product) — ref knn/space.cpp InnerProduct
  * kernels; the reference's IP *distance* is `1 - dot`. */
case class InnerProduct(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "ip_score"
  protected def compute(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  protected def genLoop(ctx: CodegenContext, a: String, b: String,
                        n: String, ev: String): String = {
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);
       |}
       |$ev = $acc;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Cosine similarity — the reference normalizes vectors at index time and
  * uses IP (knn/knn.h:32-37); we compute the full quotient so unnormalized
  * stored vectors score correctly. Zero vectors → 0.0 (defined, not NaN). */
case class CosineSimilarity(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "cosine_sim"
  protected def compute(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
  protected def genLoop(ctx: CodegenContext, a: String, b: String,
                        n: String, ev: String): String = {
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val i = ctx.freshName("i")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    val denom = ctx.freshName("denom")
    s"""
       |double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = (double)$a.getFloat($i);
       |  double $y = (double)$b.getFloat($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |double $denom = Math.sqrt($na) * Math.sqrt($nb);
       |$ev = ($denom == 0.0) ? 0.0 : $dot / $denom;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Column-level API for the distance kernels. */
object distances {
  def l2Dist(a: Column, b: Column): Column =
    Bridge.column(L2Distance(Bridge.expression(a), Bridge.expression(b)))
  def ipScore(a: Column, b: Column): Column =
    Bridge.column(InnerProduct(Bridge.expression(a), Bridge.expression(b)))
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
