package graft.vector

import graft.SparkT
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Distance kernels: codegen'd DataFrame evaluation must be bit-identical to
  * the scalar reference loop (same float-read/double-accumulate order), and
  * multiple distance expressions must coexist in one projection (regression:
  * fixed-name locals leaked into the enclosing codegen scope).
  * SparkT sets codegen.fallback=false, so any Janino failure is fatal here.
  */
class DistancesSpec extends AnyFunSuite with graft.GenCheck {

  import SparkT.spark.implicits._

  private def scalarL2(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
    math.sqrt(acc)
  }
  private def scalarIp(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def scalarCos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  private val genVecPair: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.chooseNum(1, 12)
    a <- Gen.listOfN(n, Gen.chooseNum(-8.0f, 8.0f))
    b <- Gen.listOfN(n, Gen.chooseNum(-8.0f, 8.0f))
  } yield (a.toArray, b.toArray)

  test("codegen evaluation is bit-identical to the scalar reference loops") {
    forAll(genVecPair, 20) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        distances.l2Dist(col("a"), col("b")).as("l2"),
        distances.ipScore(col("a"), col("b")).as("ip"),
        distances.cosineSim(col("a"), col("b")).as("cos")
      ).head()
      // Three expressions in one projection: also the codegen-scope regression.
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(scalarL2(a, b)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToRawLongBits(scalarIp(a, b)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToRawLongBits(scalarCos(a, b)))
    }
  }

  test("cosine of a zero vector is 0.0 (defined, not NaN)") {
    val z = Array(0.0f, 0.0f, 0.0f)
    val v = Array(1.0f, 2.0f, 3.0f)
    val r = Seq((z, v)).toDF("a", "b")
      .select(distances.cosineSim(col("a"), col("b"))).head().getDouble(0)
    assert(r === 0.0)
  }

  test("NULL input yields NULL, not an error") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.select(distances.l2Dist(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("dimension mismatch raises a descriptive error") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(distances.l2Dist(col("a"), col("b"))).head()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("vector dimensions differ")))
  }

  test("knn returns k best-first with id tiebreak") {
    val vecs = (0L until 50L).map(i => (i, Array(i.toFloat, 0.0f)))
    val df = vecs.toDF("id", "v")
    val got = Knn.knn(df, "v", "id", Array(10.0f, 0.0f), 5, Knn.L2)
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(10L, 9L, 11L, 8L, 12L))
  }

  test("knnJoin equals per-query knn for every query row (batch retrieval)") {
    val rnd = new scala.util.Random(5)
    val corpus = (100L until 300L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val queries = (0L until 12L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val cdf = corpus.toDF("cid", "v")
    val qdf = queries.toDF("qid", "v")
    for (metric <- Seq(Knn.L2, Knn.Cosine)) {
      val joined = Knn.knnJoin(qdf, cdf, "qid", "v", "cid", "v", 5, metric)
        .select($"qid", $"cid", $"rn").as[(Long, Long, Int)]
        .collect().groupBy(_._1)
      assert(joined.keySet === queries.map(_._1).toSet) // every query answered
      queries.foreach { case (qid, qv) =>
        val want = Knn.knn(cdf, "v", "cid", qv, 5, metric)
          .select("cid").as[Long].collect().toSeq
        val got = joined(qid).sortBy(_._3).map(_._2).toSeq
        assert(got === want, s"query $qid ($metric)")
      }
    }
  }

  test("distance kernels are registered as SQL functions (H8 SQL surface)") {
    val a = Array(1f, 2f, 3f); val b = Array(4f, 5f, 6f)
    Seq((a, b)).toDF("a", "b").createOrReplaceTempView("vecs_sqlfn")
    val row = SparkT.spark.sql(
      "SELECT l2_dist(a, b), ip_score(a, b), cosine_sim(a, b) FROM vecs_sqlfn")
      .head
    assert(row.getDouble(0) === scalarL2(a, b))
    assert(row.getDouble(1) === scalarIp(a, b))
    assert(row.getDouble(2) === scalarCos(a, b))
    // wrong arity is rejected at registration, not evaluated wrongly
    intercept[Exception] {
      SparkT.spark.sql("SELECT l2_dist(a) FROM vecs_sqlfn").head
    }
  }

  test("distance codegen never shadows enclosing locals: sort-key projection over an array literal compiles (r20)") {
    // the q_knn_sql shape: an inline array literal + ORDER BY the distance
    // expression + LIMIT puts the kernel inside TakeOrderedAndProject's
    // sort-key UnsafeProjection, whose generated scope already declares
    // `i` — the pre-r20 fixed-name loop local shadowed it, Janino refused
    // (Java forbids local shadowing even across nested blocks), and the
    // whole projection fell back to interpreted eval in every bench run
    // of q_knn_sql. SparkT's codegen.fallback=false makes that fatal here.
    val rows = Seq((1L, Array(1f, 2f, 3f, 4f)), (2L, Array(4f, 3f, 2f, 1f)),
      (3L, Array(0f, 0f, 1f, 0f)))
    rows.toDF("id", "v").createOrReplaceTempView("vecs_shadow")
    val vecSql = (1 to 4).map(f => s"CAST($f AS FLOAT)")
      .mkString("array(", ",", ")")
    val got = SparkT.spark.sql(
      s"SELECT id, round(l2_dist(v, $vecSql), 6) AS dist FROM vecs_shadow " +
        s"ORDER BY l2_dist(v, $vecSql) ASC, id ASC LIMIT 2")
      .as[(Long, Double)].collect().toSeq
    val q = Array(1f, 2f, 3f, 4f)
    val want = rows.map { case (id, v) => (id, scalarL2(v, q)) }
      .sortBy { case (id, d) => (d, id) }.take(2)
      .map { case (id, d) =>
        (id, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) }
    assert(got === want)
  }

  test("a NULL vector element fails loudly instead of reading as 0.0 " +
      "(r18 review)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 2.0f)))
    val df = SparkT.spark.createDataFrame(rows, schema)
    val e = intercept[Exception](
      df.select(distances.l2Dist(col("a"), col("b"))).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null vector element")), msgs(e))
    // clean nullable-typed vectors still compute (the check is a
    // pre-pass, not a behavior change)
    val ok = java.util.Arrays.asList(
      Row(Seq[java.lang.Float](3.0f, 4.0f), Seq[java.lang.Float](0.0f, 0.0f)))
    val got = SparkT.spark.createDataFrame(ok, schema)
      .select(distances.l2Dist(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - 5.0) < 1e-12)
  }
}
