package graft.filters

import graft.SparkT
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: every GFilter compiled to Catalyst must agree with a
  * brute-force Scala evaluation of the reference's semantics on random rows
  * that include NULLs and empty strings/arrays.
  *
  * Reference semantics under test (the risk surface of the 32 int-analyzer
  * template variants, accessorint.cpp:1241-1283, and the MVA quantifiers,
  * accessormva.cpp:31-139): an empty/missing value never matches an include
  * filter and always matches the exclude form (accessormva.cpp:38-45,
  * 61-62) — i.e. exclude is the uniform negation of the null-safe include,
  * NOT SQL's ternary `NOT IN`.
  */
// Top-level: Spark encoders cannot instantiate suite-inner case classes.
case class TRow(id: Long, i: Option[Long], f: Option[Double],
                s: Option[String], a: Option[Seq[Long]])

class FiltersSpec extends AnyFunSuite with graft.GenCheck {

  import SparkT.spark.implicits._

  // Fixed random dataset (seeded): small value domains so IN-lists and
  // ranges actually hit; ~10% nulls, ~10% empty strings/arrays.
  private val rows: Seq[TRow] = {
    val rnd = new scala.util.Random(42)
    (0L until 300L).map { id =>
      def opt[A](v: => A): Option[A] = if (rnd.nextInt(10) == 0) None else Some(v)
      TRow(
        id,
        opt(rnd.nextInt(20).toLong),
        opt(rnd.nextInt(100) / 7.0),
        opt(if (rnd.nextInt(10) == 0) "" else s"s${rnd.nextInt(8)}"),
        opt(if (rnd.nextInt(10) == 0) Seq.empty[Long]
            else Seq.fill(rnd.nextInt(4) + 1)(rnd.nextInt(10).toLong).distinct.sorted)
      )
    }
  }

  private lazy val df = SparkT.spark.createDataset(rows).toDF().cache()

  // ---- brute-force evaluation of reference semantics ----
  private def bfInclude(r: TRow, f: GFilter): Boolean = f match {
    case Values(_, vs, _)  => r.i.exists(vs.contains)
    case IntRange(_, lo, hi, li, hiI, _) =>
      r.i.exists(v => inB(v, lo, hi, li, hiI))
    case FloatRange(_, lo, hi, li, hiI, _) =>
      r.f.exists(v => inBD(v, lo, hi, li, hiI))
    case Strings(_, vs, _) => r.s.exists(vs.contains)
    case NotNullF(_, NotNull.Scalar, _) => r.i.isDefined
    case NotNullF(_, NotNull.Str, _)    => r.s.exists(_.nonEmpty)
    case NotNullF(_, NotNull.Arr, _)    => r.a.exists(_.nonEmpty)
    case MvaValues(_, vs, AnyQ, _) => r.a.exists(_.exists(vs.contains))
    case MvaValues(_, vs, AllQ, _) => r.a.exists(a => a.nonEmpty && a.forall(vs.contains))
    case MvaRange(_, lo, hi, li, hiI, AnyQ, _) =>
      r.a.exists(_.exists(v => inB(v, lo, hi, li, hiI)))
    case MvaRange(_, lo, hi, li, hiI, AllQ, _) =>
      r.a.exists(a => a.nonEmpty && a.forall(v => inB(v, lo, hi, li, hiI)))
    case RowidWindow(_, lo, hi, _) => r.id >= lo && r.id < hi
    case _: TsRange => fail("TsRange not exercised here")
  }

  private def inB(v: Long, lo: Option[Long], hi: Option[Long],
                  li: Boolean, hiI: Boolean): Boolean =
    lo.forall(b => if (li) v >= b else v > b) &&
      hi.forall(b => if (hiI) v <= b else v < b)

  private def inBD(v: Double, lo: Option[Double], hi: Option[Double],
                   li: Boolean, hiI: Boolean): Boolean =
    lo.forall(b => if (li) v >= b else v > b) &&
      hi.forall(b => if (hiI) v <= b else v < b)

  private def bruteForce(f: GFilter): Set[Long] = {
    val inc = rows.filter(bfInclude(_, f)).map(_.id).toSet
    if (f.exclude) rows.map(_.id).toSet -- inc else inc
  }

  private def sparkEval(f: GFilter): Set[Long] =
    df.filter(f.toColumn).select("id").as[Long].collect().toSet

  // ---- generators ----
  private val genVals: Gen[Seq[Long]] =
    Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 20L))).map(_.distinct)
  private val genStrs: Gen[Seq[String]] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("", "s0", "s1", "s2", "s3", "s7", "zz"))).map(_.distinct)
  private val genBound: Gen[Option[Long]] =
    Gen.option(Gen.chooseNum(-2L, 22L))
  private val genBoundD: Gen[Option[Double]] =
    Gen.option(Gen.chooseNum(-2.0, 16.0))
  private val genBool: Gen[Boolean] = Gen.oneOf(true, false)
  private val genQuant: Gen[Quant] = Gen.oneOf(AnyQ, AllQ)
  private val genKind: Gen[NotNull.Kind] =
    Gen.oneOf(NotNull.Scalar, NotNull.Str, NotNull.Arr)

  private def kindCol(k: NotNull.Kind): String = k match {
    case NotNull.Scalar => "i"; case NotNull.Str => "s"; case NotNull.Arr => "a"
  }

  private val genFilter: Gen[GFilter] = Gen.oneOf(
    for { vs <- genVals; e <- genBool } yield Values("i", vs, e),
    for { lo <- genBound; hi <- genBound; li <- genBool; hiI <- genBool; e <- genBool }
      yield IntRange("i", lo, hi, li, hiI, e),
    for { lo <- genBoundD; hi <- genBoundD; li <- genBool; hiI <- genBool; e <- genBool }
      yield FloatRange("f", lo, hi, li, hiI, e),
    for { vs <- genStrs; e <- genBool } yield Strings("s", vs, e),
    for { k <- genKind; e <- genBool } yield NotNullF(kindCol(k), k, e),
    for { vs <- genVals; q <- genQuant; e <- genBool } yield MvaValues("a", vs, q, e),
    for { lo <- genBound; hi <- genBound; li <- genBool; hiI <- genBool
          q <- genQuant; e <- genBool } yield MvaRange("a", lo, hi, li, hiI, q, e),
    for { lo <- Gen.chooseNum(0L, 250L); w <- Gen.chooseNum(0L, 100L); e <- genBool }
      yield RowidWindow("id", lo, lo + w, e)
  )

  test("every GFilter agrees with brute-force reference semantics (incl. NULL/empty rows)") {
    forAll(genFilter) { f =>
      assert(sparkEval(f) === bruteForce(f), s"filter: $f")
    }
  }

  test("conjunction = set intersection") {
    forAll(Gen.listOfN(3, genFilter), 20) { fs =>
      val got = df.filter(Filters.compileAll(fs)).select("id").as[Long].collect().toSet
      val want = fs.map(bruteForce).reduce(_ intersect _)
      assert(got === want, s"filters: $fs")
    }
  }

  test("empty filter list compiles to all rows") {
    assert(df.filter(Filters.compileAll(Nil)).count() === rows.size)
  }

  test("exclude over NULL rows: null matches the exclude form (reference, not SQL NOT IN)") {
    // A row with i = NULL must be RETURNED by Values(exclude = true).
    val nullIds = rows.filter(_.i.isEmpty).map(_.id).toSet
    val got = sparkEval(Values("i", Seq(0L, 1L, 2L), exclude = true))
    assert(nullIds.subsetOf(got))
  }
}
