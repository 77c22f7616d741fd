package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.model.{GraphSchema, IndexDesc, LabelSchema, TypeLattice}

/** SURVEY §5.2 items 2–3: reference-pinned semantics of the type
  * lattice (A8) and collection normalization (A9), pure Scala — no
  * Spark session needed. */
class ModelSpec extends AnyFunSuite {

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p).passed)

  test("A8: the eight scalar types map to their Spark types") {
    assert(TypeLattice.scalarTypes.size == 8)
    assert(TypeLattice.typeOf("x") == StringType)
    assert(TypeLattice.typeOf(java.lang.Integer.valueOf(1)) == IntegerType)
    assert(TypeLattice.typeOf(java.lang.Byte.valueOf(1.toByte)) == ByteType)
    // unknown classes fall back to String (ArcadeDBService.java:174-175)
    assert(TypeLattice.typeOf(new java.util.Date()) == StringType)
  }

  test("A9: element type sniffed from first NON-NULL element") {
    val (dt, vals) = TypeLattice.normalizeCollection(
      Seq(null, java.lang.Integer.valueOf(7), java.lang.Integer.valueOf(9)))
    assert(dt == IntegerType)
    assert(vals == IndexedSeq(null, 7, 9))
  }

  test("A9: unknown element type stringifies EVERY element (ArcadeDBService.java:222)") {
    val (dt, vals) = TypeLattice.normalizeCollection(
      Seq(java.math.BigDecimal.ONE, java.lang.Integer.valueOf(2)))
    assert(dt == StringType)
    assert(vals == IndexedSeq("1", "2"))
  }

  test("A9 property: fallback always yields all-string values") {
    val weird: Gen[Any] = Gen.oneOf(
      Gen.const(java.math.BigDecimal.TEN: Any),
      Gen.const(new java.util.Date(0): Any),
      Gen.chooseNum(1, 9).map(i => java.math.BigInteger.valueOf(i.toLong): Any))
    check(Prop.forAll(Gen.nonEmptyListOf(weird)) { xs =>
      val (dt, vals) = TypeLattice.normalizeCollection(xs)
      dt == StringType && vals.forall(v => v == null || v.isInstanceOf[String])
    })
  }

  test("A9: all-null collection falls back to String") {
    val (dt, vals) = TypeLattice.normalizeCollection(Seq(null, null))
    assert(dt == StringType && vals == IndexedSeq(null, null))
  }

  test("arrayOf: unknown element types fall back to ArrayType(String)") {
    assert(TypeLattice.arrayOf(IntegerType) == ArrayType(IntegerType, containsNull = false))
    assert(TypeLattice.arrayOf(DecimalType(10, 2)) == ArrayType(StringType, containsNull = false))
  }

  test("GraphSchema JSON round-trip") {
    val gs = GraphSchema(
      Seq(LabelSchema("A", "vertex", StructType(Seq(StructField("x", LongType))))),
      Seq(IndexDesc("node", "A", "x", unique = true, isArray = false)))
    val back = GraphSchema.fromJson(gs.toJson)
    assert(back == gs)
    // A15 skip rule: array-typed index is not buildable
    assert(IndexDesc("node", "A", "t", unique = true, isArray = true).isBuildable == false)
  }
}
