package graft.model

import org.apache.spark.sql.types._

/** The reference engine's value-type lattice, re-expressed as Spark
  * `DataType`s.
  *
  * The reference supports exactly eight scalar types plus typed arrays of
  * those eight; unknown element types fall back to `String`
  * (`/root/reference/src/src/main/java/de/unibi/agbi/biodwh2/arcadedb/server/ArcadeDBService.java:166-176`
  * and `:196-223`). There are no decimal / timestamp / map / struct values
  * in its data path (SURVEY.md §1.2) — dates arrive as strings.
  */
object TypeLattice {

  /** The eight scalar types, keyed by the Java class simple-name the
    * reference sniffs (`ArcadeDBService.java:205-220`). */
  val scalarTypes: Map[String, DataType] = Map(
    "String"  -> StringType,
    "Boolean" -> BooleanType,
    "Integer" -> IntegerType,
    "Float"   -> FloatType,
    "Long"    -> LongType,
    "Double"  -> DoubleType,
    "Byte"    -> ByteType,
    "Short"   -> ShortType
  )

  /** Map a runtime value's class to its lattice `DataType`, mirroring
    * `getTypeByPropertyType` (`ArcadeDBService.java:166-176`): known
    * scalars map directly, anything else falls back to `StringType`. */
  def typeOf(value: Any): DataType = value match {
    case _: String            => StringType
    case _: java.lang.Boolean => BooleanType
    case _: java.lang.Integer => IntegerType
    case _: java.lang.Float   => FloatType
    case _: java.lang.Long    => LongType
    case _: java.lang.Double  => DoubleType
    case _: java.lang.Byte    => ByteType
    case _: java.lang.Short   => ShortType
    case _                    => StringType
  }

  /** Array type for a known element type; unknown elements fall back to
    * `ArrayType(StringType)` (`ArcadeDBService.java:171-173,222`).
    * Element nulls don't occur: the reference never stores null values
    * (`ArcadeDBService.java:184-185`, SURVEY §2.A A7). */
  def arrayOf(elem: DataType): ArrayType =
    if (scalarTypes.values.exists(_ == elem)) ArrayType(elem, containsNull = false)
    else ArrayType(StringType, containsNull = false)

  def isLatticeScalar(dt: DataType): Boolean = scalarTypes.values.exists(_ == dt)

  def isLatticeType(dt: DataType): Boolean = dt match {
    case ArrayType(e, _) => isLatticeScalar(e)
    case other           => isLatticeScalar(other)
  }

  /** Collection → typed-array normalization mirroring
    * `convertCollectionToArray` (`ArcadeDBService.java:196-223`):
    * element type is sniffed from the FIRST NON-NULL element
    * (`:198-203`); if it is one of the eight scalars the whole
    * collection is materialized as that array; otherwise EVERY element
    * is stringified (`:222`). Pure-Scala form, used at ingest of
    * dynamically-typed rows; the DataFrame-level equivalent is a
    * `cast`/`transform` (see `graft.load.Normalize`). */
  def normalizeCollection(values: Seq[Any]): (DataType, IndexedSeq[Any]) = {
    val first = values.find(_ != null)
    first match {
      case Some(_: String)            => (StringType, values.toIndexedSeq)
      case Some(_: java.lang.Boolean) => (BooleanType, values.toIndexedSeq)
      case Some(_: java.lang.Integer) => (IntegerType, values.toIndexedSeq)
      case Some(_: java.lang.Float)   => (FloatType, values.toIndexedSeq)
      case Some(_: java.lang.Long)    => (LongType, values.toIndexedSeq)
      case Some(_: java.lang.Double)  => (DoubleType, values.toIndexedSeq)
      case Some(_: java.lang.Byte)    => (ByteType, values.toIndexedSeq)
      case Some(_: java.lang.Short)   => (ShortType, values.toIndexedSeq)
      case _ =>
        // heterogeneous / unknown / all-null: stringify every element
        (StringType, values.map(v => if (v == null) null else v.toString).toIndexedSeq)
    }
  }
}
