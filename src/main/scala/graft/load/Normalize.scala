package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.TypeLattice

/** Record-normalization operators of the reference's load path
  * (SURVEY §2.A A6–A10), as declarative Column transforms — no UDFs, so
  * everything stays inside whole-stage codegen.
  */
object Normalize {

  /** Internal bookkeeping keys excluded from user data (A6). The
    * reference consults `Node.IGNORED_FIELDS` / `Edge.IGNORED_FIELDS`
    * (`ArcadeDBService.java:153,180,237,246`); in biodwh2-core these are
    * the dunder fields. */
  val IgnoredFields: Seq[String] = Seq("__id", "__label", "__from_id", "__to_id", "__revision")

  /** A6: drop bookkeeping columns if present. */
  def pruneInternalFields(df: DataFrame): DataFrame =
    df.drop(IgnoredFields: _*)

  /** A8: clamp a column to the 8-type lattice — lattice types pass
    * through, arrays of unknown elements stringify, scalars outside the
    * lattice cast to string (`ArcadeDBService.java:166-176`). */
  def toLattice(col: Column, dt: DataType): Column = dt match {
    case t if TypeLattice.isLatticeScalar(t) => col
    case ArrayType(e, _) if TypeLattice.isLatticeScalar(e) => col
    case ArrayType(_, _) =>
      // A9 fallback: stringify every element (`ArcadeDBService.java:222`)
      transform(col, x => x.cast(StringType))
    case _ => col.cast(StringType)
  }

  /** A8+A9 over a whole DataFrame. */
  def normalizeToLattice(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map(f => toLattice(df.col(f.name), f.dataType).as(f.name)).toIndexedSeq: _*)

  /** A10: error-tolerant load. The reference sets each property inside a
    * try/catch, logs, and continues (`setPropertySafe`,
    * `ArcadeDBService.java:178-193`). The Spark analogue: values that
    * fail the declared cast become null (`try_cast` semantics) and are
    * counted on a side channel, while the job continues — the
    * `badRecordsPath`-style pattern without a driver-side loop. */
  def safeCast(df: DataFrame, target: StructType): (DataFrame, DataFrame) = {
    val casted = df.select(target.fields.map { f =>
      if (df.columns.contains(f.name)) try_cast(df.col(f.name), f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    val bad = df.select(target.fields.filter(f => df.columns.contains(f.name)).map { f =>
      count(when(df.col(f.name).isNotNull && try_cast(df.col(f.name), f.dataType).isNull, 1))
        .as(f.name)
    }.toIndexedSeq: _*)
    (casted, bad)
  }

  private def try_cast(c: Column, dt: DataType): Column = c.try_cast(dt)

  /** A7 parity helper: the reference never stores null property values
    * (`ArcadeDBService.java:184-185`), so "key absent" and "value null"
    * are indistinguishable downstream. Comparisons over possibly-missing
    * properties must use null-safe equality. */
  def nullSafeEq(a: Column, b: Column): Column = a <=> b
}
