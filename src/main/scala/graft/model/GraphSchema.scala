package graft.model

import org.apache.spark.sql.types._

/** One declared secondary index, mirroring the reference's
  * `IndexDescription` consumption
  * (`/root/reference/src/src/main/java/de/unibi/agbi/biodwh2/arcadedb/server/ArcadeDBService.java:258-283`):
  * target ∈ {node, edge}, label, property, UNIQUE vs NON_UNIQUE, and an
  * array-property flag — indexes on array properties are skipped
  * (`:263-269`).
  */
final case class IndexDesc(
    target: String, // "node" | "edge"
    label: String,
    property: String,
    unique: Boolean,
    isArray: Boolean,
    /** FULL_TEXT index kind (ArcadeDB index types are UNIQUE /
      * NOTUNIQUE / FULL_TEXT [dep arcadedb SQL]): served by a persisted
      * postings table in the store ([[graft.load.FullText]]) instead of
      * a uniqueness invariant. Node labels only — edge records are
      * endpoint-identified and carry no `id` to post against. */
    fulltext: Boolean = false
) {
  /** The reference skips array-typed properties (`ArcadeDBService.java:263-269`). */
  def isBuildable: Boolean = !isArray
}

/** One declared property constraint (ArcadeDB's `ALTER PROPERTY`
  * attribute surface [dep arcadedb SQL]): MANDATORY/NOTNULL, MIN, MAX,
  * REGEXP, DEFAULT. Under the engine's A7 normalization an absent key
  * IS a null column value (null-skip parity collapses "key missing"
  * and "value null" into one representation), so MANDATORY and NOTNULL
  * enforce the SAME invariant here — every stored row of the label
  * carries a non-null value — and both spellings declare kind
  * "mandatory". MIN/MAX bound non-null values (numeric order for
  * numeric properties, lexicographic for strings — the literal is cast
  * to the property's type at check time); REGEXP demands a FULL match
  * of every non-null value; DEFAULT is a fill, not a check — appended
  * rows with a null/absent value receive it before validation. `arg`
  * carries the attribute's literal for every kind but "mandatory". */
final case class ConstraintDesc(
    target: String, // "node" | "edge"
    label: String,
    property: String,
    kind: String, // "mandatory" | "min" | "max" | "regexp" | "default"
    arg: Option[String] = None)

/** Per-label declared schema: the reference reads a per-label
  * property-key → type map without scanning rows
  * (`ArcadeDBService.java:150-151,234-235`) and declares it up-front
  * before the first insert (`:148-154`, `:232-238`). kind ∈ {vertex, edge}.
  */
/** `settings`: the ALTER TYPE attribute bag (bucketselectionstrategy,
  * custom.<key> — ArcadeDB's physical-placement knobs [dep arcadedb
  * SQL]). Recorded for catalog round-trip fidelity; the Spark store's
  * physical layout is label-partitioned generations, so placement
  * strategies are declarative metadata here, not an execution switch
  * (documented no-op, like A18's log bridge). */
final case class LabelSchema(label: String, kind: String, schema: StructType,
    settings: Map[String, String] = Map.empty)

/** A server-registered SQL function (the reference's `DEFINE FUNCTION`
  * surface [dep arcadedb SQL], SQL-language form only): a named
  * dialect-expression macro. `body` is an ArcadeSql expression over
  * `params`; calls expand at parse time (ArcadeSql.compile), so there
  * is no new executor — a registered function call plans exactly like
  * its inlined twin. */
final case class FunctionDef(name: String, params: Seq[String], body: String)

/** The property-graph catalog (SURVEY §4.2 "custom: property-graph
  * catalog"): label → (kind, StructType, indexes). Plain Scala — feeds
  * temp views / per-label reads; no Catalyst work needed. Serialized as
  * JSON next to the data (the Spark-side analogue of ArcadeDB's declared
  * schema).
  */
final case class GraphSchema(labels: Seq[LabelSchema], indexes: Seq[IndexDesc],
    functions: Seq[FunctionDef] = Nil,
    constraints: Seq[ConstraintDesc] = Nil) {

  def nodeLabels: Seq[String] = labels.filter(_.kind == "vertex").map(_.label)
  def edgeLabels: Seq[String] = labels.filter(_.kind == "edge").map(_.label)
  def apply(label: String): LabelSchema = labels.find(_.label == label).get
  def indexesFor(label: String): Seq[IndexDesc] = indexes.filter(_.label == label)

  /** JSON form; `StructType.json` is Spark's own stable serialization. */
  def toJson: String = {
    import GraphSchema.{escJson => esc}
    val ls = labels
      .map { l =>
        // settings emit only when present: existing stores' schema.json
        // stays byte-identical (and diff-clean) through an upgrade
        val st =
          if (l.settings.isEmpty) ""
          else l.settings.toSeq.sortBy(_._1)
            .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
            .mkString(""","settings":{""", ",", "}")
        s"""{"label":"${esc(l.label)}","kind":"${l.kind}","schema":${l.schema.json}$st}"""
      }
      .mkString("[", ",", "]")
    val is = indexes
      .map(i =>
        s"""{"target":"${i.target}","label":"${esc(i.label)}","property":"${esc(i.property)}","unique":${i.unique},"isArray":${i.isArray},"fulltext":${i.fulltext}}""")
      .mkString("[", ",", "]")
    val fs = functions
      .map(f => s"""{"name":"${esc(f.name)}","params":${f.params.map(p => s""""${esc(p)}"""").mkString("[", ",", "]")},"body":"${esc(f.body)}"}""")
      .mkString("[", ",", "]")
    val cs = constraints
      .map { c =>
        val arg = c.arg.map(a => s""","arg":"${esc(a)}"""").getOrElse("")
        s"""{"target":"${c.target}","label":"${esc(c.label)}","property":"${esc(c.property)}","kind":"${c.kind}"$arg}"""
      }
      .mkString("[", ",", "]")
    s"""{"labels":$ls,"indexes":$is,"functions":$fs,"constraints":$cs}"""
  }
}

object GraphSchema {

  /** The ONE JSON string escaper for every hand-written catalog file
    * (schema.json AND manifest.json). Control characters MUST escape:
    * a label or function body holding a raw newline would make the
    * file unparseable for every subsequent read — a bricked store from
    * one legal-looking input. Labels reach manifest.json from bulk-load
    * INPUT DATA, not just the dialect parser, so the manifest writer
    * shares this escaper rather than trusting its callers. */
  def escJson(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Parse the JSON written by [[GraphSchema.toJson]]. Uses Spark's
    * `DataType.fromJson` for the per-label StructTypes; the outer
    * envelope is parsed with the JSON4S shipped inside Spark. */
  def fromJson(json: String): GraphSchema = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(json)
    val labels = (root \ "labels") match {
      case JArray(arr) =>
        arr.map { l =>
          LabelSchema(
            (l \ "label").extract[String],
            (l \ "kind").extract[String],
            DataType.fromJson(JsonMethods.compact(JsonMethods.render(l \ "schema")))
              .asInstanceOf[StructType],
            // absent in pre-ALTER-TYPE schema.json files → no settings
            settings = (l \ "settings") match {
              case JObject(fields) => fields.collect {
                case (k, JString(v)) => k -> v
              }.toMap
              case _ => Map.empty
            }
          )
        }
      case _ => Nil
    }
    val indexes = (root \ "indexes") match {
      case JArray(arr) =>
        arr.map { i =>
          IndexDesc(
            (i \ "target").extract[String],
            (i \ "label").extract[String],
            (i \ "property").extract[String],
            (i \ "unique").extract[Boolean],
            (i \ "isArray").extract[Boolean],
            // absent in pre-full-text schema.json files → value index
            fulltext = (i \ "fulltext").extractOrElse[Boolean](false)
          )
        }
      case _ => Nil
    }
    // absent in pre-function schema.json files → no registered functions
    val functions = (root \ "functions") match {
      case JArray(arr) =>
        arr.map { f =>
          FunctionDef(
            (f \ "name").extract[String],
            (f \ "params").extract[Seq[String]],
            (f \ "body").extract[String]
          )
        }
      case _ => Nil
    }
    // absent in pre-constraint schema.json files → no constraints
    val constraints = (root \ "constraints") match {
      case JArray(arr) =>
        arr.map { c =>
          ConstraintDesc(
            (c \ "target").extract[String],
            (c \ "label").extract[String],
            (c \ "property").extract[String],
            (c \ "kind").extract[String],
            // absent for "mandatory" (and pre-attribute schema files)
            (c \ "arg").extractOpt[String]
          )
        }
      case _ => Nil
    }
    GraphSchema(labels, indexes, functions, constraints)
  }
}
