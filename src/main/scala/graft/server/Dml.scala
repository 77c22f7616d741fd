package graft.server

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.load.GraphLoader

/** DML command surface for the HTTP endpoint (the reference's
  * `POST /api/v1/command/{db}` accepts record inserts in ArcadeDB SQL
  * [dep]; SURVEY §2.B.1 DML row). Three statement forms, covering the
  * dialect's insert shapes:
  *
  *   INSERT INTO <Label> (c1, c2, …) VALUES (v1, …)[, (…)]…
  *   CREATE VERTEX <Label> SET k1 = v1, k2 = v2, …
  *   CREATE EDGE <Label> FROM <srcId> TO <dstId> [SET k = v, …]
  *   UPDATE <Label> SET k = v, … [WHERE <pred>]
  *   DELETE FROM <Label> [WHERE <pred>]
  *
  * Insert statements compile to a small typed batch routed through
  * [[GraphLoader.appendNodes]]/[[GraphLoader.appendEdges]] — so every
  * HTTP insert gets the same invariants as the bulk path (id collision,
  * UNIQUE indexes, endpoint resolution) and a rejected batch leaves the
  * store untouched. UPDATE/DELETE are copy-on-write rewrites of the
  * label partition ([[GraphLoader.updateRecords]]/[[GraphLoader.deleteRecords]]):
  * UNIQUE revalidation, immutable keys, and dangling-endpoint rejection
  * on vertex delete. WHERE predicates use the ArcadeSql dialect grammar.
  * Literals: numbers, 'single-quoted' strings ('' to escape),
  * true/false, null.
  */
object Dml {

  private val InsertRe =
    """(?is)\s*INSERT\s+INTO\s+(\w+)\s*\(([^)]*)\)\s*VALUES\s*(.+?)\s*""".r
  private val CreateVertexRe = """(?is)\s*CREATE\s+VERTEX\s+(\w+)\s+SET\s+(.+?)\s*""".r
  private val CreateEdgeRe =
    """(?is)\s*CREATE\s+EDGE\s+(\w+)\s+FROM\s+(-?\d+)\s+TO\s+(-?\d+)(?:\s+SET\s+(.+?))?\s*""".r
  private val UpdateRe =
    """(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*""".r
  private val DeleteRe = """(?is)\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.+?))?\s*""".r
  private val CompactRe = """(?is)\s*COMPACT(?:\s+DATABASE)?\s*""".r

  def isDml(command: String): Boolean = {
    val t = command.trim.toUpperCase
    t.startsWith("INSERT") || t.startsWith("CREATE VERTEX") ||
      t.startsWith("CREATE EDGE") || t.startsWith("UPDATE") ||
      t.startsWith("DELETE") || t.startsWith("COMPACT")
  }

  /** Execute a DML command against the persisted store; returns the
    * number of records written. Throws IllegalArgumentException on
    * parse/validation errors (mapped to HTTP 400). */
  def execute(spark: SparkSession, storeDir: String, command: String): Long = {
    val gs = graft.model.GraphSchema.fromJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$storeDir/schema.json")))
    def kindOf(label: String): String =
      gs.labels.find(_.label == label).map(_.kind).getOrElse(
        throw new IllegalArgumentException(s"unknown label: $label"))

    command match {
      case InsertRe(label, cols, values) =>
        val names = cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(names.nonEmpty, "INSERT needs a column list")
        val tuples = parseTuples(values)
        tuples.foreach(t => require(t.size == names.size,
          s"VALUES arity ${t.size} != column list arity ${names.size}"))
        append(spark, storeDir, label, kindOf(label),
          tuples.map(t => names.zip(t).toMap))
      case CreateVertexRe(label, setClause) =>
        require(kindOf(label) == "vertex", s"$label is not a vertex type")
        append(spark, storeDir, label, "vertex", Seq(parseSet(setClause)))
      case CreateEdgeRe(label, src, dst, setClause) =>
        require(kindOf(label) == "edge", s"$label is not an edge type")
        val props = Option(setClause).map(parseSet).getOrElse(Map.empty)
        append(spark, storeDir, label, "edge",
          Seq(props + ("src" -> src.toLong) + ("dst" -> dst.toLong)))
      // UPDATE/DELETE: copy-on-write rewrites of the label partition with
      // the same invariants as the bulk path (UNIQUE revalidation, no
      // dangling endpoints). The WHERE grammar is the ArcadeSql dialect's.
      case UpdateRe(label, setClause, whereClause) =>
        clientCastErrors {
          val n = GraphLoader.updateRecords(spark, storeDir, label, kindOf(label),
            parseSet(setClause),
            Option(whereClause).map(graft.query.ArcadeSql.predicate)
              .getOrElse(org.apache.spark.sql.functions.lit(true)))
          // GC with a one-generation grace window (an in-process server
          // additionally sweeps with exact pin knowledge post-reload)
          graft.load.Store.sweep(storeDir, keepPerLabel = 1)
          n
        }
      case DeleteRe(label, whereClause) =>
        clientCastErrors {
          val n = GraphLoader.deleteRecords(spark, storeDir, label, kindOf(label),
            Option(whereClause).map(graft.query.ArcadeSql.predicate))
          graft.load.Store.sweep(storeDir, keepPerLabel = 1)
          n
        }
      // maintenance: rewrite fragmented label partitions (the N small
      // files N single-row commands leave behind) into scan-sized files
      case CompactRe() =>
        GraphLoader.compactStore(spark, storeDir).toLong
      case _ =>
        throw new IllegalArgumentException(
          "unsupported DML (expected INSERT INTO … VALUES, CREATE VERTEX … SET, or CREATE EDGE … FROM … TO …)")
    }
  }

  private def append(spark: SparkSession, storeDir: String, label: String,
      kind: String, records: Seq[Map[String, Any]]): Long = {
    val isNode = kind == "vertex"
    if (isNode) records.foreach(r => require(r.contains("id"),
      "node insert needs an explicit id (ids are the graph's join keys)"))
    else records.foreach(r => require(r.contains("src") && r.contains("dst"),
      "edge insert needs src and dst"))
    val columns = records.flatMap(_.keys).distinct :+ "label"
    val rows = records.map(r => Row.fromSeq(
      columns.map(c => if (c == "label") label else r.get(c).orNull)))
    val schema = StructType(columns.map { c =>
      val t = records.flatMap(_.get(c)).collectFirst {
        case _: Long => LongType
        case _: Double => DoubleType
        case _: Boolean => BooleanType
        case _: String => StringType
      }.getOrElse(StringType) // null-only column: appendNodes casts it
      StructField(c, if (c == "label") StringType else t)
    })
    val batch: DataFrame = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
    clientCastErrors {
      if (isNode) GraphLoader.appendNodes(spark, storeDir, batch)
      else GraphLoader.appendEdges(spark, storeDir, batch)
    }
    records.size.toLong
  }

  /** ANSI-mode cast of a type-garbage literal (e.g. a string into a
    * bigint column) fails at validation time — a client error (HTTP
    * 400), not a server fault. */
  private def clientCastErrors[T](f: => T): T =
    try f catch {
      case e: Exception if e.getMessage != null &&
          e.getMessage.contains("CAST_INVALID_INPUT") =>
        throw new IllegalArgumentException(
          s"bad literal for column type: ${e.getMessage.linesIterator.next()}")
    }

  // ---- literal lexing (strings may contain commas and parens) ----

  private final class Lexer(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def done: Boolean = { ws(); i >= s.length }
    def peek: Char = if (i < s.length) s(i) else '\u0000'
    def expect(c: Char): Unit = {
      ws()
      if (peek != c) fail(s"expected '$c'")
      i += 1
    }
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"DML parse error at offset $i: $msg")

    def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      if (i == start) fail("expected identifier")
      s.substring(start, i)
    }

    def literal(): Any = {
      ws()
      peek match {
        case '\'' =>
          i += 1
          val sb = new StringBuilder
          var closed = false
          while (!closed) {
            if (i >= s.length) fail("unterminated string")
            if (s(i) == '\'') {
              if (i + 1 < s.length && s(i + 1) == '\'') { sb.append('\''); i += 2 }
              else { closed = true; i += 1 }
            } else { sb.append(s(i)); i += 1 }
          }
          sb.toString
        case c if c == '-' || c.isDigit =>
          val start = i
          i += 1
          while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
          val t = s.substring(start, i)
          if (t.contains('.')) t.toDouble else t.toLong
        case _ =>
          ident().toLowerCase match {
            case "true" => true
            case "false" => false
            case "null" => null
            case other => fail(s"unexpected literal '$other'")
          }
      }
    }
  }

  /** `(v, …)[, (v, …)]…` */
  private def parseTuples(s: String): Seq[Seq[Any]] = {
    val lx = new Lexer(s)
    val out = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    var more = true
    while (more) {
      lx.expect('(')
      val tuple = scala.collection.mutable.ArrayBuffer[Any]()
      tuple += lx.literal()
      lx.ws()
      while (lx.peek == ',') { lx.i += 1; tuple += lx.literal(); lx.ws() }
      lx.expect(')')
      out += tuple.toSeq
      lx.ws()
      if (lx.peek == ',') lx.i += 1 else more = false
    }
    if (!lx.done) lx.fail("trailing input after VALUES tuples")
    out.toSeq
  }

  /** `k = v[, k = v]…` */
  private def parseSet(s: String): Map[String, Any] = {
    val lx = new Lexer(s)
    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    var more = true
    while (more) {
      val k = lx.ident()
      lx.expect('=')
      out(k) = lx.literal()
      lx.ws()
      if (lx.peek == ',') lx.i += 1 else more = false
    }
    if (!lx.done) lx.fail("trailing input after SET clause")
    out.toMap
  }
}
