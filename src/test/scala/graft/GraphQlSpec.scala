package graft

import org.apache.spark.sql.functions._
import graft.load.GraphLoader
import graft.query.{GraphQl, PropertyGraph}

/** GraphQL surface (SURVEY §2.B GraphQL row): the compiled plan must be
  * the same joins as the equivalent Traversal — GraphQL adds parsing,
  * not execution. */
class GraphQlSpec extends SparkSpec {

  lazy val g = PropertyGraph(GraphLoader.nodes(spark, sfDir), GraphLoader.edges(spark, sfDir))

  test("nested hop query is bag-equal to the hand-built Traversal join") {
    val viaGql = GraphQl.compile(g,
      """{ Customer(mktsegment: "BUILDING") {
           name acctbal orders: out_PLACED { totalprice status } } }""")
    val viaTraversal = g.v("Customer", "c")
      .filter(col("c_mktsegment") === "BUILDING")
      .out("PLACED", "Order", "o").result
      .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"),
        col("o_totalprice").as("orders_totalprice"), col("o_status").as("orders_status"))
    assert(viaGql.columns.toSeq ==
      Seq("name", "acctbal", "orders_totalprice", "orders_status"))
    assert(viaGql.count() == viaTraversal.count())
    assert(viaGql.exceptAll(viaTraversal).count() == 0)
    assert(viaTraversal.exceptAll(viaGql).count() == 0)
    // the plan is the traversal's: an equi-join, no extra machinery
    val plan = viaGql.queryExecution.executedPlan.toString
    assert(plan.contains("Join") || plan.contains("BroadcastHashJoin"))
  }

  test("in_ hop, hop args, and sibling hops from the same binding") {
    val df = GraphQl.compile(g,
      """query { Region { name nations: in_IN_REGION(name: "NATION_7") { name } } }""")
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows(0).getString(df.columns.indexOf("nations_name")) == "NATION_7")

    // two sibling hops both start from the root binding, not from each other
    val sib = GraphQl.compile(g,
      """{ Nation(name: "NATION_7") {
           name r: out_IN_REGION { name } members: in_IN_NATION { name } } }""")
    assert(sib.columns.toSeq == Seq("name", "r_name", "members_name"))
    // every member row carries the same region name (cross of 1 region × members)
    assert(sib.select("r_name").distinct().count() == 1)
    assert(sib.count() > 0)
  }

  test("both_ hop unions the two directions") {
    val df = GraphQl.compile(g,
      """{ Nation(name: "NATION_7") { name nbrs: both_IN_REGION { name } } }""")
    // nation 7's only IN_REGION neighbor is its region (out direction)
    val rows = df.collect()
    assert(rows.length == 1)
    val regionNames = g.nodesOf("Region").select("name").collect().map(_.getString(0)).toSet
    assert(regionNames.contains(rows(0).getString(1)))
  }

  test("scalar-only query with numeric argument filter") {
    val df = GraphQl.compile(g, """{ Part(psize: 1) { name brand psize } }""")
    assert(df.columns.toSeq == Seq("name", "brand", "psize"))
    assert(df.filter(col("psize") =!= 1).count() == 0)
    assert(df.count() ==
      g.nodesOf("Part").filter(col("psize") === 1).count())
  }

  test("orderBy/limit arguments page the root selection, refuse hop scope") {
    val df = GraphQl.compile(g,
      """{ Customer(orderBy: "acctbal desc", limit: 5) { name acctbal } }""")
    val rows = df.collect()
    assert(rows.length == 5)
    val top5 = g.nodesOf("Customer").orderBy(col("acctbal").desc)
      .limit(5).select("acctbal").collect().map(_.getDouble(0)).toSeq
    assert(rows.map(_.getDouble(1)).toSeq == top5)
    // ascending is the default direction; the sort key need not be selected
    val asc = GraphQl.compile(g,
      """{ Customer(orderBy: "name", limit: 3) { acctbal } }""").count()
    assert(asc == 3)
    // top-k plans as TakeOrderedAndProject — never a total sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k in:\n$plan")
    // reserved args are root-only: a hop-scoped limit is refused loudly
    intercept[IllegalArgumentException](GraphQl.compile(g,
      """{ Customer { name orders: out_PLACED(limit: 3) { status } } }"""))
    // degenerate modifier values are loud, not silently ignored
    intercept[IllegalArgumentException](GraphQl.compile(g,
      """{ Customer(orderBy: "name sideways", limit: 3) { name } }"""))
    intercept[IllegalArgumentException](GraphQl.compile(g,
      """{ Customer(limit: -1) { name } }"""))
  }

  test("parser fails closed on fuzzed input (never escapes IllegalArgumentException)") {
    val rnd = new scala.util.Random(3)
    // two seeds: the classic data query, and one exercising the
    // round-12 grammar (variables, defaults, fragments, spreads,
    // inline conditions, __typename) so mutations fuzz the new paths
    val seeds = Seq(
      """query { Customer(mktsegment: "B", psize: 4) {
        name acctbal orders: out_PLACED { totalprice status } } }""",
      """query Q($s: String!, $n: Int = 3) {
        Customer(mktsegment: $s, limit: $n) { __typename ...bits
          ... on Customer { acctbal } } }
        fragment bits on Customer { name }""")
    val chars = "{}()<>:,'\"= abz019_#$.!".toCharArray
    seeds.foreach { seed =>
      (1 to 500).foreach { i =>
        val sb = new StringBuilder(seed)
        (0 to rnd.nextInt(4)).foreach { _ =>
          rnd.nextInt(3) match {
            case 0 if sb.nonEmpty => sb.deleteCharAt(rnd.nextInt(sb.length))
            case 1 => sb.insert(rnd.nextInt(sb.length + 1), chars(rnd.nextInt(chars.length)))
            case _ if sb.nonEmpty => sb.setCharAt(rnd.nextInt(sb.length), chars(rnd.nextInt(chars.length)))
            case _ => ()
          }
        }
        try GraphQl.parse(sb.toString, Map("s" -> "B"))
        catch {
          case _: IllegalArgumentException => () // the contract: fail closed
          case e: Throwable => fail(s"mutant $i threw ${e.getClass}: ${sb.toString.take(120)}")
        }
      }
    }
  }

  test("parser rejects malformed documents") {
    intercept[IllegalArgumentException](GraphQl.parse("{ Customer { name }")) // unbalanced
    intercept[IllegalArgumentException](GraphQl.parse("Customer { name }"))   // no braces
    intercept[IllegalArgumentException](GraphQl.parse("{ A { x } B { y } }")) // two roots
    intercept[IllegalArgumentException](GraphQl.parse("{ A(k:) { x } }"))     // bad arg
    intercept[IllegalArgumentException](
      GraphQl.compile(g, "{ Customer { out_PLACED } }")) // hop without selections
  }

  test("mutations translate to the DML statements they denote") {
    def one(doc: String): String = GraphQl.mutationToDml(doc) match {
      case Seq(s) => s
      case other => fail(s"expected one statement, got $other")
    }
    assert(one("""mutation { createCustomer(id: 7, name: "O'Hare", vip: true) }""")
      == "CREATE VERTEX Customer SET id = 7, name = 'O''Hare', vip = true")
    assert(one("""mutation { createCustomer(input: {id: 7, acctbal: 1.5}) }""")
      == "CREATE VERTEX Customer SET id = 7, acctbal = 1.5")
    assert(one("""mutation { createPLACED(from: 1, to: 2, weight: 3) }""")
      == "CREATE EDGE PLACED FROM 1 TO 2 SET weight = 3")
    assert(one("""mutation { createPLACED(from: 1, to: 2) }""")
      == "CREATE EDGE PLACED FROM 1 TO 2")
    assert(one("""mutation { updateCustomer(where: {id: 7, name: "x"}, set: {acctbal: 2.0}) }""")
      == "UPDATE Customer SET acctbal = 2.0 WHERE id = 7 AND name = 'x'")
    assert(one("""mutation { deleteCustomer(where: {id: 7}) }""")
      == "DELETE FROM Customer WHERE id = 7")
    // multi-field = multi-statement (the server batches them atomically)
    assert(GraphQl.mutationToDml(
      """mutation { createCustomer(id: 1) deleteCustomer(where: {id: 1}) }""").size == 2)
    // refusals: empty where, missing set, selection sets, half an edge,
    // unknown verb, and a mutation on the read path
    intercept[IllegalArgumentException](GraphQl.mutationToDml(
      "mutation { deleteCustomer(where: {}) }"))
    intercept[IllegalArgumentException](GraphQl.mutationToDml(
      "mutation { updateCustomer(where: {id: 1}) }"))
    intercept[IllegalArgumentException](GraphQl.mutationToDml(
      "mutation { createCustomer(id: 1) { id } }"))
    intercept[IllegalArgumentException](GraphQl.mutationToDml(
      "mutation { createPLACED(from: 1, weight: 2) }"))
    intercept[IllegalArgumentException](GraphQl.mutationToDml(
      "mutation { upsertCustomer(id: 1) }"))
    intercept[IllegalArgumentException](GraphQl.parse(
      "mutation { deleteCustomer(where: {id: 1}) }"))
  }

  test("introspection: __schema round-trips types, fields, and edge relations") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val gs = GraphLoader.schema
    val eps = Map(
      "PLACED" -> ((Set("Customer"), Set("Order"))),
      "IN_REGION" -> ((Set("Nation"), Set("Region"))))
    val j = JsonMethods.parse(GraphQl.introspect(gs,
      "query IntrospectionQuery { __schema { queryType { name } } }", eps.get(_)))
    assert((j \ "data" \ "__schema" \ "queryType" \ "name") == JString("Query"))
    assert((j \ "data" \ "__schema" \ "mutationType" \ "name") == JString("Mutation"))
    val types = (j \ "data" \ "__schema" \ "types").children
    def typeNamed(n: String) = types.find(t => t \ "name" == JString(n))
      .getOrElse(fail(s"type $n missing"))
    def fieldNames(t: JValue) = (t \ "fields").children
      .map(f => f \ "name").collect { case JString(s) => s }
    // every declared label is an OBJECT carrying its declared properties
    val cust = typeNamed("Customer")
    assert(cust \ "kind" == JString("OBJECT"))
    assert(Set("id", "label", "name", "acctbal", "mktsegment")
      .subsetOf(fieldNames(cust).toSet))
    // edge relation typed by the observed endpoints: Customer.out_PLACED
    // → [Order]; the reverse hop lives on Order, not Customer
    val hop = (cust \ "fields").children
      .find(f => f \ "name" == JString("out_PLACED")).getOrElse(fail("no out_PLACED"))
    assert(hop \ "type" \ "kind" == JString("LIST"))
    assert(hop \ "type" \ "ofType" \ "name" == JString("Order"))
    assert(!fieldNames(cust).contains("in_PLACED"))
    assert(fieldNames(typeNamed("Order")).contains("in_PLACED"))
    // an edge with NO endpoint record hops everywhere, typed _Vertex
    val anyHop = (cust \ "fields").children
      .find(f => f \ "name" == JString("out_CONTAINS")).getOrElse(fail("no out_CONTAINS"))
    assert(anyHop \ "type" \ "ofType" \ "name" == JString("_Vertex"))
    // the Query root serves one field per vertex label, args = the
    // label's properties + orderBy/limit
    val qf = (typeNamed("Query") \ "fields").children
      .find(f => f \ "name" == JString("Customer")).getOrElse(fail("no Query.Customer"))
    val argNames = (qf \ "args").children.map(a => a \ "name")
      .collect { case JString(s) => s }
    assert(argNames.toSet == Set("name", "acctbal", "mktsegment", "orderBy", "limit"))
    // the mutation surface and its input shapes introspect too
    assert(Set("createCustomer", "updateCustomer", "deleteCustomer", "createPLACED")
      .subsetOf(fieldNames(typeNamed("Mutation")).toSet))
    val in = typeNamed("PLACEDInput")
    assert(in \ "kind" == JString("INPUT_OBJECT"))
    val inFields = (in \ "inputFields").children.map(f => f \ "name")
      .collect { case JString(s) => s }
    assert(Set("from", "to").subsetOf(inFields.toSet))
    // Long scalar: 64-bit ids must not masquerade as GraphQL Int
    assert((typeNamed("_Vertex") \ "fields").children
      .find(f => f \ "name" == JString("id"))
      .exists(f => f \ "type" \ "name" == JString("Long")))
    // __type probe: one named type; unknown name → null, not an error
    val t = JsonMethods.parse(GraphQl.introspect(gs,
      """{ __type(name: "Part") { name } }""", eps.get(_)))
    assert(t \ "data" \ "__type" \ "name" == JString("Part"))
    assert(t \ "data" \ "__type" \ "kind" == JString("OBJECT"))
    val missing = JsonMethods.parse(GraphQl.introspect(gs,
      """{ __type(name: "Nope") { name } }""", eps.get(_)))
    assert(missing \ "data" \ "__type" == JNull)
    // detection: introspection sniffs, data queries do not
    assert(GraphQl.isIntrospection("query { __schema { types { name } } }"))
    assert(GraphQl.isIntrospection("""{ __type(name: "Part") { name } }"""))
    assert(!GraphQl.isIntrospection("{ Customer { name } }"))
  }

  test("__typename is a data meta-field, never misrouted to introspection") {
    // Apollo-family clients add __typename to EVERY selection set: the
    // sniff must not substring-match it into the introspection path
    // (r12 review #1), and the data path must serve it as the
    // binding's concrete label
    val doc = """{ Customer(mktsegment: "BUILDING") {
                 __typename name orders: out_PLACED { __typename status } } }"""
    assert(!GraphQl.isIntrospection(doc))
    val df = GraphQl.compile(g, doc)
    assert(df.columns.toSeq ==
      Seq("__typename", "name", "orders___typename", "orders_status"))
    val r = df.head
    assert(r.getString(0) == "Customer")
    assert(r.getString(2) == "Order")
    // aliased form works like any field alias
    val aliased = GraphQl.compile(g, "{ Region { t: __typename name } }")
    assert(aliased.columns.toSeq == Seq("t", "name"))
    assert(aliased.select("t").distinct().head.getString(0) == "Region")
  }

  test("fragments: named spreads and inline fragments splice into the selection") {
    // a named fragment defined AFTER its use (the codegen norm), on
    // the matching type — identical to writing the fields inline
    val withFrag = GraphQl.compile(g,
      """query Q { Customer(mktsegment: "BUILDING") { ...custBits } }
         fragment custBits on Customer { name acctbal }""")
    val inline = GraphQl.compile(g,
      """{ Customer(mktsegment: "BUILDING") { name acctbal } }""")
    assert(withFrag.columns.toSeq == Seq("name", "acctbal"))
    assert(withFrag.exceptAll(inline).count() == 0)
    assert(inline.exceptAll(withFrag).count() == 0)

    // fragments compose through hops and nest (fragment using a fragment)
    val nested = GraphQl.compile(g,
      """fragment orderBits on Order { totalprice }
         fragment custDeep on Customer { name orders: out_PLACED { ...orderBits } }
         { Customer(mktsegment: "BUILDING") { ...custDeep } }""")
    assert(nested.columns.toSeq == Seq("name", "orders_totalprice"))
    assert(nested.count() > 0)

    // an inline fragment whose condition does NOT match masks its
    // scalars to null instead of failing the query
    val masked = GraphQl.compile(g,
      """{ Region { name ... on Nation { regionkey: name } } }""")
    assert(masked.columns.toSeq == Seq("name", "regionkey"))
    assert(masked.filter(col("regionkey").isNotNull).count() == 0)
    // …and a MATCHING condition is transparent
    val matching = GraphQl.compile(g,
      """{ Region { ... on Region { name } } }""")
    assert(matching.select("name").distinct().count() == 5)

    // fail-closed: unknown fragment, cycle, duplicate definition
    intercept[IllegalArgumentException](GraphQl.compile(g, "{ Region { ...nope } }"))
    intercept[IllegalArgumentException](GraphQl.compile(g,
      """{ Region { ...a } } fragment a on Region { ...b }
         fragment b on Region { ...a }"""))
    intercept[IllegalArgumentException](GraphQl.compile(g,
      """{ Region { ...a } } fragment a on Region { name }
         fragment a on Region { name }"""))
  }

  test("variables: declarations, defaults, and the stock calling convention") {
    val q = """query Custs($seg: String!, $lim: Int = 3) {
                 Customer(mktsegment: $seg, orderBy: "acctbal desc", limit: $lim) {
                   name acctbal } }"""
    val df = GraphQl.compile(g, q, Map("seg" -> "BUILDING"))
    val inline = GraphQl.compile(g,
      """{ Customer(mktsegment: "BUILDING", orderBy: "acctbal desc", limit: 3) {
           name acctbal } }""")
    assert(df.collect().toSeq == inline.collect().toSeq) // default limit used
    // provided value overrides the default
    assert(GraphQl.compile(g, q,
      Map("seg" -> "BUILDING", "lim" -> 1L)).count() == 1)
    // numeric + list-typed declarations parse; variables thread into
    // hop argument position too
    val hop = GraphQl.compile(g,
      """query($n: String) { Region { name nations: in_IN_REGION(name: $n) { name } } }""",
      Map("n" -> "NATION_7"))
    assert(hop.count() == 1)
    // fail-closed: undeclared reference, declared-but-unbound without
    // a default, duplicate declaration
    intercept[IllegalArgumentException](GraphQl.compile(g,
      "{ Region(name: $x) { name } }"))
    intercept[IllegalArgumentException](GraphQl.compile(g,
      "query($x: String) { Region(name: $x) { name } }"))
    intercept[IllegalArgumentException](GraphQl.compile(g,
      "query($x: String, $x: String) { Region(name: $x) { name } }",
      Map("x" -> "R")))
    // @skip/@include execution directives — static with variables
    // resolved at parse time; they compose, apply to spreads too, and
    // unknown directives fail closed
    val dir = GraphQl.compile(g,
      """query($all: Boolean!) { Region {
           name
           skipped: name @skip(if: $all)
           kept: name @include(if: $all) @skip(if: false) } }""",
      Map("all" -> true))
    assert(dir.columns.toSeq == Seq("name", "kept"))
    val dirSpread = GraphQl.compile(g,
      """{ Region { name ...extra @skip(if: true) } }
         fragment extra on Region { dropped: name }""")
    assert(dirSpread.columns.toSeq == Seq("name"))
    intercept[IllegalArgumentException](GraphQl.compile(g,
      "{ Region { name @deprecated } }"))
    intercept[IllegalArgumentException](GraphQl.compile(g,
      "{ Region { name @skip(if: 3) } }"))

    // mutations take variables through the same convention (objects too)
    val dml = GraphQl.mutationToDml(
      """mutation($id: Long!, $w: CustomerInput!) {
           createCustomer(id: $id, name: "V")
           updateCustomer(where: $w, set: {name: "W"}) }""",
      Map("id" -> 77L, "w" -> Map("name" -> "V")))
    assert(dml == Seq(
      "CREATE VERTEX Customer SET id = 77, name = 'V'",
      "UPDATE Customer SET name = 'W' WHERE name = 'V'"))
  }
}
