package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.{GraphSchema, IndexDesc, LabelSchema}

/** Builds the labeled property graph (SURVEY §1.1) from the relational
  * testdata — the Spark-native equivalent of the reference's bulk load
  * (`ArcadeDBService.java:124-139`: open workspace graph → declare
  * schema → insert nodes → resolve + insert edges → build indexes).
  *
  * Layout follows FIXTURES.md §2: `nodes(id, label, props…)`,
  * `edges(src, dst, label, props…)`. Source `long` ids are kept as join
  * keys (no RID indirection — SURVEY §1.5); label keyspaces are made
  * disjoint with fixed offsets.
  *
  * 100 TB posture: everything here is a narrow projection over the
  * columnar source (no shuffles in node construction); the only wide
  * operations are the edge endpoint-resolution joins (A13), which
  * Catalyst plans as broadcast joins for dimension-sized sides and
  * shuffle joins above `autoBroadcastJoinThreshold`. Persisted form is
  * parquet partitioned by `label` so every per-label operator gets
  * partition pruning instead of a filter scan.
  */
object GraphLoader {

  // Disjoint id keyspaces. The fixed offsets hold only while every
  // source key stays below the next offset (c_custkey = 150k×sf crosses
  // SupplierOff at sf≈6.7!) — so the load path ASSERTS disjointness
  // (assertDisjointIds) and fails loudly instead of silently resolving
  // edges to wrong nodes. At 100 TB the scheme flips to label bits in
  // the high bits of the long id, which can never collide.
  val RegionOff = 0L
  val NationOff = 100L
  val CustomerOff = 1000000L
  val SupplierOff = 2000000L
  val PartOff = 3000000L
  val OrderOff = 10000000L

  /** Keyspace guard: max(source key) + offset must stay strictly below
    * the next label's offset. One single-column `max()` per table (a
    * full column scan by default; enable
    * `spark.sql.parquet.aggregatePushDown` to make it footer-stats-only). */
  def assertDisjointIds(spark: SparkSession, dir: String): Unit = {
    val ranges = Seq(
      ("region", "r_regionkey", RegionOff, NationOff),
      ("nation", "n_nationkey", NationOff, CustomerOff),
      ("customer", "c_custkey", CustomerOff, SupplierOff),
      ("supplier", "s_suppkey", SupplierOff, PartOff),
      ("part", "p_partkey", PartOff, OrderOff),
      ("orders", "o_orderkey", OrderOff, Long.MaxValue))
    ranges.foreach { case (tbl, key, off, next) =>
      val row = table(spark, dir, tbl)
        .agg(max(col(key).cast(LongType))).head
      if (!row.isNullAt(0)) { // empty table ⇒ no keys ⇒ trivially disjoint
        val mx = row.getLong(0)
        require(mx + off < next,
          s"node-id keyspace overflow: $tbl.$key max $mx + offset $off >= next offset $next " +
            "— switch to label-bits-in-high-bits ids for this scale")
      }
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** All node sets, unioned by name with per-label sparse columns —
    * mirrors the reference's per-label insert loops
    * (`ArcadeDBService.java:141-164`) as one declarative plan. */
  def nodes(spark: SparkSession, dir: String): DataFrame = {
    val region = table(spark, dir, "region").select(
      (col("r_regionkey").cast(LongType) + RegionOff).as("id"),
      lit("Region").as("label"),
      col("r_name").as("name"))
    val nation = table(spark, dir, "nation").select(
      (col("n_nationkey").cast(LongType) + NationOff).as("id"),
      lit("Nation").as("label"),
      col("n_name").as("name"))
    val customer = table(spark, dir, "customer").select(
      (col("c_custkey").cast(LongType) + CustomerOff).as("id"),
      lit("Customer").as("label"),
      col("c_name").as("name"),
      col("c_acctbal").as("acctbal"),
      col("c_mktsegment").as("mktsegment"))
    val supplier = table(spark, dir, "supplier").select(
      (col("s_suppkey").cast(LongType) + SupplierOff).as("id"),
      lit("Supplier").as("label"),
      col("s_name").as("name"),
      col("s_acctbal").as("acctbal"))
    // tags = split(p_name) exercises typed arrays (A9 / FIXTURES §2)
    val part = table(spark, dir, "part").select(
      (col("p_partkey").cast(LongType) + PartOff).as("id"),
      lit("Part").as("label"),
      col("p_name").as("name"),
      col("p_brand").as("brand"),
      col("p_type").as("ptype"),
      col("p_size").as("psize"),
      col("p_retailprice").as("retailprice"),
      split(col("p_name"), " ").as("tags"))
    // orderdate as ISO string mirrors the reference's string-typed dates
    // (SURVEY §1.2: dates in BioDWH2 sources arrive as strings)
    val order = table(spark, dir, "orders").select(
      (col("o_orderkey").cast(LongType) + OrderOff).as("id"),
      lit("Order").as("label"),
      col("o_orderstatus").as("status"),
      col("o_totalprice").as("totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
      col("o_orderpriority").as("priority"))
    Seq(region, nation, customer, supplier, part, order)
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** All edge sets (FK relationships → graph edges, FIXTURES §2).
    * lineitem becomes the `CONTAINS` edge properties. */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    val inRegion = table(spark, dir, "nation").select(
      (col("n_nationkey").cast(LongType) + NationOff).as("src"),
      (col("n_regionkey").cast(LongType) + RegionOff).as("dst"),
      lit("IN_REGION").as("label"))
    val custInNation = table(spark, dir, "customer").select(
      (col("c_custkey").cast(LongType) + CustomerOff).as("src"),
      (col("c_nationkey").cast(LongType) + NationOff).as("dst"),
      lit("IN_NATION").as("label"))
    val suppInNation = table(spark, dir, "supplier").select(
      (col("s_suppkey").cast(LongType) + SupplierOff).as("src"),
      (col("s_nationkey").cast(LongType) + NationOff).as("dst"),
      lit("IN_NATION").as("label"))
    val placed = table(spark, dir, "orders").select(
      (col("o_custkey").cast(LongType) + CustomerOff).as("src"),
      (col("o_orderkey").cast(LongType) + OrderOff).as("dst"),
      lit("PLACED").as("label"))
    val li = table(spark, dir, "lineitem")
    val contains = li.select(
      (col("l_orderkey").cast(LongType) + OrderOff).as("src"),
      (col("l_partkey").cast(LongType) + PartOff).as("dst"),
      lit("CONTAINS").as("label"),
      col("l_linenumber").as("linenumber"),
      col("l_quantity").as("quantity"),
      col("l_extendedprice").as("extendedprice"),
      col("l_discount").as("discount"),
      col("l_tax").as("tax"),
      col("l_returnflag").as("returnflag"),
      date_format(col("l_shipdate"), "yyyy-MM-dd").as("shipdate"))
    val suppliedBy = li.select(
      (col("l_partkey").cast(LongType) + PartOff).as("src"),
      (col("l_suppkey").cast(LongType) + SupplierOff).as("dst"),
      lit("SUPPLIED_BY").as("label"),
      col("l_quantity").as("quantity"))
    Seq(inRegion, custInNation, suppInNation, placed, contains, suppliedBy)
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** The declared schema registry + index descriptions (FIXTURES §2),
    * read "without scanning rows" like `ArcadeDBService.java:150-151`. */
  def schema: GraphSchema = {
    def st(fields: (String, DataType)*) =
      StructType(fields.map { case (n, t) => StructField(n, t) })
    GraphSchema(
      labels = Seq(
        LabelSchema("Region", "vertex", st("name" -> StringType)),
        LabelSchema("Nation", "vertex", st("name" -> StringType)),
        LabelSchema("Customer", "vertex",
          st("name" -> StringType, "acctbal" -> DoubleType, "mktsegment" -> StringType)),
        LabelSchema("Supplier", "vertex",
          st("name" -> StringType, "acctbal" -> DoubleType)),
        LabelSchema("Part", "vertex",
          st("name" -> StringType, "brand" -> StringType, "ptype" -> StringType,
            "psize" -> IntegerType, "retailprice" -> DoubleType,
            "tags" -> ArrayType(StringType, containsNull = false))),
        LabelSchema("Order", "vertex",
          st("status" -> StringType, "totalprice" -> DoubleType,
            "orderdate" -> StringType, "priority" -> StringType)),
        LabelSchema("IN_REGION", "edge", st()),
        LabelSchema("IN_NATION", "edge", st()),
        LabelSchema("PLACED", "edge", st()),
        LabelSchema("CONTAINS", "edge",
          st("linenumber" -> IntegerType, "quantity" -> DoubleType,
            "extendedprice" -> DoubleType, "discount" -> DoubleType,
            "tax" -> DoubleType, "returnflag" -> StringType, "shipdate" -> StringType)),
        LabelSchema("SUPPLIED_BY", "edge", st("quantity" -> DoubleType))
      ),
      indexes = Seq(
        IndexDesc("node", "Customer", "name", unique = true, isArray = false),
        IndexDesc("node", "Part", "brand", unique = false, isArray = false),
        IndexDesc("node", "Part", "tags", unique = true, isArray = true), // skipped (A15)
        IndexDesc("edge", "CONTAINS", "linenumber", unique = false, isArray = false)
      )
    )
  }

  /** A13 — edge-endpoint resolution, the shim's one true join
    * (`ArcadeDBService.java:131,161,241-244`: id→RID HashMap probe per
    * endpoint). Spark-native form: two equi-joins against the node id
    * set. Inner joins drop dangling edges; the returned `dangling` frame
    * is the integrity side-channel (the reference would NPE at `:241`).
    *
    * Scale: `ids` is just (id) — at 100 TB this is a shuffle join on the
    * id key, and Catalyst/AQE picks broadcast automatically when the node
    * side fits. No driver-side map (SURVEY §7: A12 stays a join). */
  def resolveEdges(nodes: DataFrame, edges: DataFrame): (DataFrame, DataFrame) = {
    val ids = nodes.select(col("id"))
    val fromOk = edges.join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
    val resolved = fromOk.join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
    val dangling = edges
      .join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .unionByName(fromOk.join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti"))
    (resolved, dangling)
  }

  /** A15 — UNIQUE index validation. No physical index exists in Spark;
    * UNIQUE becomes the invariant "no property value occurs twice",
    * checked with a groupBy — nulls are ignored exactly like the
    * reference's `NULL_STRATEGY.SKIP` (`ArcadeDBService.java:277`), and
    * array properties are skipped (`:263-269`). Returns violations:
    * (label, property, value, cnt). */
  def validateUnique(nodes: DataFrame, edges: DataFrame, gs: GraphSchema): DataFrame = {
    val frames = gs.indexes.filter(i => i.unique && i.isBuildable)
      .filter { i =>
        // a declared property no stored row carries yet has no values:
        // all-null ⇒ NULL_STRATEGY.SKIP ⇒ trivially valid (runtime DDL
        // declares columns before the first file contains them)
        (if (i.target == "node") nodes else edges).columns.contains(i.property)
      }.map { i =>
      val df = if (i.target == "node") nodes else edges
      df.filter(col("label") === i.label)
        .filter(col(i.property).isNotNull) // NULL_STRATEGY.SKIP
        .groupBy(col(i.property).cast(StringType).as("value"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .select(lit(i.label).as("label"), lit(i.property).as("property"),
          col("value"), col("cnt"))
    }
    frames.reduceOption(_.unionByName(_)).getOrElse {
      nodes.sparkSession.createDataFrame(
        nodes.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("label", StringType), StructField("property", StringType),
          StructField("value", StringType), StructField("cnt", LongType))))
    }
  }

  /** DML append sinks (SURVEY §2.B.1 DML row): the reference's HTTP API
    * accepts record inserts (`INSERT INTO` / `CREATE VERTEX/EDGE`); the
    * Spark-native parity is a validated batch append onto the persisted
    * store. Invariants enforced BEFORE any bytes land (an invalid batch
    * leaves the store untouched):
    *  - new node ids must not collide with existing ids (one semi-join);
    *  - UNIQUE indexes must still hold over existing ∪ batch (A15
    *    re-validation, null-skip/array-skip semantics unchanged);
    *  - new edges must resolve both endpoints against existing ∪ batch
    *    nodes (A13); dangling edges are rejected, not dropped silently.
    * Columns are aligned to the store schema (missing → typed nulls) so
    * appended footers agree with existing ones. Scale: append cost is
    * O(batch) + the validation joins — no rewrite of existing data
    * (partition dirs receive new files only).
    */
  /** Spark's partition-dir escaping percent-encodes specials but
    * leaves '+' literal — URLDecoder would corrupt it to a space, so
    * only %XX escapes are decoded here. */
  private def decodePartitionName(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  /** Land one validated batch: every label's rows become a NEW segment
    * directory, made visible by one atomic manifest commit per label —
    * appends get the same all-or-nothing durability as rewrites (a
    * crash leaves only invisible orphan directories, and a concurrent
    * reader never sees a partial batch). */
  private def appendBatch(spark: SparkSession, outDir: String, entity: String,
      batch: DataFrame): Unit = {
    var m = Store.readManifest(outDir)
    val labels = batch.select("label").distinct().collect().map(_.getString(0))
    // only declared labels of the right kind may land (A5: the store
    // schema is a registry, not whatever a batch claims)
    val gs = GraphSchema.fromJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/schema.json")))
    val kind = if (entity == "nodes") "vertex" else "edge"
    val declared = gs.labels.filter(_.kind == kind).map(_.label).toSet
    val unknown = labels.filterNot(declared)
    require(unknown.isEmpty,
      s"append rejected: undeclared $kind label(s) ${unknown.mkString(", ")} — " +
        "CREATE " + kind.toUpperCase + " TYPE first")
    labels.foreach { label =>
      val rows = batch.filter(col("label") === label).drop("label")
      val gen = Store.writeGen(outDir, entity, label, m.seq + 1, rows)
      m = m.withSegment(entity, label, gen)
      Store.writeManifest(outDir, m)
    }
  }

  def appendNodes(spark: SparkSession, outDir: String, newNodes: DataFrame): Unit =
      StoreLock.withWriteLock(outDir) {
    val existing = Store.readEntity(spark, outDir, "nodes")
    val gs = GraphSchema.fromJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/schema.json")))
    val batch = alignTo(newNodes, widened(existing, gs, "vertex"))
    val dupIds = batch.join(existing.select("id"), Seq("id"), "left_semi")
    require(dupIds.isEmpty, {
      val sample = dupIds.select("id").limit(5).collect().map(_.getLong(0)).mkString(", ")
      s"append rejected: node ids already exist (e.g. $sample)"
    })
    val dupInBatch = batch.groupBy("id").count().filter(col("count") > 1)
    require(dupInBatch.isEmpty, {
      val sample = dupInBatch.select("id").limit(5).collect().map(_.getLong(0)).mkString(", ")
      s"append rejected: duplicate ids within the batch (e.g. $sample)"
    })
    val viol = validateUnique(
      existing.unionByName(batch, allowMissingColumns = true),
      Store.readEntity(spark, outDir, "edges"), gs)
    require(viol.isEmpty, {
      val sample = viol.limit(5).collect()
        .map(r => s"${r.getString(0)}.${r.getString(1)}=${r.getString(2)}").mkString(", ")
      s"append rejected: UNIQUE violation(s): $sample"
    })
    appendBatch(spark, outDir, "nodes", batch)
  }

  def appendEdges(spark: SparkSession, outDir: String, newEdges: DataFrame): Unit =
      StoreLock.withWriteLock(outDir) {
    val nodes = Store.readEntity(spark, outDir, "nodes")
    val existing = Store.readEntity(spark, outDir, "edges")
    val gs = GraphSchema.fromJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/schema.json")))
    val batch = alignTo(newEdges, widened(existing, gs, "edge"))
    // ONE pass does endpoint resolution AND endpoint-label observation
    // (the DELETE probe's pruning metadata): left joins carry the node
    // labels, a null label = a dangling endpoint
    val nl = nodes.select(col("id"), col("label").as("__nl"))
    val joined = batch
      .join(nl.withColumnRenamed("id", "src").withColumnRenamed("__nl", "__sl"),
        Seq("src"), "left")
      .join(nl.withColumnRenamed("id", "dst").withColumnRenamed("__nl", "__dl"),
        Seq("dst"), "left")
      .localCheckpoint(true) // consumed 3×: dangling check, obs, rows
    val dangling = joined.filter(col("__sl").isNull || col("__dl").isNull)
    require(dangling.isEmpty, {
      val sample = dangling.select("src", "dst").limit(5).collect()
        .map(r => s"(${r.getLong(0)}→${r.getLong(1)})").mkString(", ")
      s"append rejected: dangling edge endpoint(s): $sample"
    })
    val obs = joined.select(col("label"), col("__sl"), col("__dl")).distinct().collect()
      .groupBy(_.getString(0))
      .map { case (l, rows) =>
        l -> ((rows.map(_.getString(1)).toSet, rows.map(_.getString(2)).toSet))
      }
    appendBatch(spark, outDir, "edges",
      joined.drop("__sl", "__dl").select(batch.columns.map(col).toIndexedSeq: _*))
    val m = Store.readManifest(outDir)
    val merged = (m.edgeEndpoints.keySet ++ obs.keySet).map { l =>
      val (s1, d1) = m.edgeEndpoints.getOrElse(l, (Set.empty[String], Set.empty[String]))
      val (s2, d2) = obs.getOrElse(l, (Set.empty[String], Set.empty[String]))
      l -> ((s1 ++ s2, d1 ++ d2))
    }.toMap
    if (merged != m.edgeEndpoints)
      Store.writeManifest(outDir, m.copy(edgeEndpoints = merged))
  }

  /** UPDATE <Label> SET … WHERE <pred> — copy-on-write rewrite of ONE
    * label partition (the reference's HTTP command surface accepts
    * updates [dep arcadedb-server, `src/pom.xml:104-108`]). Invariants:
    * key/topology columns (`id`, `src`, `dst`, `label`) are immutable;
    * UNIQUE indexes on the label are revalidated over the rewritten
    * partition BEFORE the store is touched. 100 TB posture: only the
    * target label's files are read and rewritten (partition pruning at
    * the directory level); the swap is a metadata-level rename, and the
    * predicate/SET application is one map-only pass — no shuffle.
    * Returns the number of updated records. */
  def updateRecords(spark: SparkSession, outDir: String, label: String, kind: String,
      sets: Map[String, Any], pred: org.apache.spark.sql.Column): Long =
    updateColumns(spark, outDir, label, kind,
      sets.map { case (k, v) => k -> lit(v) }, pred)

  /** Column-valued UPDATE: SET values are arbitrary expressions over
    * the label partition's own row (the dialect's `SET x = x + 1`),
    * literals being the trivial case above. */
  def updateColumns(spark: SparkSession, outDir: String, label: String, kind: String,
      sets: Map[String, org.apache.spark.sql.Column],
      pred: org.apache.spark.sql.Column): Long =
      StoreLock.withWriteLock(outDir) {
    require(sets.nonEmpty, "UPDATE needs a SET clause")
    val immutable = Set("id", "src", "dst", "label")
    val bad = sets.keySet.intersect(immutable)
    require(bad.isEmpty,
      s"UPDATE rejected: ${bad.mkString(", ")} are immutable (keys/topology)")
    rewriteLabelPartition(spark, outDir, kind, label) { part =>
      val unknown = sets.keySet -- part.columns.toSet
      require(unknown.isEmpty, s"UPDATE rejected: unknown column(s) ${unknown.mkString(", ")}")
      val affected = part.filter(pred).count()
      val updated = part.select(part.schema.fields.toSeq.map { f =>
        sets.get(f.name) match {
          case Some(v) => when(pred, v.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
      // A15 re-validation scoped to this label's UNIQUE indexes
      val gs = GraphSchema.fromJson(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$outDir/schema.json")))
      val target = if (kind == "vertex") "node" else "edge"
      gs.indexes.filter(ix => ix.unique && ix.isBuildable &&
          ix.label == label && ix.target == target).foreach { ix =>
        val dup = updated.filter(col(ix.property).isNotNull)
          .groupBy(col(ix.property)).count().filter(col("count") > 1)
        require(dup.isEmpty, {
          val sample = dup.limit(3).collect().map(_.get(0)).mkString(", ")
          s"UPDATE rejected: UNIQUE($label.${ix.property}) violated (e.g. $sample)"
        })
      }
      (updated, affected)
    }
  }

  /** DELETE FROM <Label> [WHERE <pred>] — copy-on-write rewrite without
    * the matching rows. Deleting vertices whose ids are still referenced
    * by ANY edge is rejected (the A13 integrity mirror: the store never
    * holds a dangling endpoint) — delete the edges first. Returns the
    * number of deleted records. */
  def deleteRecords(spark: SparkSession, outDir: String, label: String, kind: String,
      pred: Option[org.apache.spark.sql.Column]): Long =
      StoreLock.withWriteLock(outDir) {
    // NULL-predicate rows are KEPT (SQL three-valued semantics): a bare
    // `!pred` filter would silently drop them alongside the matches
    val p = coalesce(pred.getOrElse(lit(true)), lit(false))
    rewriteLabelPartition(spark, outDir, kind, label) { part =>
      val affected = part.filter(p).count()
      if (affected > 0 && kind == "vertex") {
        val deletedIds = part.filter(p).select(col("id"))
        // probe ONLY the edge labels whose observed endpoint labels can
        // reference this vertex label (manifest metadata) — at 100 TB a
        // single-row delete must not pay a full edge-store scan
        // (VERDICT r5 order #7)
        val m = Store.readManifest(outDir)
        val frames = edgeLabelsReferencing(outDir, label).flatMap { el =>
          Store.readLabel(spark, outDir, "edges", el, m)
            .map(_.select(col("src"), col("dst")))
        }
        frames.reduceOption(_.unionByName(_)).foreach { edges =>
          val referencing = edges
            .join(deletedIds.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
            .unionByName(edges
              .join(deletedIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi"))
          require(referencing.isEmpty, {
            val sample = referencing.select("src", "dst").limit(5).collect()
              .map(r => s"(${r.getLong(0)}→${r.getLong(1)})").mkString(", ")
            s"DELETE rejected: edges still reference deleted node(s): $sample — delete them first"
          })
        }
      }
      (part.filter(!p), affected)
    }
  }

  /** Copy-on-write rewrite of one label partition: `f` maps the
    * current generation's frame (label column elided — it lives in the
    * manifest) to (rewritten frame, affected count). Zero affected →
    * the store is untouched. The rewritten frame lands as a NEW
    * generation directory, invisible until the atomic manifest commit
    * ([[Store]] scaladoc); the superseded generation stays on disk for
    * in-flight readers until [[Store.sweep]] finds it unpinned. A
    * crash at any point leaves either the old manifest (orphan gen
    * dir, swept later) or the new one (complete by construction) —
    * there is no torn state to recover. */
  private def rewriteLabelPartition(spark: SparkSession, outDir: String, kind: String,
      label: String)(f: DataFrame => (DataFrame, Long)): Long = {
    val entity = if (kind == "vertex") "nodes" else "edges"
    val m = Store.readManifest(outDir)
    val segs = Store.readLabel(spark, outDir, entity, label, m) match {
      case Some(df) => df
      case None => return 0L // declared label, no rows yet
    }
    // widen with DECLARED properties no stored segment carries yet —
    // runtime DDL makes a column UPDATEable (and rewritable) before the
    // first file contains it
    val gs = GraphSchema.fromJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/schema.json")))
    val have = segs.columns.toSet
    val part = gs.labels.find(l => l.label == label).toSeq
      .flatMap(_.schema.fields).filterNot(f0 => have(f0.name))
      .foldLeft(segs)((df, f0) => df.withColumn(f0.name, lit(null).cast(f0.dataType)))
    val (rewritten, affected) = f(part)
    if (affected == 0) return 0L
    val gen = Store.writeGen(outDir, entity, label, m.seq + 1, rewritten)
    Store.writeManifest(outDir, m.withGen(entity, label, gen))
    affected
  }

  /** The edge labels whose observed endpoints can reference vertex
    * label `label` — the DELETE probe's pruning set. An edge label
    * with no endpoint metadata is conservatively included. */
  def edgeLabelsReferencing(outDir: String, label: String): Seq[String] = {
    val m = Store.readManifest(outDir)
    m.edges.keys.filter { el =>
      m.edgeEndpoints.get(el) match {
        case Some((srcs, dsts)) => srcs.contains(label) || dsts.contains(label)
        case None => true
      }
    }.toSeq.sorted
  }

  /** A16 maintenance — compact the store in place. Every single-row
    * HTTP append lands one small parquet file in its label partition;
    * N commands = N files, and every later reader pays N footer reads.
    * Compaction rewrites any label partition holding more than
    * `maxFilesPerLabel` files down to max(1, ceil(bytes/targetBytes))
    * files via the same staged-swap protocol as UPDATE/DELETE — a
    * maintenance pass over ONLY the fragmented partitions, never a full
    * store rebuild. Returns the number of partitions rewritten.
    * (128 MB default target matches the scan split size, so a compacted
    * partition reads at one task per file at cluster scale.) */
  def compactStore(spark: SparkSession, outDir: String,
      maxFilesPerLabel: Int = 4, targetBytes: Long = 128L << 20): Int =
      StoreLock.withWriteLock(outDir) {
    import scala.jdk.CollectionConverters._
    def parquetFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet")).toList
      finally s.close()
    }
    val m = Store.readManifest(outDir)
    var rewritten = 0
    Seq("nodes" -> "vertex", "edges" -> "edge").foreach { case (entity, kind) =>
      m.gens(entity).toSeq.sortBy(_._1).foreach { case (label, segs) =>
        val files = segs.flatMap(g => parquetFiles(Store.genDir(outDir, entity, label, g)))
        val bytes = files.map(java.nio.file.Files.size).sum
        val target = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        if (files.size > math.max(target, maxFilesPerLabel)) {
          rewriteLabelPartition(spark, outDir, kind, label)(part =>
            (part.coalesce(target), files.size.toLong))
          rewritten += 1
        }
      }
    }
    // compaction doubles as store GC: superseded generations beyond a
    // one-generation grace window go now (pins still respected)
    Store.sweep(outDir, keepPerLabel = 1)
    rewritten
  }

  /** Refresh the bucketed co-location layout FROM the persisted store
    * (post-DML: the store is the truth, not the source tables) — the
    * id-keyed joins stay exchange-free afterwards exactly like
    * [[writeBucketedTables]]. */
  def writeBucketedTablesFromStore(spark: SparkSession, outDir: String, nBuckets: Int,
      prefix: String = "graft_store"): Unit = {
    Store.readEntity(spark, outDir, "nodes").write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "id").sortBy("id")
      .saveAsTable(s"${prefix}_nodes_bucketed")
    Store.readEntity(spark, outDir, "edges").write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "src").sortBy("src")
      .saveAsTable(s"${prefix}_edges_bucketed")
  }

  /** The align target for appends: the store's current union schema
    * widened with DECLARED properties no stored row carries yet —
    * runtime DDL (`CREATE PROPERTY`) must make a column insertable
    * before any file contains it. Deterministic order: store columns
    * first, new declared columns sorted by name. */
  private def widened(existing: DataFrame, gs: GraphSchema, kind: String): StructType = {
    val have = existing.columns.toSet
    val extra = gs.labels.filter(_.kind == kind).flatMap(_.schema.fields)
      .filterNot(f => have.contains(f.name))
      .groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name)
    StructType(existing.schema.fields ++ extra)
  }

  /** Attach DECLARED properties missing from a stored union frame as
    * typed nulls — a column added by runtime DDL is readable (as null)
    * before any file carries it. Serve-side twin of [[widened]]. */
  def widenToDeclared(df: DataFrame, gs: GraphSchema, kind: String): DataFrame = {
    val have = df.columns.toSet
    gs.labels.filter(_.kind == kind).flatMap(_.schema.fields)
      .filterNot(f => have(f.name)).groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name)
      .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
  }

  /** Project `df` onto `target`: shared columns cast to the store
    * type, missing columns become typed nulls. Extra columns are an
    * error (the store schema is declared, A5). */
  private def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val extra = df.columns.toSet -- target.fieldNames.toSet
    require(extra.isEmpty, s"append rejected: unknown column(s) ${extra.mkString(", ")}")
    val have = df.columns.toSet
    df.select(target.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** ✚ Bucketed layout (SURVEY §4.2 co-location): nodes bucketed on
    * `id`, edges on `src`, same bucket count — the A13 endpoint-
    * resolution join (and any id-keyed join) then plans WITHOUT an
    * exchange on either side. This is the 100 TB co-location strategy:
    * pay one clustered write, then every traversal join reads bucket-
    * aligned files instead of shuffling the node table per query.
    * (Bucketing needs the table catalog, hence saveAsTable — the
    * partitioned-parquet store of [[writeGraph]] stays the primary
    * layout; this one exists for join-heavy deployments.) */
  def writeBucketedTables(spark: SparkSession, dir: String, nBuckets: Int,
      prefix: String = "graft"): Unit = {
    assertDisjointIds(spark, dir)
    val n = nodes(spark, dir)
    val (resolved, _) = resolveEdges(n, edges(spark, dir))
    n.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "id").sortBy("id")
      .saveAsTable(s"${prefix}_nodes_bucketed")
    resolved.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "src").sortBy("src")
      .saveAsTable(s"${prefix}_edges_bucketed")
  }

  /** A11/A14/A16 — persist the graph: parquet partitioned by label
    * (partition pruning replaces the per-label bucket layout), overwrite
    * mode (the reference deletes and rebuilds, `ArcadeDBService.java:112-122`),
    * schema registry + checksum alongside (A17). */
  def writeGraph(spark: SparkSession, dir: String, outDir: String): Unit =
      StoreLock.withWriteLock(outDir) {
    assertDisjointIds(spark, dir)
    val n = nodes(spark, dir)
    val (resolved, _) = resolveEdges(n, edges(spark, dir))
    // ONE partitioned write per entity into a hidden bulk-staging tree
    // (hidden names are invisible to any concurrent reader), then each
    // label directory is renamed into its generation slot and the
    // manifest commit makes the new store visible atomically
    // (Store scaladoc; drop-and-rebuild parity with
    // `ArcadeDBService.java:112-122`).
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val bulk = java.nio.file.Paths.get(s"$outDir/.bulk_$uuid")
    n.write.mode("overwrite").partitionBy("label").parquet(s"$bulk/nodes")
    resolved.write.mode("overwrite").partitionBy("label").parquet(s"$bulk/edges")
    val prevSeq =
      if (java.nio.file.Files.exists(Store.manifestPath(outDir)))
        Store.readManifest(outDir).seq
      else 0L
    val seq = prevSeq + 1
    def promote(entity: String): Map[String, Seq[String]] = {
      import scala.jdk.CollectionConverters._
      val root = bulk.resolve(entity)
      val s = java.nio.file.Files.list(root)
      val labelDirs = try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("label=")).toList
        finally s.close()
      labelDirs.map { p =>
        val label = decodePartitionName(p.getFileName.toString.stripPrefix("label="))
        val gen = Store.newGenName(seq)
        val dest = Store.genDir(outDir, entity, label, gen)
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.move(p, dest)
        label -> Seq(gen)
      }.toMap
    }
    val nodeGens = promote("nodes")
    val edgeGens = promote("edges")
    // per-edge-label endpoint labels: the vertex-DELETE probe's pruning
    // metadata (one small distinct-aggregate at load time)
    val nodeLabels = n.select(col("id"), col("label").as("__nl"))
    val eps = resolved.select(col("src"), col("dst"), col("label"))
      .join(nodeLabels.withColumnRenamed("id", "src")
        .withColumnRenamed("__nl", "__sl"), Seq("src"))
      .join(nodeLabels.withColumnRenamed("id", "dst")
        .withColumnRenamed("__nl", "__dl"), Seq("dst"))
      .select(col("label"), col("__sl"), col("__dl")).distinct()
      .collect()
      .groupBy(_.getString(0))
      .map { case (l, rows) =>
        l -> ((rows.map(_.getString(1)).toSet, rows.map(_.getString(2)).toSet))
      }
    Store.writeManifest(outDir, Store.Manifest(seq, nodeGens, edgeGens, eps))
    Store.deleteRecursively(bulk)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/schema.json"), schema.toJson)
    Checksum.store(
      java.nio.file.Paths.get(s"$outDir/checksum.txt"),
      Checksum.pseudoHashDir(java.nio.file.Paths.get(dir)))
    Store.sweep(outDir)
    ()
  }
}
