package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Write-time JSON attribute flattening (H6 storage side) — the Spark shape
  * of the reference's JSON column convention: host JSON is split into
  * per-field SIBLING COLUMNS that carry the parent's name
  * (`m_sJsonParentName`, secondary/blockreader.h:96) and get the same
  * storage treatment as any scalar attribute — zone maps, secondary
  * indexes, hash companions (secondary/secondary.cpp:426-433 resolves
  * `parent.field` lookups against those siblings).
  *
  * Query-time `from_json` (q_json_filter/q_json_agg) re-parses the document
  * for every predicate evaluation — fine for one-off queries, wrong for a
  * field that is filtered constantly at 100 TB. The flatten convention
  * bills the parse ONCE to the writer: each declared field becomes a typed
  * top-level column `<jsonCol>_<field>`, the table is range-clustered by
  * the hot field (file/row-group pruning), and the per-field secondary
  * index / hash companion builders apply unchanged because the sibling is
  * an ordinary column.
  *
  * The original JSON column is kept (the reference keeps the host blob
  * too) — rarely-queried fields still resolve through `from_json`.
  */
object JsonFlatten {

  /** Sibling-column naming convention (ref m_sJsonParentName: the child
    * carries the parent's name — `props.k` is stored as `props_k`). */
  def flatColName(jsonCol: String, field: String): String =
    s"${jsonCol}_$field"

  /** Flatten `jsonCol` into one typed sibling column per field of
    * `schema`, with a SINGLE schema'd parse per row (N `get_json_object`
    * calls would re-tokenize the document N times). Malformed documents
    * yield NULL siblings — the same contract as query-time `from_json`. */
  def flatten(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    val parsedCol = s"__${jsonCol}_parsed"
    // ONE select emitting every sibling (review r18-8): a per-field
    // withColumn fold stacks one Project per field, and analysis cost
    // over the growing plan is O(fields^2) for wide JSON schemas
    val parsed = df.withColumn(parsedCol, from_json(col(jsonCol), schema))
    // The old withColumn fold REPLACED a pre-existing column of the same
    // name; a bare select would emit it twice (ambiguous downstream), so
    // drop colliding originals first to keep the replace contract
    val flatNames = schema.fields.map(f => flatColName(jsonCol, f.name)).toSet
    val kept = df.columns.filterNot(flatNames.contains)
    parsed.select(kept.map(col) ++ schema.fields.map(f =>
      col(parsedCol).getField(f.name).as(flatColName(jsonCol, f.name))): _*)
  }

  /** Convenience: single-field flatten from a (name, type) pair. */
  def flatten(df: DataFrame, jsonCol: String,
              field: String, dt: DataType): DataFrame =
    flatten(df, jsonCol, new StructType().add(field, dt))
}
