package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Sequence packing for pretraining-data preparation — beyond the
  * reference's own operators (its library stops at storage/index/KNN;
  * SURVEY §"beyond the reference"), this is the step that turns a curated
  * document set into fixed-length training sequences: concatenate the
  * token stream and cut every `budget` tokens (the standard
  * pack-and-chunk used by GPT-style pretraining — documents straddle chunk
  * boundaries rather than leaving padding).
  *
  * The engine computes pack OFFSETS, not token arrays: for each document,
  * where its tokens land in the concatenated stream (`start_tok`) and
  * which chunks it touches (`first_chunk`..`last_chunk`). The downstream
  * tokenizer job can then materialize any chunk independently — each chunk
  * knows exactly which documents overlap it.
  *
  * 100 TB design: one window aggregation partitioned by `shardCol` — the
  * parallelism knob. A global concatenation order would serialize the
  * cumulative sum through one partition; sharding (e.g. `pmod(id, 4096)`)
  * gives independent token streams that pack in parallel, one shuffle
  * total, and deterministic output (the order inside a shard is
  * `orderCol`, a stated contract, not partition luck). Chunk ids are
  * per-shard; (shard, chunk) is the global chunk key.
  */
object Pack {

  /** Pack offsets of each document with `tokensCol > 0` (empty documents
    * contribute nothing to the stream and are dropped, never emitted as
    * zero-width rows).
    *
    * Emits the input columns plus:
    *  - `start_tok`   — exclusive prefix sum of `tokensCol` within the
    *    shard in `orderCol` order (the document's offset in the shard's
    *    concatenated token stream);
    *  - `first_chunk` / `last_chunk` — the budget-`budget` chunk range the
    *    document's tokens span: `start_tok div budget` to
    *    `(start_tok + tokens - 1) div budget`.
    *
    * All arithmetic is exact long math. `orderCol` must be unique within a
    * shard for deterministic output (rowid/doc-id contract).
    */
  def sequenceOffsets(df: DataFrame, tokensCol: String, shardCol: String,
                      orderCol: String, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.filter(col(tokensCol) > 0)
      .withColumn("start_tok",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)).cast("long"))
      .withColumn("first_chunk", expr(s"start_tok div $budget"))
      .withColumn("last_chunk",
        expr(s"(start_tok + `$tokensCol` - 1) div $budget"))
  }

  /** The chunk manifest: one row per (document, chunk) overlap, with the
    * document's token range INSIDE that chunk — the work list a tokenizer
    * job consumes to materialize any chunk independently (fetch the
    * overlapping documents, take each one's `[tok_from, tok_to)` token
    * slice, concatenate in `orderCol` order).
    *
    * Emits [[sequenceOffsets]]'s columns (minus the chunk-span pair) plus
    * `chunk`, `tok_from` (inclusive, chunk-local), `tok_to` (exclusive).
    * Invariant: per (shard, chunk), the `[tok_from, tok_to)` ranges tile
    * `[0, budget)` exactly (the final chunk of a shard may end early).
    * The explode fans out ≤ 1 + tokens/budget rows per document — output
    * size is Θ(chunks), the same scale as the training data itself. */
  def chunkManifest(df: DataFrame, tokensCol: String, shardCol: String,
                    orderCol: String, budget: Long): DataFrame =
    sequenceOffsets(df, tokensCol, shardCol, orderCol, budget)
      .withColumn("chunk",
        explode(sequence(col("first_chunk"), col("last_chunk"))))
      .withColumn("tok_from",
        greatest(col("start_tok") - col("chunk") * lit(budget), lit(0L)))
      .withColumn("tok_to",
        least(col("start_tok") + col(tokensCol) - col("chunk") * lit(budget),
          lit(budget)))
      .drop("first_chunk", "last_chunk")

  /** MATERIALIZE the packed sequences: from a token-ARRAY column, produce
    * one row per (shard, chunk) holding the chunk's actual tokens — the
    * training sequences themselves, not just offsets. Every chunk has
    * exactly `budget` tokens except the final partial chunk of each
    * shard.
    *
    * 100 TB design: the manifest already carries each document's token
    * array through the offsets window (no second join); each manifest row
    * slices its doc-local overlap, and one aggregate keyed by
    * (shard, chunk) flattens the pieces in `orderCol` order. A chunk's
    * pieces are at most `budget` tokens total, so groups are bounded by
    * construction — the shuffle carries each token exactly once. */
  /** @param withDocIds also emit `doc_ids: array<long>` aligned 1:1 with
    *                   `tokens` — the provenance every trainer needs for
    *                   cross-document ATTENTION/LOSS MASKING at chunk
    *                   boundaries (token i of the chunk came from document
    *                   `doc_ids(i)`). Same plan; the id rides the piece
    *                   struct.
    * @param idCol      the column whose value `doc_ids` carries. Defaults
    *                   to `orderCol` — correct ONLY when the order column
    *                   is itself the document id; under the
    *                   [[shuffleShards]] recipe (orderCol = `pos`) pass the
    *                   real id column here, or provenance would silently be
    *                   the shuffled within-shard position. */
  def materializeChunks(df: DataFrame, tokensCol: String, shardCol: String,
                        orderCol: String, budget: Long,
                        withDocIds: Boolean = false,
                        idCol: String = null): DataFrame = {
    val counted = df.withColumn("__n_tok", size(col(tokensCol)).cast("long"))
    val manifest = chunkManifest(counted, "__n_tok", shardCol, orderCol,
      budget)
    // doc-local 0-based overlap start = chunk*budget + tok_from - start_tok
    val from = col("chunk") * lit(budget) + col("tok_from") - col("start_tok")
    val len = col("tok_to") - col("tok_from")
    val prov = Option(idCol).getOrElse(orderCol)
    if (withDocIds) {
      // A non-integral provenance column would cast to NULL doc_ids
      // silently, defeating the cross-document-masking provenance the
      // column exists for — fail loudly at plan time instead.
      val dt = df.schema(prov).dataType
      val integral = dt match {
        case _: org.apache.spark.sql.types.ByteType => true
        case _: org.apache.spark.sql.types.ShortType => true
        case _: org.apache.spark.sql.types.IntegerType => true
        case _: org.apache.spark.sql.types.LongType => true
        // scale-0 decimals (warehouse-export ids) cast losslessly while
        // precision fits a long (≤ 18 digits can never overflow to null)
        case d: org.apache.spark.sql.types.DecimalType =>
          d.scale == 0 && d.precision <= 18
        case _ => false
      }
      require(integral,
        s"doc-id provenance column '$prov' must be integral, got ${dt.sql}")
    }
    val pieceCols = Seq(col(shardCol), col("chunk"), col(orderCol).as("__o"),
      slice(col(tokensCol), (from + 1L).cast("int"), len.cast("int"))
        .as("__piece")) ++
      (if (withDocIds) Seq(col(prov).cast("long").as("__did")) else Nil)
    val pieces = manifest.select(pieceCols: _*)
    // __o leads the struct and is unique within (shard, chunk), so the
    // sort order is orderCol order regardless of the trailing fields
    val sortFields = struct(Seq(col("__o"), col("__piece")) ++
      (if (withDocIds) Seq(col("__did")) else Nil): _*)
    val sorted = array_sort(collect_list(sortFields))
    val base = pieces
      .groupBy(col(shardCol), col("chunk"))
      .agg(sorted.as("__sorted"))
      .withColumn("tokens", flatten(transform(col("__sorted"), x => x("__piece"))))
    val out =
      if (!withDocIds) base
      else base.withColumn("doc_ids", flatten(transform(col("__sorted"),
        x => array_repeat(x("__did"), size(x("__piece"))))))
    out.drop("__sorted")
  }

  /** GLOBAL DETERMINISTIC SHUFFLE — the step before packing: spread
    * documents across `nShards` shards and order them pseudo-randomly
    * within each, as a pure function of the id (the same LCG family as
    * [[Mix]] — reproducible across engines/reruns/cluster sizes where an
    * RNG shuffle is not, and SQL-replayable). Emits the input columns
    * plus `shard` and `pos` (0-based rank in the shard's shuffled
    * order); feed `shard`/`pos` straight into [[sequenceOffsets]] as
    * (shardCol, orderCol). nShards is the parallelism knob: one window
    * per shard ranks ~|rows|/nShards rows. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    val h = Mix.hashScaled(col(idCol))
    // full-width tiebreak (review r18-4): h ties exactly when ids are
    // equal mod 2^20, so past ~2^20/nShards rows per shard the order
    // would degenerate to RUNS of ascending raw ids — original
    // corpus/crawl order, the opposite of a shuffle. A second LCG round
    // over the HIGH id bits decorrelates the tied runs; ties surviving
    // both (ids equal mod 2^40) fall back to id.
    val h2 = Mix.hashScaled(shiftright(col(idCol).cast("long"), 20))
    val w = Window.partitionBy(col("shard")).orderBy(h, h2, col(idCol))
    df.withColumn("shard", pmod(h, lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
  }
}
