package graft.stats

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** Metadata-only statistics (SURVEY §2.3/2.4): the analogs of the
  * reference's EstimateMinMax (Z4, columnar/columnar.cpp:649-675), CalcCount
  * (I6, secondary/secondary.cpp:774-812), stored ndv (I7,
  * secondary.cpp:380-388), whole-segment EarlyReject (Z2,
  * columnar.cpp:695-704), and min/max tree roots (Z1,
  * builderminmax.h:166-178) — all answered from Parquet footers without
  * scanning a single data page.
  *
  * 100 TB design: footer reads are per-file driver work and do NOT scale to
  * millions of files — that is what the file-stats CATALOG is for: one
  * engine-written table holding (file, rows, bytes, per-column min/max),
  * built once per table (distributed) and consulted for pruning/estimates
  * ever after — the true analog of the reference's per-segment header block
  * (SURVEY M6). `buildCatalog` is that builder; `pruneFiles`/`earlyReject`
  * are the consumers.
  */
object Stats {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(Stats.getClass)

  final case class ColStats(min: Option[Any], max: Option[Any],
                            nulls: Option[Long])
  final case class FileStats(path: String, rows: Long, bytes: Long,
                             cols: Map[String, ColStats])

  /** Default Hadoop conf: the active session's (carries `spark.hadoop.*`
    * settings — credentials/impls for s3a/abfs/...), else a bare one. A bare
    * `new Configuration()` would see none of the session's store config. */
  private def sessionConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Driver-side footer reads since JVM start — test instrumentation for
    * the catalog path's zero-footer-IO contract. */
  val footerReads = new java.util.concurrent.atomic.AtomicLong(0L)

  private def footer(p: Path, conf: Configuration): ParquetMetadata = {
    footerReads.incrementAndGet()
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try r.getFooter finally r.close()
  }

  // ---- registered catalogs: the 100 TB administrative path ----
  //
  // Driver footer sweeps are per-file IO: milliseconds at test scale,
  // hours at millions of files. A table with a registered catalog
  // (buildCatalog output — one row per file, built DISTRIBUTED) answers
  // rowCount / clusteredBy from catalog aggregations instead, so index
  // REGISTRATION (IndexRouting.register, the one administrative path that
  // consumed footer sweeps) does zero footer reads. Unregistered tables
  // fall back to the sweep unchanged.

  private val catalogs =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def qualify(path: String, conf: Configuration): String = {
    val p = new Path(path)
    p.getFileSystem(conf).makeQualified(p).toString
  }

  /** Attach `catalog` as the stats source for `tableDir`. Register a
    * PERSISTED copy (the [[buildCatalog]] output written to a table and
    * re-read, or `.cache()`d) — a raw buildCatalog DataFrame re-runs its
    * footer-reading job on every consultation, which is exactly the IO
    * this seam exists to avoid. Re-register after appends/compactions —
    * the catalog is a snapshot of one table version. */
  def registerCatalog(spark: SparkSession, tableDir: String,
                      catalog: DataFrame): Unit =
    catalogs.put(
      qualify(tableDir, spark.sparkContext.hadoopConfiguration), catalog)

  def unregisterCatalog(spark: SparkSession, tableDir: String): Unit =
    catalogs.remove(
      qualify(tableDir, spark.sparkContext.hadoopConfiguration))

  private def catalogFor(path: String, conf: Configuration): Option[DataFrame] =
    catalogs.get(qualify(path, conf))

  /** Enumerate the table's parquet files through the Hadoop FileSystem API —
    * the same resolver Spark's scans use, so the stats/catalog path sees
    * exactly what a scan sees on ANY supported store (local, HDFS, S3A,
    * ABFS…). `java.io.File` would silently return zero files anywhere a
    * 100 TB table actually lives (VERDICT r4 #3). Returns (path, length). */
  private def parquetFiles(path: String,
                           conf: Configuration): Seq[(Path, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    // Missing path → no files (0 rows, nothing to prune) — the same
    // behavior the java.io.File version had; getFileStatus would throw.
    if (!fs.exists(p)) return Seq.empty
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq((st.getPath, st.getLen))
    else {
      // RECURSE into subdirectories (review r18-5): the engine's own
      // Writer.writePartitioned lays files out as col=value/part-*.parquet
      // — a one-level listing would see only directories, report 0 rows,
      // and tell earlyReject the table is skippable while it holds
      // matching rows. Hidden dirs/files (_SUCCESS, _index manifests,
      // .crc) are skipped like Spark's own listing.
      def visible(n: String): Boolean =
        !n.startsWith("_") && !n.startsWith(".")
      val out = Seq.newBuilder[(Path, Long)]
      def walk(d: Path): Unit =
        fs.listStatus(d).foreach { s =>
          val n = s.getPath.getName
          if (s.isFile) {
            if (n.endsWith(".parquet") && visible(n))
              out += ((s.getPath, s.getLen))
          } else if (visible(n)) walk(s.getPath)
        }
      walk(p)
      out.result().sortBy(_._1.toString)
    }
  }

  private def normalize(v: Any): Any = v match {
    case b: Binary => b.toStringUsingUTF8
    case x => x
  }

  /** Per-file footer statistics (driver-side; for the catalog path at scale
    * use [[buildCatalog]], which distributes this). */
  def fileStats(path: String, conf: Configuration = null): Seq[FileStats] = {
    val c = if (conf != null) conf else sessionConf()
    fileStatsWith(path, c)
  }

  private def fileStatsWith(path: String, conf: Configuration): Seq[FileStats] =
    fileStatsFor(parquetFiles(path, conf), conf)

  /** [[fileStatsWith]] over a pre-computed listing — lets callers that
    * already listed the table (the [[rowsAndNulls]] threshold gate) avoid
    * a second recursive FileSystem walk (on object stores the LIST calls
    * dominate small-table registration latency). */
  private def fileStatsFor(files: Seq[(Path, Long)],
                           conf: Configuration): Seq[FileStats] =
    files.map { case (f, len) =>
      val fmd = footer(f, conf)
      val blocks = fmd.getBlocks.asScala
      val rows = blocks.map(_.getRowCount).sum
      val bytes = len
      val cols = scala.collection.mutable.Map.empty[String, (Option[Any], Option[Any], Long)]
      blocks.foreach { b =>
        b.getColumns.asScala.foreach { cc =>
          val name = cc.getPath.toDotString
          val st = cc.getStatistics
          // an ALL-NULL chunk has stats with hasNonNullValue=false but a
          // real null count — skipping it entirely under-counted nulls
          // and made an everywhere-null column vanish from the map
          // (review r18-5): fold the nulls always, min/max only when a
          // non-null value exists
          if (st != null && (st.hasNonNullValue || st.isNumNullsSet)) {
            val (mn, mx, nl) = cols.getOrElse(name, (None, None, 0L))
            val (nmn, nmx) =
              if (!st.hasNonNullValue) (mn, mx)
              else {
                val cmp = st.comparator.asInstanceOf[java.util.Comparator[AnyRef]]
                (mn match {
                  case Some(m) if cmp.compare(m.asInstanceOf[AnyRef], st.genericGetMin.asInstanceOf[AnyRef]) <= 0 => mn
                  case _ => Some(st.genericGetMin)
                },
                mx match {
                  case Some(m) if cmp.compare(m.asInstanceOf[AnyRef], st.genericGetMax.asInstanceOf[AnyRef]) >= 0 => mx
                  case _ => Some(st.genericGetMax)
                })
              }
            cols(name) = (nmn, nmx, nl + (if (st.isNumNullsSet) st.getNumNulls else 0L))
          }
        }
      }
      FileStats(f.toString, rows, bytes,
        cols.map { case (k, (mn, mx, nl)) =>
          k -> ColStats(mn.map(normalize), mx.map(normalize), Some(nl))
        }.toMap)
    }

  /** I6 CalcCount analog: exact row count from footers — no scan. A
    * registered catalog answers it with one tiny aggregation instead (no
    * footer IO at all). */
  def rowCount(path: String, conf: Configuration = null): Long = {
    val c = if (conf != null) conf else sessionConf()
    catalogFor(path, c) match {
      case Some(cat) =>
        cat.agg(coalesce(sum(col("rows")), lit(0L))).head.getLong(0)
      case None => fileStats(path, conf).map(_.rows).sum
    }
  }

  /** Z1 min/max tree root analog: column min/max from footers — no scan.
    * Exact for numeric columns (Parquet numeric stats are not truncated). */
  def minMax(path: String, column: String): Option[(Any, Any)] = {
    val per = fileStats(path).flatMap(_.cols.get(column))
    val mins = per.flatMap(_.min)
    val maxs = per.flatMap(_.max)
    if (mins.isEmpty) None
    else (mins.head, maxs.head) match {
      case (_: java.lang.Long, _) =>
        Some((mins.map(_.asInstanceOf[Long]).min, maxs.map(_.asInstanceOf[Long]).max))
      case (_: java.lang.Integer, _) =>
        Some((mins.map(_.asInstanceOf[Int]).min, maxs.map(_.asInstanceOf[Int]).max))
      case (_: java.lang.Double, _) =>
        Some((mins.map(_.asInstanceOf[Double]).min, maxs.map(_.asInstanceOf[Double]).max))
      case (_: java.lang.Float, _) =>
        Some((mins.map(_.asInstanceOf[Float]).min, maxs.map(_.asInstanceOf[Float]).max))
      case (_: String, _) =>
        Some((mins.map(_.asInstanceOf[String]).min, maxs.map(_.asInstanceOf[String]).max))
      case _ => None
    }
  }

  /** Z4 EstimateMinMax analog: upper-bound cardinality of `lo <= col <= hi`
    * — sum of row counts of ROW GROUPS whose [min,max] intersects the range
    * (the reference walks its min/max tree at reduced depth; the row group
    * is our tree level). Footer-only. */
  def estimateRange(path: String, column: String, lo: Double, hi: Double,
                    hconf: Configuration = null): Long = {
    val conf = if (hconf != null) hconf else sessionConf()
    // Registered catalog: file-granularity overlap sum, zero footer IO —
    // the 100 TB plan-time path (AnnRoutingRule estimates selectivity per
    // novel range; a footer sweep per estimate is a driver O(files) loop).
    // Coarser than row groups, so it over-counts — conservative for every
    // caller (estimates gate, never answer). NaN min/max (string/no-stats
    // columns) must count as "cannot prune": Spark orders NaN ABOVE every
    // number, so an unguarded mn > hi would wrongly prune those files.
    catalogFor(path, conf) match {
      case Some(cat) =>
        val mn = element_at(col("col_min"), column)
        val mx = element_at(col("col_max"), column)
        val prunable = mn.isNotNull && mx.isNotNull &&
          !isnan(mn) && !isnan(mx) && (mx < lit(lo) || mn > lit(hi))
        cat.agg(coalesce(sum(when(prunable, 0L).otherwise(col("rows"))),
          lit(0L))).head.getLong(0)
      case None =>
        parquetFiles(path, conf).map { case (f, _) =>
          footer(f, conf).getBlocks.asScala.map { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == column) match {
              case Some(cc) =>
                val (mn, mx) = numericRange(cc)
                if (mx < lo || mn > hi) 0L else b.getRowCount
              case _ => b.getRowCount // no stats → cannot prune, count it
            }
          }.sum
        }.sum
    }
  }

  /** Z2 whole-segment EarlyReject analog: true iff NO file can contain a row
    * in [lo, hi] — the query can skip the table without touching data. */
  def earlyReject(path: String, column: String, lo: Double, hi: Double): Boolean =
    estimateRange(path, column, lo, hi) == 0L

  /** Numeric [min, max] of one column chunk's statistics, full range when
    * the stats are absent or non-numeric — the conservative "cannot prune"
    * reading shared by [[estimateRange]] and [[rowGroupRanges]]. */
  private def numericRange(
      cc: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): (Double, Double) =
    if (cc.getStatistics == null || !cc.getStatistics.hasNonNullValue)
      (Double.NegativeInfinity, Double.PositiveInfinity)
    else (cc.getStatistics.genericGetMin, cc.getStatistics.genericGetMax) match {
      case (a: java.lang.Long, b: java.lang.Long) => (a.toDouble, b.toDouble)
      case (a: java.lang.Integer, b: java.lang.Integer) => (a.toDouble, b.toDouble)
      case (a: java.lang.Double, b: java.lang.Double) => (a.doubleValue, b.doubleValue)
      case (a: java.lang.Float, b: java.lang.Float) => (a.toDouble, b.toDouble)
      case _ => (Double.NegativeInfinity, Double.PositiveInfinity)
    }

  /** Per-ROW-GROUP numeric [min, max] of `column` across all files
    * (footer-only). Row groups without usable numeric stats contribute the
    * full range. */
  def rowGroupRanges(path: String, column: String,
                     hconf: Configuration = null): Seq[(Double, Double)] = {
    val conf = if (hconf != null) hconf else sessionConf()
    parquetFiles(path, conf).flatMap { case (f, _) =>
      footer(f, conf).getBlocks.asScala.map { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == column) match {
          case Some(cc) => numericRange(cc)
          case _ => (Double.NegativeInfinity, Double.PositiveInfinity)
        }
      }
    }
  }

  /** Is the table effectively clustered by `column`? True when at least
    * `frac` of the table's ROWS live in row groups whose [min, max] range
    * starts at or after the previous range's max in (min, max) order —
    * then a point/range predicate already prunes at scan time and an index
    * detour buys nothing. ROW-weighted, not range-counted: after segment
    * appends, dozens of tiny well-chained batch files must not outvote one
    * fat unpruned file holding most of the data (a count-of-transitions
    * metric says "clustered" there while a point probe still scans nearly
    * everything). The (min, max) sort is also a DETERMINISTIC total order
    * for the ok-count: ordering by min alone left ties to listing order,
    * and a borderline fraction flipped between runs. Works for numeric AND
    * string columns (string stats compare ordinally after the
    * Binary→String normalization, matching Parquet's own pruning order).
    * Fewer than two row groups, any row group without stats, or mixed stat
    * types give no pruning evidence → false. This is the engine's input to
    * the access-path choice — the reference's EstimateMinMax seam
    * (columnar.cpp:649-675). */
  def clusteredBy(path: String, column: String, hconf: Configuration = null,
                  frac: Double = 0.8): Boolean = {
    val conf = if (hconf != null) hconf else sessionConf()
    // Registered catalog: answer from per-FILE ranges (one small Spark
    // job, zero footer IO — the 100 TB registration path). File
    // granularity is the right scale signal (pruning at 100 TB is file
    // pruning), and engine-written files are internally sorted, so
    // non-overlapping files imply non-overlapping row groups. The catalog
    // stores numeric ranges only; NaN (string/no-stats) columns fall back
    // to the footer sweep below.
    catalogFor(path, conf).foreach { cat =>
      val mn = element_at(col("col_min"), column)
      val mx = element_at(col("col_max"), column)
      val ranges = cat.select(mn.as("mn"), mx.as("mx"), col("rows").as("rw"))
      val clean = ranges.filter(col("mn").isNull || col("mx").isNull ||
        isnan(col("mn")) || isnan(col("mx"))).isEmpty
      if (clean) {
        // Scalable adjacency scan (r13 VERDICT #4): the old form ran a
        // global no-partition window — one task sorting the WHOLE file
        // catalog, fine at metadata scale but a serialization point when
        // a million-file lake registers. Same decision, scalable shape:
        // range-partition the per-file ranges on (mn, mx), scan adjacency
        // within each sorted partition, and stitch the P partition
        // boundaries on the driver (P summary rows, never |files| rows).
        // The lag() semantics are preserved exactly: each file compares
        // against the IMMEDIATELY previous file's mx in (mn, mx) order;
        // the first file overall is unconditionally ok.
        val spark = cat.sparkSession
        val par = math.max(1,
          spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        val parted = ranges
          .select(col("mn").cast("double"), col("mx").cast("double"),
            col("rw").cast("long"))
          .repartitionByRange(par, col("mn"), col("mx"))
          .sortWithinPartitions(col("mn"), col("mx"))
        val partStats = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
          if (!it.hasNext) Iterator.empty
          else {
            val first = it.next()
            val firstMn = first.getDouble(0)
            val firstRw = first.getLong(2)
            var prevMx = first.getDouble(1)
            var pn = 1L
            var ptot = firstRw
            var pok = 0L // the first row's verdict needs the previous
                         // partition's tail — decided on the driver
            while (it.hasNext) {
              val r = it.next()
              if (prevMx <= r.getDouble(0)) pok += r.getLong(2)
              prevMx = r.getDouble(1)
              pn += 1
              ptot += r.getLong(2)
            }
            Iterator.single((pid, pn, pok, ptot, firstMn, firstRw, prevMx))
          }
        }.collect().sortBy(_._1)
        var n = 0L; var ok = 0L; var tot = 0L
        var prevMx = Double.NegativeInfinity
        var firstSeen = false
        partStats.foreach { case (_, pn, pok, ptot, fMn, fRw, lastMx) =>
          n += pn; ok += pok; tot += ptot
          if (!firstSeen || prevMx <= fMn) ok += fRw
          firstSeen = true
          prevMx = lastMx
        }
        // a SINGLE file gives the catalog no adjacency evidence, but its
        // row groups may still be clustered — fall through to the (one
        // footer) sweep rather than diverging from its decision
        // (review r10)
        if (n >= 2)
          return ok.toDouble / math.max(1L, tot) >= frac
      }
    }
    val rs: Seq[Option[(Any, Any, Long)]] =
      try parquetFiles(path, conf).flatMap { case (f, _) =>
        footer(f, conf).getBlocks.asScala.map { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == column) match {
            case Some(cc) if cc.getStatistics != null &&
                cc.getStatistics.hasNonNullValue =>
              Some((normalize(cc.getStatistics.genericGetMin),
                normalize(cc.getStatistics.genericGetMax), b.getRowCount))
            case _ => None
          }
        }
      } catch { case e: Exception =>
        // "not clustered" is the CONSERVATIVE answer (routing falls back
        // to the always-correct shapes), but an IO/credential/corrupt-
        // footer failure must not be INVISIBLE — it silently degrades
        // every routing decision for the table (review r18-5)
        log.warn(s"clusteredBy($path, $column): footer sweep failed, " +
          s"treating as not clustered: ${e.getMessage}")
        Nil
      }
    if (rs.size < 2 || rs.exists(_.isEmpty)) return false
    val ranges = rs.flatten
    if (ranges.map(_._1.getClass).distinct.size != 1 ||
        !ranges.head._1.isInstanceOf[Comparable[_]]) return false
    def cmp(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    val sorted = ranges.sortWith((x, y) =>
      cmp(x._1, y._1) < 0 || (cmp(x._1, y._1) == 0 && cmp(x._2, y._2) < 0))
    val okRows = sorted.head._3 + sorted.sliding(2).collect {
      case Seq(a, b) if cmp(a._2, b._1) <= 0 => b._3
    }.sum
    okRows.toDouble / math.max(1L, sorted.map(_._3).sum) >= frac
  }

  // ---- file-stats catalog (the 100 TB pruning seam, SURVEY M6) ----

  /** Build the file-stats catalog AS A SPARK JOB (footer reads distributed
    * across executors — this is what scales to millions of files): one row
    * per file with rows/bytes and min/max per requested numeric column. */
  def buildCatalog(spark: SparkSession, tableDir: String,
                   columns: Seq[String]): DataFrame = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val files = parquetFiles(tableDir, hconf).map(_._1.toString)
    val colsB = spark.sparkContext.broadcast(columns)
    // Ship the session's Hadoop settings (spark.hadoop.* — store creds,
    // fs impls) to the executors: a bare Configuration there would lose
    // them and fail on s3a/abfs despite the qualified paths.
    val confB = spark.sparkContext.broadcast(
      hconf.iterator().asScala.map(e => e.getKey -> e.getValue).toArray)
    val rows = spark.sparkContext.parallelize(files, math.max(1, files.size))
      .map { p =>
        val conf = new Configuration()
        confB.value.foreach { case (k, v) => conf.set(k, v) }
        val fmd = footer(new Path(p), conf)
        val blocks = fmd.getBlocks.asScala
        val nRows = blocks.map(_.getRowCount).sum
        val stats = colsB.value.map { c =>
          val per = blocks.flatMap(_.getColumns.asScala
            .find(_.getPath.toDotString == c))
            .filter(cc => cc.getStatistics != null && cc.getStatistics.hasNonNullValue)
            .map { cc =>
              val st = cc.getStatistics
              def d(v: Any): Double = v match {
                case x: java.lang.Long => x.toDouble
                case x: java.lang.Integer => x.toDouble
                case x: java.lang.Double => x
                case x: java.lang.Float => x.toDouble
                case _ => Double.NaN
              }
              (d(st.genericGetMin), d(st.genericGetMax))
            }
          if (per.isEmpty) (c, Double.NaN, Double.NaN)
          else (c, per.map(_._1).min, per.map(_._2).max)
        }
        // Null counts use the FIRST leaf under the requested path (array
        // columns live at `c.list.element`) — the same match
        // AnnRouting.baseFooterStats applies, so a catalog answers the
        // registration's null question identically to the footer sweep.
        // -1L = unknown (any block missing isNumNullsSet poisons the file);
        // consumers must treat a negative as "stats absent".
        val nulls = colsB.value.map { c =>
          val perBlock = blocks.map(_.getColumns.asScala.collectFirst {
            case cc if cc.getPath.toDotString == c ||
                cc.getPath.toDotString.startsWith(c + ".") =>
              val st = cc.getStatistics
              if (st != null && st.isNumNullsSet) st.getNumNulls else -1L
          }.getOrElse(-1L))
          c -> (if (perBlock.exists(_ < 0L)) -1L else perBlock.sum)
        }.toMap
        (p, nRows, stats.map { case (c, mn, _) => c -> mn }.toMap,
          stats.map { case (c, _, mx) => c -> mx }.toMap, nulls)
      }
    rows.toDF("file", "rows", "col_min", "col_max", "col_nulls")
  }

  /** (row count, null count for `column` — Some(0) proves no nulls, None =
    * stats absent → treat as may-have-nulls) for index REGISTRATION.
    * Catalog-first (zero footer IO when one is registered — VERDICT r18
    * #1), then a driver footer sweep under `driverMaxFiles` files, then
    * the DISTRIBUTED [[buildCatalog]] read (the million-file path: a
    * serial driver footer pass there is an hours-long register call).
    * IO failures THROW — the old silent (0, None) left a permanently dead
    * ANN route with no signal (ADVICE r18); callers log-and-degrade. */
  def rowsAndNulls(spark: SparkSession, path: String, column: String,
                   driverMaxFiles: Int = 64): (Long, Option[Long]) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    def fromCatalog(cat: DataFrame): (Long, Option[Long]) = {
      val n = element_at(col("col_nulls"), column)
      val r = cat.agg(
        coalesce(sum(col("rows")), lit(0L)),
        sum(when(n >= 0L, n)),
        count(when(n.isNull || n < 0L, lit(1))),
        count(lit(1))).head
      val nulls =
        if (r.getLong(3) == 0L || r.getLong(2) > 0L) None
        else Some(r.getLong(1))
      (r.getLong(0), nulls)
    }
    catalogFor(path, hconf) match {
      case Some(cat) if cat.columns.contains("col_nulls") => fromCatalog(cat)
      case legacy =>
        // a pre-r19 catalog (no col_nulls) cannot answer the null
        // question — falling back to the footer path keeps the r18
        // behavior (nulls proven, routes stay live) instead of silently
        // degrading every registration to may-have-nulls until the user
        // rebuilds the catalog (r19 review)
        if (legacy.isDefined)
          log.info(s"rowsAndNulls: catalog for $path predates col_nulls — " +
            "answering from footers; rebuild the catalog with " +
            "Stats.buildCatalog to restore the zero-IO registration path")
        val files = parquetFiles(path, hconf)
        if (files.size <= driverMaxFiles) {
          val per = fileStatsFor(files, hconf) // ONE listing, reused
          val rows = per.map(_.rows).sum
          if (per.isEmpty) (rows, None)
          else {
            val counts = per.map(_.cols.collectFirst {
              case (name, cs)
                  if name == column || name.startsWith(column + ".") =>
                cs.nulls
            }.flatten)
            (rows,
              if (counts.exists(_.isEmpty)) None
              else Some(counts.flatten.sum))
          }
        } else fromCatalog(buildCatalog(spark, path, Seq(column)))
    }
  }

  /** Consult the catalog: files that may contain rows with col in [lo, hi].
    * At 100 TB this runs BEFORE any footer is opened. Files WITHOUT usable
    * stats for the column (missing key → null, non-numeric/absent stats →
    * NaN from buildCatalog) cannot be pruned and are kept — the same
    * "no stats → count it" rule estimateRange applies; NaN comparisons
    * evaluate false, so without the escape such files would silently
    * vanish from the scan set. */
  def pruneFiles(catalog: DataFrame, column: String,
                 lo: Double, hi: Double): DataFrame = {
    val mn = element_at(col("col_min"), column)
    val mx = element_at(col("col_max"), column)
    catalog.filter(
      mn.isNull || mx.isNull || isnan(mn) || isnan(mx) ||
      (mx >= lo && mn <= hi))
      .select(col("file"), col("rows"))
  }

  /** I7 GetCountDistinct analog: the exact path is `countDistinct` (one
    * shuffle); the stored-metadata path is the catalog + HLL sketch. This
    * helper gives the approximate answer with Spark's HLL++ — the same
    * sketch family the reference would consult precomputed. */
  def approxNdv(df: DataFrame, column: String, rsd: Double = 0.05): Long =
    df.select(approx_count_distinct(col(column), rsd)).head.getLong(0)
}
