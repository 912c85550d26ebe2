package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) data layout: co-cluster rows that are close in
  * SEVERAL dimensions at once, so parquet min/max stats prune files and
  * row groups for predicates on ANY clustered dimension — the multi-
  * dimensional analog of sorting, and a first-class 100 TB lever: a
  * petabyte corpus laid out along one sort key skips nothing for the
  * second dimension, while a z-layout gives every clustered column
  * sub-linear scan cost.
  *
  * Mechanics (classic Morton order, public textbook material): each
  * dimension is reduced to an unsigned `bits`-bit rank, the ranks are
  * bit-interleaved into one LONG, and the frame is range-partitioned +
  * sorted by that value. Every step is built-in Spark expressions
  * (shifts, masks, ORs) — whole-stage codegen applies, and the interleave
  * is embarrassingly parallel; the only exchange is the final range
  * partition, which ANY re-layout needs.
  *
  * Rank strategies:
  *   - numeric/timestamp: linear min/max scaling into `bits` bits. The
  *     min/max pair per column comes from ONE tiny aggregate job (2
  *     values per column to the driver — bounded at any corpus size).
  *     Skewed distributions still prune correctly (stats ranges stay
  *     valid), just less sharply.
  *   - string/binary/other, default: the top `bits` bits of xxhash64.
  *     Order-free — min/max stats on the column itself cannot prune, so
  *     this mode only CLUSTERS such columns (few distinct values per
  *     file); use it when the scan stack prunes by dictionary/bloom, or
  *     when the column is a filter-rarely dimension.
  *   - string with `orderedStrings = true`: an ORDER-PRESERVING rank —
  *     percent_rank over the column's DISTINCT values, broadcast-joined
  *     back. Each output file then covers a narrow LEXICOGRAPHIC range,
  *     so plain min/max stats prune prefix and equality predicates (what
  *     a string-stats scan stack actually checks). Costs one distinct
  *     pass + a single-partition window over the distinct set — choose it
  *     when the column's cardinality is bounded (subjects, categories),
  *     not for free-text.
  *   - NULL ranks as 0 (nulls cluster at the curve origin).
  *
  * The z-value never changes WHAT rows exist — layout only. The oracle
  * (`layout_zorder`) asserts content identity against the unclustered
  * table; `ZOrderSpec` asserts the actual skipping win from the file
  * stats the layout produces.
  */
object ZOrder {

  /** unsigned `bits`-bit rank of a numeric column via min/max scaling */
  def rankNumeric(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val buckets = (1L << bits) - 1
    val scaled =
      if (mx > mn) (c.cast(DoubleType) - lit(mn)) / lit(mx - mn) * lit(buckets.toDouble)
      else lit(0.0)
    // clamp: stats race (rows outside the sampled min/max) must not wrap
    coalesce(least(greatest(round(scaled).cast(LongType), lit(0L)),
      lit(buckets)), lit(0L))
  }

  /** unsigned `bits`-bit rank of an arbitrary column via xxhash64 */
  def rankHash(c: Column, bits: Int): Column =
    coalesce(shiftrightunsigned(xxhash64(c), 64 - bits), lit(0L))

  /** Order-preserving `bits`-bit rank map for a bounded-cardinality
    * column: (value, rank) over the DISTINCT values, rank = scaled
    * percent_rank, so lexicographic order is preserved and file min/max
    * stats stay meaningful. The single-partition window runs over the
    * distinct set only — bounded for categorical/subject-like columns. */
  def orderedRankMap(df: DataFrame, colName: String, bits: Int,
                     rankCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(colName))
    df.select(col(colName)).na.drop().distinct()
      .withColumn(rankCol,
        round(percent_rank().over(w) * lit(((1L << bits) - 1).toDouble))
          .cast(LongType))
  }

  /** the z-value column for `cols` of `df` in the default (hashed-string)
    * mode — strategies chosen by type, one stats job for all numeric
    * columns together */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 12): Column =
    interleave(cols.map(c => numericRanks(df, cols, bits)
      .getOrElse(c, rankHash(col(c), bits))), bits)

  /** min/max-scaled ranks for the numeric subset of `cols` (one agg job);
    * non-numeric columns are absent from the result */
  private def numericRanks(df: DataFrame, cols: Seq[String],
                           bits: Int): Map[String, Column] = {
    val fields = cols.map(c => df.schema(c))
    def asDouble(f: StructField): Option[Column] = f.dataType match {
      case _: NumericType => Some(col(f.name).cast(DoubleType))
      case TimestampType => Some(col(f.name).cast(DoubleType))
      case DateType | TimestampNTZType =>
        Some(col(f.name).cast(TimestampType).cast(DoubleType))
      case _ => None
    }
    val numeric = fields.flatMap(f => asDouble(f).map(f.name -> _)).toMap
    if (numeric.isEmpty) Map.empty
    else {
      val names = numeric.keys.toSeq
      val aggs = names.flatMap(c => Seq(
        min(numeric(c)).as(s"mn_$c"), max(numeric(c)).as(s"mx_$c")))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      names.zipWithIndex.map { case (c, i) =>
        val mn = if (r.isNullAt(2 * i)) 0.0 else r.getDouble(2 * i)
        val mx = if (r.isNullAt(2 * i + 1)) 0.0 else r.getDouble(2 * i + 1)
        c -> rankNumeric(numeric(c), mn, mx, bits)
      }.toMap
    }
  }

  /** Morton interleave: bit b of rank i lands at position b*n + i. Pure
    * shift/mask/OR expression tree — codegen-friendly, no UDF. */
  def interleave(ranks: Seq[Column], bits: Int): Column = {
    val n = ranks.length
    require(n >= 1 && n * bits <= 63,
      s"z-order needs 1..${63 / bits} columns at $bits bits, got $n")
    val terms = for {
      (r, i) <- ranks.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftrightunsigned(r, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Data-skipping accounting from parquet FILE footers: of the files under
    * `dir`, how many have `column` min/max stats overlapping [lo, hi] —
    * i.e. how many a stats-pruning scan must actually read. Files whose
    * stats are absent or null for the column count as OVERLAPPING (a
    * pruner that can't prove non-overlap must read the file). Returns
    * (overlapping, total). This is the measurement the layout exists for;
    * `ZOrderSpec` and the ScaleProbe sweep both read it. */
  def overlappingFiles(dir: String, column: String,
                       lo: Long, hi: Long): (Int, Int) = {
    import scala.jdk.CollectionConverters._
    val d = new java.io.File(dir)
    require(d.isDirectory, s"overlappingFiles: no directory at $dir")
    val conf = new org.apache.hadoop.conf.Configuration()
    val bounds = d.listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getPath), conf))
        try {
          val blocks = r.getFooter.getBlocks.asScala
          val stats = blocks.map(_.getColumns.asScala
            .find(_.getPath.toDotString == column).map(_.getStatistics)
            .filter(s => s != null && s.hasNonNullValue &&
              s.genericGetMin != null && s.genericGetMax != null))
          if (stats.isEmpty || stats.exists(_.isEmpty)) None
          else {
            val s = stats.flatten
            Some((s.map(_.genericGetMin.asInstanceOf[java.lang.Long]
                .longValue()).min,
              s.map(_.genericGetMax.asInstanceOf[java.lang.Long]
                .longValue()).max))
          }
        } finally r.close()
      }
    (bounds.count {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None => true // unknowable stats cannot prune
    }, bounds.size)
  }

  /** Re-layout `df` along the z-curve of `cols`: range-partition into
    * `partitions` output files, sort within each by the z-value, drop the
    * helper columns. Row content is IDENTICAL to the input — only file
    * boundaries and row order move, which is what makes every clustered
    * column's min/max stats tight.
    *
    * `orderedStrings = true` ranks string columns order-preservingly (see
    * [[orderedRankMap]]) so their plain min/max stats prune too — for
    * bounded-cardinality dimensions like subjects or categories.
    * `sortWithin = false` skips the within-partition z-sort: for sinks
    * that re-sort rows themselves (e.g. the native store writer's
    * seq-ordering requirement) only the FILE ASSIGNMENT survives, and
    * paying a second O(n log n) sort buys nothing. */
  def cluster(df: DataFrame, cols: Seq[String], partitions: Int,
              bits: Int = 12, orderedStrings: Boolean = false,
              sortWithin: Boolean = true): DataFrame = {
    require(!df.columns.exists(_.startsWith("__z")),
      "z-order helper columns collide: input already has a __z* column")
    val numeric = numericRanks(df, cols, bits)
    var cur = df
    val ranks = cols.map { c =>
      numeric.get(c) match {
        case Some(rank) => rank
        case None if orderedStrings && df.schema(c).dataType == StringType =>
          val rc = s"__zr_$c"
          cur = cur.join(broadcast(orderedRankMap(df, c, bits, rc)),
            Seq(c), "left")
          coalesce(col(rc), lit(0L))
        case None => rankHash(col(c), bits)
      }
    }
    val zed = cur.withColumn("__z", interleave(ranks, bits))
      .repartitionByRange(partitions, col("__z"))
    val sorted = if (sortWithin) zed.sortWithinPartitions("__z") else zed
    // restore the INPUT column order (a using-join moves keys to the front)
    sorted.select(df.columns.map(col).toSeq: _*)
  }
}
