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
  * Rank strategies (chosen per column type, no configuration):
  *   - numeric/timestamp: linear min/max scaling into `bits` bits. The
  *     min/max pair per column comes from ONE tiny aggregate job (2
  *     values per column to the driver — bounded at any corpus size).
  *     Skewed distributions still prune correctly (stats ranges stay
  *     valid), just less sharply.
  *   - string/binary/other: the top `bits` bits of xxhash64. Equality
  *     predicates on such columns prune via the same interleave even
  *     though range predicates on them cannot (hashing is order-free) —
  *     exactly the trade dedup/band keys already make.
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

  /** the z-value column for `cols` of `df`, strategies chosen by type
    * (one stats job for all numeric columns together) */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 12): Column = {
    val fields = cols.map(c => df.schema(c))
    def asDouble(f: StructField): Option[Column] = f.dataType match {
      case _: NumericType => Some(col(f.name).cast(DoubleType))
      case TimestampType => Some(col(f.name).cast(DoubleType))
      case DateType | TimestampNTZType =>
        Some(col(f.name).cast(TimestampType).cast(DoubleType))
      case _ => None
    }
    val numeric = fields.flatMap(f => asDouble(f).map(f.name -> _)).toMap
    val stats: Map[String, (Double, Double)] =
      if (numeric.isEmpty) Map.empty
      else {
        val names = numeric.keys.toSeq
        val aggs = names.flatMap(c => Seq(
          min(numeric(c)).as(s"mn_$c"), max(numeric(c)).as(s"mx_$c")))
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        names.zipWithIndex.map { case (c, i) =>
          val mn = if (r.isNullAt(2 * i)) 0.0 else r.getDouble(2 * i)
          val mx = if (r.isNullAt(2 * i + 1)) 0.0 else r.getDouble(2 * i + 1)
          c -> (mn, mx)
        }.toMap
      }
    val ranks = fields.map { f =>
      stats.get(f.name) match {
        case Some((mn, mx)) => rankNumeric(numeric(f.name), mn, mx, bits)
        case None => rankHash(col(f.name), bits)
      }
    }
    interleave(ranks, bits)
  }

  /** Data-skipping accounting from parquet FILE footers: of the files under
    * `dir`, how many have `column` min/max stats overlapping [lo, hi] —
    * i.e. how many a stats-pruning scan must actually read. Returns
    * (overlapping, total). This is the measurement the layout exists for;
    * `ZOrderSpec` and the ScaleProbe sweep both read it. */
  def overlappingFiles(dir: String, column: String,
                       lo: Long, hi: Long): (Int, Int) = {
    import scala.jdk.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration()
    val bounds = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getPath), conf))
        try {
          val stats = r.getFooter.getBlocks.asScala.flatMap(
            _.getColumns.asScala
              .find(_.getPath.toDotString == column).map(_.getStatistics))
          (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue()).min,
            stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue()).max)
        } finally r.close()
      }
    (bounds.count { case (mn, mx) => mx >= lo && mn <= hi }, bounds.size)
  }

  /** Re-layout `df` along the z-curve of `cols`: range-partition into
    * `partitions` output files, sort within each by the z-value, drop the
    * helper column. Row content is IDENTICAL to the input — only file
    * boundaries and row order move, which is what makes every clustered
    * column's min/max stats tight. */
  def cluster(df: DataFrame, cols: Seq[String], partitions: Int,
              bits: Int = 12): DataFrame = {
    val z = zValue(df, cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
