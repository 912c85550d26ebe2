package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._

/** Bloom-prefiltered EXACT incremental dedup: new-batch rows whose content
  * hash is definitely absent from the indexed corpus skip the verify join
  * entirely; only maybe-present rows (true duplicates + the fpp share of
  * false positives) join against the corpus hashes. Because a Bloom filter
  * has no false negatives, the result is bit-identical to the plain
  * anti-join — the filter changes the PLAN, not the answer, which is why
  * the oracle for [[graft.queries.PipelineQueries]]'s `dedup_bloom` is the
  * exact NOT EXISTS query.
  *
  * Scale shape: in steady-state ingestion almost every arriving document is
  * new, so the anti-join (which shuffles the full batch AND the corpus-hash
  * side) does almost all its work to discover nothing. The Bloom pass
  * reduces the join input to `dup_rate + fpp` of the batch at the cost of
  * one broadcast bitmap and a map-side probe per row (the probe is a
  * codegen'd Catalyst `BloomFilterMightContain` over `xxhash64`, the same
  * expression Spark's runtime row-group filtering injects).
  *
  * Sizing: bits ≈ −n·ln(fpp)/ln²2 ≈ 1.2 GB per 10⁹ corpus docs at 1% —
  * broadcastable to ~1B indexed docs. Past that the filter shards with the
  * corpus (one Bloom per hash-bucket of the index, batch rows probe their
  * bucket's filter), which keeps every probe local; the single-filter form
  * here is the building block.
  */
object BloomDedup {

  /** `might_contain(serializedBloom, value)` as a Column — the codegen'd
    * probe expression over a plan-time filter literal. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    GraftSql.column(BloomFilterMightContain(
      Literal(bloomBytes), GraftSql.expression(value)))

  /** Batch rows whose `textCol` content does not occur in `corpus` —
    * result-identical to `batch LEFT ANTI JOIN corpus ON md5(text)`.
    *
    * `expectedItems` sizes the Bloom filter; pass the corpus cardinality
    * estimate (an undersized filter only raises the false-positive rate —
    * more rows take the verify join — never changes the result). */
  def newDocs(batch: DataFrame, corpus: DataFrame,
              textCol: String, expectedItems: Long,
              fpp: Double = 0.01): DataFrame = {
    // one corpus pass builds the filter (distributed tree-aggregate of
    // partial Blooms — the driver holds only the final bitmap)
    val bf = corpus.select(xxhash64(col(textCol)).as("__k"))
      .stat.bloomFilter("__k", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    // NULL text makes the probe indeterminate (NULL) — route those rows to
    // the verify join, where md5(NULL)=NULL never equi-matches and the
    // LEFT ANTI keeps them, exactly as the plain anti-join would
    val probe = coalesce(
      mightContain(bos.toByteArray, xxhash64(col(textCol))), lit(true))

    val b = graft.Caches.tracked(batch.withColumn("__maybe", probe))
    val definitelyNew = b.filter(!col("__maybe")).drop("__maybe")
    // only the maybe-set reaches the exact verify; md5 (not xxhash64) is
    // the verify key so a 64-bit hash collision cannot drop a novel doc
    // beyond what the 128-bit key already bounds
    val verified = b.filter(col("__maybe")).drop("__maybe")
      .join(corpus.select(md5(col(textCol)).as("__h")).distinct(),
        md5(col(textCol)) === col("__h"), "left_anti")
    definitelyNew.unionByName(verified)
  }

  /** SHARDED Bloom prefilter — the >10⁹-doc path [[newDocs]]'s Scaladoc
    * promises: one Bloom filter PER HASH BUCKET of the corpus, built
    * distributed (`groupBy(bucket)` + the same `BloomFilterAggregate`
    * Spark's runtime row-group filtering uses) and probed CO-PARTITIONED —
    * no node ever holds more than one bucket's bitmap, and the driver
    * never holds any:
    *
    *   1. bucket = pmod(xxhash64(text), buckets) on BOTH sides (equal text
    *      ⇒ equal bucket, so a duplicate always probes the filter that
    *      indexed its donor);
    *   2. the `buckets`-row bloom frame and the batch UNION into one
    *      tagged frame, hash-repartitioned by bucket and sorted within
    *      partitions by (bucket, kind) so each bucket's bloom row
    *      immediately precedes its batch rows;
    *   3. one streaming pass per partition deserializes the current
    *      bucket's filter ONCE and probes rows against it (`mapPartitions`
    *      — deliberate: the per-partition "load one sketch, stream rows"
    *      topology has no Column-API equivalent, the probe expression
    *      requires a foldable filter). A bucket with no corpus rows has no
    *      bloom row — its batch rows are definitely new (equal text would
    *      have landed a corpus row in the bucket).
    *
    * Same exactness contract as [[newDocs]]: the maybe-set still passes
    * the md5 verify anti-join, so the result is bit-identical to the plain
    * `LEFT ANTI` — the oracle for `dedup_bloom_sharded` is the same
    * NOT EXISTS query. At 10⁹ docs and 1% fpp, 64 buckets hold ~19 MB per
    * task instead of one 1.2 GB driver bitmap; buckets scale with the
    * corpus so per-task memory stays flat (ScaleProbe sweep in
    * BASELINE.md).
    *
    * `expectedItemsPerBucket` sizes each bucket's filter (corpus estimate
    * ÷ buckets; undersizing only raises fpp, never changes the result). */
  def newDocsSharded(batch: DataFrame, corpus: DataFrame, textCol: String,
                     expectedItemsPerBucket: Long, fpp: Double = 0.01,
                     buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val bucketOf = pmod(xxhash64(col(textCol)), lit(buckets.toLong)).cast("int")
    val blooms = bucketBlooms(corpus, textCol, expectedItemsPerBucket, fpp,
      buckets)

    val payloadT = StructType(batch.schema.fields)
    val tagged = blooms
      .select(col("__b"), lit(0).as("__kind"), col("__bloom"),
        lit(null).cast("long").as("__k"),
        lit(null).cast(payloadT).as("__p"))
      .unionByName(batch.select(bucketOf.as("__b"), lit(1).as("__kind"),
        lit(null).cast("binary").as("__bloom"),
        xxhash64(col(textCol)).as("__k"),
        struct(batch.columns.map(col).toIndexedSeq: _*).as("__p")))
      .repartition(buckets, col("__b"))
      .sortWithinPartitions("__b", "__kind")

    val outT = StructType(payloadT.fields :+ StructField("__maybe", BooleanType))
    // tracked-cache like newDocs' `b`: both output branches read `probed`,
    // and without the cache the repartition→sort→probe subtree would
    // execute once per branch (ReusedExchange shares only the shuffle)
    val probed = graft.Caches.tracked(tagged.mapPartitions { it =>
      var curBucket = Int.MinValue
      var curBloom: org.apache.spark.util.sketch.BloomFilter = null
      it.flatMap { r =>
        val b = r.getInt(0)
        if (r.getInt(1) == 0) { // bloom row: becomes the bucket's filter
          curBucket = b
          curBloom = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
          Iterator.empty
        } else {
          val maybe = b == curBucket && curBloom != null &&
            curBloom.mightContainLong(r.getLong(3))
          val p = r.getStruct(4)
          Iterator.single(Row.fromSeq(p.toSeq :+ maybe))
        }
      }
    }(Encoders.row(outT)))

    val definitelyNew = probed.filter(!col("__maybe")).drop("__maybe")
    val verified = probed.filter(col("__maybe")).drop("__maybe")
      .join(corpus.select(md5(col(textCol)).as("__h")).distinct(),
        md5(col(textCol)) === col("__h"), "left_anti")
    definitelyNew.unionByName(verified)
  }

  /** (`__b`, `__bloom`): one serialized Bloom filter per hash bucket of
    * `corpus`, built with a distributed group-aggregate — also the probe
    * surface the ScaleProbe memory sweep measures (`length(__bloom)`). */
  def bucketBlooms(corpus: DataFrame, textCol: String,
                   expectedItemsPerBucket: Long, fpp: Double,
                   buckets: Int): DataFrame = {
    val bucketOf = pmod(xxhash64(col(textCol)), lit(buckets.toLong)).cast("int")
    // standard sizing: bits = -n ln(fpp) / ln²2
    val numBits = math.max(64L,
      math.ceil(-expectedItemsPerBucket.toDouble * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)
    val bloomAgg = GraftSql.column(
      new BloomFilterAggregate(
        GraftSql.expression(xxhash64(col(textCol))),
        Literal(expectedItemsPerBucket), Literal(numBits), 0, 0)
        .toAggregateExpression())
    corpus.groupBy(bucketOf.as("__b")).agg(bloomAgg.as("__bloom"))
  }
}
