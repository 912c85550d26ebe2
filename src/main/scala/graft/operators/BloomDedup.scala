package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSql

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
}
