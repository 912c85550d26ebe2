package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for training-data pipelines — all composed
  * from codegen'd built-in functions (no UDFs), so they stay inside
  * whole-stage codegen and scale linearly with partitions.
  *
  * Every function has an exact DuckDB-SQL equivalent (see
  * graft.queries.PipelineQueries oracles) so results are hash-verifiable.
  */
object TextFunctions {

  /** whitespace tokens, single-space semantics (= DuckDB string_split(t,' ')) */
  def tokens(text: Column): Column = split(text, " ")

  /** 60-bit stable hash: first 15 hex chars of md5(salt:value). Positive in
    * a signed 64-bit int in every engine (Spark, DuckDB, Trino all parse it
    * identically), which is why we use 60 and not 64 bits. */
  def hash60(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), c)), 1, 15), 16, 10)
      .cast("long")

  /** distinct 3-word shingles over a token-array column named `toksCol` */
  def wordShingles3(toksCol: String): Column =
    expr(s"array_distinct(transform(sequence(1, size($toksCol) - 2), " +
      s"i -> concat(element_at($toksCol, i), ' ', " +
      s"element_at($toksCol, i + 1), ' ', " +
      s"element_at($toksCol, i + 2))))")

  /** MinHash signature: one 30-bit base hash per shingle (single md5), then
    * the affine-mod family h_i(x) = (x*(2i+1) + i*40503) mod p, p prime —
    * the standard one-hash minhash construction (the mod makes each h_i
    * non-monotone in x, so components are not collapsed onto one shingle).
    * 16× less hashing than independent md5s, and no 64-bit overflow (DuckDB
    * checks overflow, so intermediates must stay < 2^35). Pure per-row
    * expression — no shuffle. */
  /** signature as ONE native fold ([[MinhashSigFold]] — compiled loop, one
    * md5 per shingle, no intermediate arrays; the HOF formulation this
    * replaces was interpreted and allocated a zipped accumulator per
    * shingle). */
  def minhashSignature(shinglesCol: String, numHashes: Int): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      MinhashSigFold(org.apache.spark.sql.graftshim.GraftSql
        .expression(col(shinglesCol)), numHashes))

  /** sorted distinct-token hash set ([[TokenSetHashFold]]) — the per-doc
    * representation the Jaccard verify stage merges linearly */
  def tokenSetHash(arr: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      TokenSetHashFold(org.apache.spark.sql.graftshim.GraftSql
        .expression(arr)))

  /** |a ∩ b| of two sorted long arrays ([[SortedIntersectCount]]) — the
    * per-pair inner loop of exact-Jaccard verification */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      SortedIntersectCount(
        org.apache.spark.sql.graftshim.GraftSql.expression(a),
        org.apache.spark.sql.graftshim.GraftSql.expression(b)))

  /** per-token 60-bit hashes `hash60(prefix || t)` as one compiled pass
    * ([[TokenHash60Fold]]) — the map-side cost of SimHash fingerprinting */
  def tokenHash60Arr(arr: Column, prefix: String): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      TokenHash60Fold(org.apache.spark.sql.graftshim.GraftSql
        .expression(arr), prefix))

  /** 60-bit SimHash over per-token hash60s (per-bit majority vote,
    * unweighted) — native fold ([[Simhash60Fold]]); the HOF original
    * re-scanned the hash array 60 times per row, interpreted. */
  def simhash60(hashesCol: String): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      Simhash60Fold(org.apache.spark.sql.graftshim.GraftSql
        .expression(col(hashesCol))))

  val stopwords: Seq[String] = Seq("the", "of", "and", "to", "a", "in", "is")

  /** membership count over a literal word set, one compiled pass
    * ([[TokenCountInFold]]) */
  def tokenCountIn(arr: Column, values: Seq[String]): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      TokenCountInFold(org.apache.spark.sql.graftshim.GraftSql
        .expression(arr), values))

  /** fraction of tokens that are stopwords */
  def stopwordRatio(toksCol: String): Column =
    tokenCountIn(col(toksCol), stopwords) /
      size(col(toksCol)).cast("double")

  /** fraction of characters that are neither alphanumeric nor space */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))) /
      length(text).cast("double")

  /** marker-word language ID: count hits from a tiny per-language lexicon,
    * argmax with deterministic tie-break order (n-gram-heuristic family). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "et", "une"))

  def langScores(toksCol: String): Seq[(String, Column)] =
    langMarkers.map { case (lang, ws) =>
      lang -> tokenCountIn(col(toksCol), ws)
    }

  /** canonical document fingerprint: md5 of the sorted distinct token set */
  def fingerprint(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** Rabin-Karp-style rolling hash over the raw characters:
    * fold (acc * 31 + code) mod 1e9+7. Order-sensitive (unlike the set
    * fingerprint) — detects byte-level duplicates cheaply in one pass.
    * Native fold ([[RollingHashFold]]); the HOF original materialized a
    * char-index sequence and substring'd per character, interpreted. */
  def rollingHash(textCol: String): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      RollingHashFold(org.apache.spark.sql.graftshim.GraftSql
        .expression(col(textCol))))

  /** winnowing fingerprints (distinct window-of-w minima over k-gram
    * hash60s, ascending) as one compiled pass ([[WinnowFpFold]]) — the
    * per-position explode + window-min + distinct plan, map-side */
  def winnowFingerprints(toks: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      WinnowFpFold(org.apache.spark.sql.graftshim.GraftSql
        .expression(toks), k, w))

  /** content-defined chunk texts (gear boundary: gram hash60 ≡ 0 mod div,
    * boundary gram closes its chunk) as one compiled pass
    * ([[CdcChunkFold]]) — replaces explode + two windows + slice join */
  def cdcChunks(toks: Column, k: Int, div: Int): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      CdcChunkFold(org.apache.spark.sql.graftshim.GraftSql
        .expression(toks), k, div))

  /** per-doc hashed-bigram feature histogram (DSIR features) as one
    * compiled pass ([[BigramFeatureCountFold]]) — replaces a per-position
    * explode + interpreted md5 + corpus-token-scale hash agg */
  def bigramFeatureCounts(toks: Column, nBuckets: Int): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      BigramFeatureCountFold(org.apache.spark.sql.graftshim.GraftSql
        .expression(toks), nBuckets))

  /** per-doc term-count map ([[TokenCountsFold]]) — exploding it yields
    * the (doc_id, w, c) base relation with NO (doc, word) shuffle */
  def tokenCounts(toks: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      TokenCountsFold(org.apache.spark.sql.graftshim.GraftSql
        .expression(toks)))

  /** per-doc DISTINCT k-token span hashes ([[SpanHashesFold]]) — the exact
    * multi-arg xxhash64 values, deduplicated map-side (no explode + no
    * (doc, hash) distinct exchange) */
  def spanHashes(toks: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      SpanHashesFold(org.apache.spark.sql.graftshim.GraftSql
        .expression(toks), k))
}
