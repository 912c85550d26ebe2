package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Similarity, TextFunctions => TF}

/** Training-data curation operators beyond the dedup/ANN/text batches:
  * denylist scrubbing, within-document repetition metrics (Gopher-style
  * repetition filters), global n-gram frequency, and greedy token packing
  * of documents into fixed-budget training chunks.
  *
  * Scale notes (100 TB thinking):
  *   - scrubbing and tokenization are pure per-row expressions — map-side,
  *     codegen'd, no shuffle;
  *   - repetition metrics shuffle once on (doc_id, word) with map-side
  *     partial counts, then once on doc_id — both keys are high-cardinality
  *     and skew-free;
  *   - n-gram counting is the canonical partial-agg workload: per-task
  *     hash maps absorb the Zipf head before the shuffle, so the exchange
  *     carries distinct-ngrams-per-task rows, not one row per token; the
  *     final top-k is TakeOrderedAndProject (no global sort);
  *   - token packing needs a GLOBAL running sum — done with the two-pass
  *     distributed prefix-sum ([[graft.operators.ScalableWindows
  *     .globalRunningSum]]): data-bearing windows stay partitioned, only
  *     one boundary row per bucket crosses the cluster.
  */
object TrainingDataQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** java.util.regex and RE2 agree on this subset: alternation + ASCII \b */
  private val denyPat = "\\b(customer|key|secret)\\b"

  /** Structured PII rule set for [[graft.operators.Pii]] — the
    * engine-portable regex subset (no lookaround, no backreferences:
    * java.util.regex and DuckDB's RE2 match these identically). Rule order
    * is FIXED and semantic (id before phone: an SSN-shaped token must not
    * be half-eaten by the phone rule; email first so a dotted mail domain
    * can never resurface as an IPv4 — `PiiSpec` proves the reversed order
    * leaks). */
  private val piiRules = Seq(
    graft.operators.Pii.Rule("email",
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    graft.operators.Pii.Rule("id", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[ID]"),
    graft.operators.Pii.Rule("phone", "\\b\\d{3}-\\d{4}\\b", "[PHONE]"),
    graft.operators.Pii.Rule("ip",
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // denylist scrub: count hits + fingerprint of the redacted text
    "pipe_scrub" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(denyPat), lit(0)))
          .as("n_hits"),
        md5(regexp_replace(col("text"), denyPat, "[REDACTED]"))
          .as("scrub_md5"))
        .orderBy("doc_id")),

    // STRUCTURED PII scrubbing (operators.Pii, the `piiRules` set):
    // per-class detection counts (email / id / phone / IPv4) +
    // class-tagged redaction + fingerprint of the scrubbed text — the
    // standard training-data privacy pass beyond a word denylist. The
    // fixture corpus carries no PII, so the query plants deterministic PII
    // derived from the row first (both engines build the identical planted
    // text); detection counts and the redaction fingerprint are then
    // hash-verified end to end. Pure per-row expression work — map-side,
    // no shuffle, the 100 TB-safe shape. pipe_pii_scrub is the rollup view
    // of the same operator with its default rules.
    "pipe_pii" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com"),
        when(col("doc_id") % 3 === 0, concat(lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, concat(lit(" ref 123-45-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0, concat(lit(" from 10.0."),
          (col("doc_id") % 256).cast("string"), lit("."),
          (col("doc_id") % 100).cast("string")))
          .otherwise(lit(""))).as("txt"))
      graft.operators.Pii.withCounts(planted, "txt", piiRules)
        .select(
          col("doc_id"), col("n_email"), col("n_id"), col("n_phone"),
          col("n_ip"),
          md5(graft.operators.Pii.scrubCol(col("txt"), piiRules))
            .as("pii_md5"))
        .orderBy("doc_id")
    }),

    // within-document repetition: duplicate-word ratio and top-word
    // fraction (the Gopher repetition-filter signals)
    "pipe_doc_repetition" -> ((s, dir) => {
      // per-doc counts in ONE map-side fold — no (doc, word) exchange
      val wc = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TF.tokenCounts(split(col("text"), " "))).as(Seq("w", "c")))
      wc.groupBy("doc_id")
        .agg(sum("c").as("n_words"), count(lit(1)).as("n_distinct"),
          max("c").as("top_c"))
        .select(
          col("doc_id"), col("n_words"), col("n_distinct"),
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_words"), 6)
            .as("dup_ratio"),
          round(col("top_c").cast("double") / col("n_words"), 6)
            .as("top_word_frac"))
        .orderBy("doc_id")
    }),

    // Gopher-style quality rule battery (Rae et al. 2021 appendix A1.1
    // shape): per-document signals + per-rule booleans + the composite keep
    // decision. One scan: the per-row signals (word count, mean word
    // length, stopword hits via the compiled membership fold) ride through
    // the word-count aggregation as grouping keys that are functionally
    // dependent on doc_id; per-doc word counts come from the map-side
    // TokenCountsFold, so the ONLY shuffle is the narrow doc rollup.
    // No second scan, no doc-level self-join.
    "pipe_gopher_rules" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(
        col("doc_id"), length(col("text")).as("tlen"),
        split(col("text"), " ").as("toks"))
      val d = base.select(col("doc_id"), col("tlen"),
          TF.tokenCountIn(col("toks"), TF.stopwords).cast("long").as("n_stop"),
          explode(TF.tokenCounts(col("toks"))).as(Seq("w", "c")))
        .groupBy("doc_id", "tlen", "n_stop")
        .agg(sum("c").as("n_words"), count(lit(1)).as("nd"),
          max("c").as("top_c"))
      val sig = d.select(
        col("doc_id"), col("n_words"),
        round((col("tlen") - col("n_words") + lit(1.0)) / col("n_words"), 6)
          .as("mean_wlen"),
        col("n_stop"),
        round(lit(1.0) - col("nd").cast("double") / col("n_words"), 6)
          .as("dup_ratio"),
        round(col("top_c").cast("double") / col("n_words"), 6)
          .as("top_word_frac"))
      sig
        .withColumn("r_len", col("n_words").between(25, 90))
        .withColumn("r_wlen", col("mean_wlen").between(4.0, 5.0))
        .withColumn("r_dup", col("dup_ratio") <= 0.65)
        .withColumn("r_top", col("top_word_frac") <= 0.15)
        .withColumn("r_stop", col("n_stop") >= 2)
        .withColumn("keep", col("r_len") && col("r_wlen") && col("r_dup") &&
          col("r_top") && col("r_stop"))
        .orderBy("doc_id")
    }),

    // fixed-size token chunking with overlap (context-window preparation:
    // 32-token chunks on a 24-token stride → 8 tokens of overlap carrying
    // context across boundaries). Pure map-side: sequence + explode + slice
    // inside one projection, no shuffle at all until the deterministic
    // output ordering — at 100 TB this is embarrassingly parallel and the
    // chunk count per task is bounded by tokens/stride.
    "pipe_chunk" -> ((s, dir) => {
      val (size_, stride) = (32, 24)
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(expr(s"sequence(0, int(floor((size(toks) - 1) / $stride)))"))
            .as("ci"))
        .select(
          col("doc_id"),
          col("ci").cast("long").as("chunk_idx"),
          slice(col("toks"), col("ci") * stride + 1, lit(size_)).as("chunk"))
        .select(
          col("doc_id"), col("chunk_idx"),
          size(col("chunk")).cast("long").as("chunk_len"),
          md5(array_join(col("chunk"), " ")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // global bigram frequency, top 50 (tie-broken on the ngram text).
    // Shape: explode POSITIONS and concat at the top level of the
    // projection — never explode(zip_with(...)): a generator over a
    // computed array re-evaluates its interpreted lambda child per
    // emitted row, O(len²) per doc (the dedup_spans lesson, BASELINE.md)
    "pipe_ngram_topk" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(split(col("text"), " ").as("l"))
      toks.filter(size(col("l")) >= 2)
        .select(col("l"), explode(expr("sequence(1, size(l) - 1)")).as("i"))
        .select(concat(element_at(col("l"), col("i")), lit(" "),
          element_at(col("l"), col("i") + 1)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(50)
    }),

    // span-level dedup: distinct 16-token spans of each doc that also
    // appear in another doc (exact substring duplication across the
    // corpus — what document-level near-dup misses for copied paragraphs)
    "dedup_spans" -> ((s, dir) =>
      graft.operators.Dedup.duplicateSpans(
          t(s, dir, "documents"), "doc_id", "text", k = 16)
        .orderBy("doc_id")),

    // span-level dedup ACTION: tokens covered by a cross-corpus duplicated
    // 16-token span are removed; output proves the scrubbed text itself
    // (md5), not just counts
    "dedup_span_scrub" -> ((s, dir) =>
      graft.operators.Dedup.scrubDuplicateSpans(
          t(s, dir, "documents"), "doc_id", "text", k = 16)
        .orderBy("doc_id")),

    // deterministic weighted sampling (Efraimidis–Spirakis): key
    // −ln(u)/w with u derived from the doc's md5 hash — reproducible on
    // any cluster size and engine. One map-side key computation + a
    // top-k (TakeOrderedAndProject); the rank window runs over only the
    // 20 survivors. Longer docs (w = n_chars) are proportionally more
    // likely to be kept — the standard size-weighted corpus sample.
    "pipe_weighted_sample" -> ((s, dir) => {
      val keyed = t(s, dir, "documents").select(
        col("doc_id"), col("n_chars"),
        (-log((pmod(Similarity.hash60(col("doc_id").cast("string")),
          lit(1000000L)) + lit(0.5)) / 1000000.0) / col("n_chars"))
          .as("es_key"))
      keyed.orderBy(col("es_key"), col("doc_id")).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("es_key"), col("doc_id"))))
        .select(col("doc_id"), col("n_chars"),
          round(col("es_key"), 9).as("es_key"), col("rank"))
        .orderBy(col("es_key"), col("doc_id"))
    }),

    // greedy sequential packing: chunk_id = (tokens before this doc) div
    // budget — contiguous doc runs of ~2048 tokens, the shape a training
    // loader consumes. The global cumsum is the distributed prefix sum.
    "pipe_token_pack" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      val cum = graft.operators.ScalableWindows.globalRunningSum(
        docs, "doc_id", 1000L, "n_tok", "cum_tok")
      cum
        .withColumn("chunk_id", expr("(cum_tok - n_tok) div 2048"))
        .groupBy("chunk_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("chunk_id")
    }),

    // Sharded EXPORT with a read-back manifest — the delivery step of a
    // training-data pipeline: docs land in hash-assigned shard dirs (the
    // deterministic assignment any worker can recompute), ONE file per
    // shard (each shard's rows collapse to one task before the
    // partitioned write), and the manifest a loader consumes (per shard:
    // doc/token counts, id range, order-invariant content checksum) is
    // aggregated from the WRITTEN files, not the input — a sink that
    // lost, duplicated, or cross-assigned a row breaks the oracle hash.
    // The checksum sums bounded residues (hash60 % 1e9): order-invariant
    // under any task arrangement and overflow-safe under ANSI at any
    // corpus size.
    "pipe_shard_write" -> ((s, dir) => {
      val nShards = 8
      val out = graft.Scratch.dir("graft_shard_write")
      val d = t(s, dir, "documents")
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
        .withColumn("shard", pmod(Similarity.hash60(
          concat(lit("shard:"), col("doc_id").cast("string"))),
          lit(nShards.toLong)).cast("int"))
      d.select("doc_id", "lang", "source", "n_tok", "shard", "text")
        .repartition(col("shard")) // each shard wholly in one task
        .write.partitionBy("shard").mode("overwrite").parquet(out)
      s.read.parquet(out).groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").cast("long").as("n_tokens"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"),
          sum(pmod(Similarity.hash60(col("text")), lit(1000000000L)))
            .cast("long").as("content_sum"))
        .orderBy("shard")
    }),

    // mixture planning under a token budget: each source gets a
    // temperature-flattened share (w ∝ tokens^0.7) of half the corpus's
    // tokens, capped at 4 epochs of its own data — the per-source epoch
    // table a training scheduler consumes (the Chinchilla-style "how many
    // times do we repeat each slice" decision). Everything after the
    // per-source token count (one partial-agg shuffle on `source`) is a
    // 20-row broadcast computation; budget and normalizer are 1-row
    // aggregates, so the plan size is constant in corpus size.
    "pipe_token_budget" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
        .groupBy("source").agg(sum("n_tok").as("n_tok"))
      // z accumulates in 1e-6 INTEGER units: a distributed double sum
      // merges partials in fetch order and an ulp wobble at floor()/
      // threshold boundaries would flip output integers (DETERMINISM.md
      // rule 6b); the integer sum is order-invariant and exact
      val tot = tok.agg(
        floor(lit(0.5) * sum(col("n_tok"))).cast("long").as("budget"),
        (sum(round(pow(col("n_tok"), 0.7) * 1e6, 0).cast("long"))
          .cast("double") / 1e6).as("z"))
      tok.crossJoin(broadcast(tot))
        .withColumn("raw",
          col("budget") * pow(col("n_tok"), 0.7) / col("z"))
        .select(col("source"), col("n_tok"),
          round(least(lit(4.0), col("raw") / col("n_tok")), 6).as("epochs"),
          floor(least(col("raw"), lit(4.0) * col("n_tok"))).cast("long")
            .as("alloc_tokens"))
        .orderBy("source")
    }),

    // mixture REALIZATION: turn the per-source epoch targets into actual
    // repeated rows — repeat = floor(epochs) copies per doc plus one more
    // when the doc's own hash falls under the fractional remainder, so the
    // realized corpus hits the target in expectation and is IDENTICAL at
    // any parallelism. The repetition is a map-side `explode(sequence)` —
    // rows multiply in place, nothing shuffles until the per-source audit
    // aggregate; docs with repeat = 0 are dropped before the explode
    // (Spark's `sequence(1, 0)` would step DOWNWARD, not return empty).
    "pipe_mixture_realize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      val tok = docs.groupBy("source").agg(sum("n_tok").as("src_tok"))
      // z in 1e-6 integer units — same order-invariance argument as
      // pipe_token_budget (the repeat threshold consumes it unrounded)
      val tot = tok.agg(
        floor(lit(0.5) * sum(col("src_tok"))).cast("long").as("budget"),
        (sum(round(pow(col("src_tok"), 0.7) * 1e6, 0).cast("long"))
          .cast("double") / 1e6).as("z"))
      val ep = tok.crossJoin(broadcast(tot))
        .select(col("source"), col("src_tok"),
          least(lit(4.0), col("budget") * pow(col("src_tok"), 0.7) /
            col("z") / col("src_tok")).as("epochs"))
      val u = (pmod(Similarity.hash60(col("doc_id").cast("string")),
        lit(1000000L)) + lit(0.5)) / 1000000.0
      val rep = docs.join(broadcast(ep), "source")
        .withColumn("repeat",
          (floor(col("epochs")) +
            when(u < col("epochs") - floor(col("epochs")), 1.0)
              .otherwise(0.0)).cast("long"))
      val audit = rep.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), max("src_tok").as("src_tok"),
          round(max(col("epochs")), 6).as("target_epochs"))
      val realized = rep.filter(col("repeat") >= 1L)
        .select(col("source"), col("n_tok"),
          explode(expr("sequence(1L, repeat)")).as("copy"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_rows"),
          sum("n_tok").as("n_tok_realized"))
      audit.join(realized, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          coalesce(col("n_tok_realized"), lit(0L)).as("n_tok_realized"),
          round(coalesce(col("n_tok_realized"), lit(0L))
            .cast("double") / col("src_tok"), 6).as("realized_epochs"),
          col("target_epochs"))
        .orderBy("source")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "pipe_scrub" -> """
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\b(customer|key|secret)\b'))
                  AS INTEGER) AS n_hits,
             md5(regexp_replace(text, '\b(customer|key|secret)\b',
                                '[REDACTED]', 'g')) AS scrub_md5
      FROM documents ORDER BY doc_id""",

    "pipe_pii" -> """
      WITH p AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 || CASE WHEN doc_id % 3 = 0
                         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                         ELSE '' END
                 || CASE WHEN doc_id % 5 = 0
                         THEN ' ref 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                         ELSE '' END
                 || CASE WHEN doc_id % 4 = 0
                         THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                              || '.' || CAST(doc_id % 100 AS VARCHAR)
                         ELSE '' END AS txt
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(txt,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
             CAST(len(regexp_extract_all(txt, '\b\d{3}-\d{2}-\d{4}\b')) AS INTEGER) AS n_id,
             CAST(len(regexp_extract_all(txt, '\b\d{3}-\d{4}\b')) AS INTEGER) AS n_phone,
             CAST(len(regexp_extract_all(txt,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ip,
             md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(txt,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\b\d{3}-\d{2}-\d{4}\b', '[ID]', 'g'),
               '\b\d{3}-\d{4}\b', '[PHONE]', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')) AS pii_md5
      FROM p ORDER BY doc_id""",

    "pipe_doc_repetition" -> """
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      wc AS (
        SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
      d AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
               count(*) AS n_distinct, max(c) AS top_c
        FROM wc GROUP BY doc_id)
      SELECT doc_id, n_words, n_distinct,
             round(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 6) AS dup_ratio,
             round(CAST(top_c AS DOUBLE) / n_words, 6) AS top_word_frac
      FROM d ORDER BY doc_id""",

    "pipe_gopher_rules" -> """
      WITH base AS (
        SELECT doc_id, length(text) AS tlen, string_split(text, ' ') AS toks
        FROM documents),
      w AS (
        SELECT doc_id, tlen,
               CAST(len(list_filter(toks,
                 t -> t IN ('the','of','and','to','a','in','is'))) AS BIGINT)
                 AS n_stop,
               unnest(toks) AS w
        FROM base),
      wc AS (SELECT doc_id, tlen, n_stop, w, count(*) AS c
             FROM w GROUP BY 1, 2, 3, 4),
      d AS (SELECT doc_id, tlen, n_stop, CAST(sum(c) AS BIGINT) AS n_words,
                   count(*) AS nd, max(c) AS top_c
            FROM wc GROUP BY 1, 2, 3),
      sig AS (
        SELECT doc_id, n_words,
               round((tlen - n_words + 1.0) / n_words, 6) AS mean_wlen,
               n_stop,
               round(1.0 - CAST(nd AS DOUBLE) / n_words, 6) AS dup_ratio,
               round(CAST(top_c AS DOUBLE) / n_words, 6) AS top_word_frac
        FROM d)
      SELECT doc_id, n_words, mean_wlen, n_stop, dup_ratio, top_word_frac,
             (n_words BETWEEN 25 AND 90) AS r_len,
             (mean_wlen BETWEEN 4.0 AND 5.0) AS r_wlen,
             (dup_ratio <= 0.65) AS r_dup,
             (top_word_frac <= 0.15) AS r_top,
             (n_stop >= 2) AS r_stop,
             ((n_words BETWEEN 25 AND 90) AND (mean_wlen BETWEEN 4.0 AND 5.0)
              AND dup_ratio <= 0.65 AND top_word_frac <= 0.15
              AND n_stop >= 2) AS keep
      FROM sig ORDER BY doc_id""",

    "pipe_chunk" -> """
      WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      c AS (
        SELECT doc_id, i.i AS chunk_idx,
               toks[(i.i * 24 + 1):(i.i * 24 + 32)] AS chunk
        FROM base, (SELECT unnest(range(0, 1000)) AS i) i
        WHERE i.i * 24 < len(toks))
      SELECT doc_id, chunk_idx,
             CAST(len(chunk) AS BIGINT) AS chunk_len,
             md5(array_to_string(chunk, ' ')) AS chunk_md5
      FROM c ORDER BY doc_id, chunk_idx""",

    "pipe_ngram_topk" -> """
      WITH toks AS (SELECT string_split(text, ' ') AS l FROM documents),
      bg AS (
        SELECT unnest(list_transform(generate_series(1, len(l) - 1),
                                     i -> l[i] || ' ' || l[i + 1])) AS bigram
        FROM toks)
      SELECT bigram, count(*) AS n
      FROM bg GROUP BY bigram
      ORDER BY n DESC, bigram LIMIT 50""",

    "dedup_spans" -> """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sp AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 15),
                      i -> array_to_string(w[i:i+15], ' '))) AS s
        FROM t WHERE len(w) >= 16),
      tot AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY doc_id),
      sh AS (SELECT s FROM sp GROUP BY s HAVING count(*) >= 2),
      d AS (SELECT doc_id, count(*) AS n_dup_spans
            FROM sp JOIN sh USING (s) GROUP BY doc_id)
      SELECT doc_id, CAST(n_spans AS INTEGER) AS n_spans, n_dup_spans,
             round(CAST(n_dup_spans AS DOUBLE) / n_spans, 6) AS dup_span_ratio
      FROM d JOIN tot USING (doc_id) ORDER BY doc_id""",

    "dedup_span_scrub" -> """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sp AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 15),
                      i -> array_to_string(w[i:i+15], ' '))) AS s
        FROM t WHERE len(w) >= 16),
      dup AS (SELECT s FROM sp GROUP BY s HAVING count(*) >= 2),
      tr AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS j FROM t),
      fl AS (
        SELECT tr.doc_id, tr.j, tr.w[tr.j] AS tok,
               CASE WHEN tr.j <= len(tr.w) - 15
                         AND array_to_string(tr.w[tr.j:tr.j+15], ' ')
                             IN (SELECT s FROM dup)
                    THEN 1 ELSE 0 END AS flag
        FROM tr),
      cov AS (
        SELECT doc_id, j, tok,
               max(flag) OVER (PARTITION BY doc_id ORDER BY j
                               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
                 AS covered
        FROM fl)
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(covered) AS BIGINT) AS n_removed,
             md5(coalesce(string_agg(tok, ' ' ORDER BY j)
                            FILTER (WHERE covered = 0), '')) AS scrub_md5
      FROM cov GROUP BY doc_id ORDER BY doc_id""",

    "pipe_weighted_sample" -> """
      WITH k AS (
        SELECT doc_id, n_chars,
               -ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     % 1000000) + 0.5) / 1000000.0) / n_chars AS es_key
        FROM documents),
      top AS (SELECT * FROM k ORDER BY es_key, doc_id LIMIT 20)
      SELECT doc_id, n_chars, round(es_key, 9) AS es_key,
             CAST(row_number() OVER (ORDER BY es_key, doc_id) AS INTEGER) AS rank
      FROM top ORDER BY es_key, doc_id""",

    "pipe_token_pack" -> """
      WITH c AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               CAST(sum(len(string_split(text, ' ')))
                    OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_tok
        FROM documents)
      SELECT (cum_tok - n_tok) // 2048 AS chunk_id,
             count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM c GROUP BY 1 ORDER BY chunk_id""",

    // the manifest recomputed straight from the input — the Spark side
    // aggregates it from the files it WROTE, so equality certifies the
    // export round-trip, not just the assignment arithmetic
    "pipe_shard_write" -> """
      WITH d AS (
        SELECT doc_id, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               CAST(('0x' || substr(md5('shard:' || doc_id), 1, 15))::BIGINT
                    % 8 AS INTEGER) AS shard
        FROM documents)
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             min(doc_id) AS min_doc, max(doc_id) AS max_doc,
             CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT
                      % 1000000000) AS BIGINT) AS content_sum
      FROM d GROUP BY shard ORDER BY shard""",

    "pipe_token_budget" -> """
      WITH tok AS (
        SELECT source,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        FROM documents GROUP BY source),
      tot AS (
        SELECT CAST(floor(0.5 * sum(n_tok)) AS BIGINT) AS budget,
               sum(CAST(round(pow(n_tok, 0.7) * 1e6, 0) AS BIGINT)) / 1e6 AS z
        FROM tok),
      r AS (
        SELECT source, n_tok,
               budget * pow(n_tok, 0.7) / z AS raw
        FROM tok CROSS JOIN tot)
      SELECT source, n_tok,
             round(least(4.0, raw / n_tok), 6) AS epochs,
             CAST(floor(least(raw, 4.0 * n_tok)) AS BIGINT) AS alloc_tokens
      FROM r ORDER BY source""",

    "pipe_mixture_realize" -> """
      WITH d AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      tok AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tok
              FROM d GROUP BY source),
      tot AS (SELECT CAST(floor(0.5 * sum(src_tok)) AS BIGINT) AS budget,
                     sum(CAST(round(pow(src_tok, 0.7) * 1e6, 0) AS BIGINT)) / 1e6 AS z
              FROM tok),
      ep AS (SELECT source, src_tok,
                    least(4.0, budget * pow(src_tok, 0.7) / z / src_tok)
                      AS epochs
             FROM tok CROSS JOIN tot),
      rep AS (
        SELECT d.source, d.n_tok, ep.src_tok, ep.epochs,
               CAST(floor(epochs) + CASE WHEN
                 ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   ::BIGINT % 1000000) + 0.5) / 1000000.0
                 < epochs - floor(epochs) THEN 1 ELSE 0 END AS BIGINT)
                 AS repeat
        FROM d JOIN ep USING (source)),
      audit AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               max(src_tok) AS src_tok,
               round(max(epochs), 6) AS target_epochs
        FROM rep GROUP BY source),
      realized AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(n_tok) AS BIGINT) AS n_tok_realized
        FROM (SELECT source, n_tok,
                     unnest(generate_series(1, repeat)) AS copy
              FROM rep WHERE repeat >= 1)
        GROUP BY source)
      SELECT a.source, a.n_docs,
             coalesce(r.n_rows, 0) AS n_rows,
             coalesce(r.n_tok_realized, 0) AS n_tok_realized,
             round(CAST(coalesce(r.n_tok_realized, 0) AS DOUBLE)
               / a.src_tok, 6) AS realized_epochs,
             a.target_epochs
      FROM audit a LEFT JOIN realized r ON a.source = r.source
      ORDER BY a.source"""
  )
}
