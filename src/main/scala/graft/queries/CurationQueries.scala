package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Similarity

/** Corpus-curation operators round 5: model-based quality filtering,
  * snapshot diffing for incremental ingestion, temperature-rescaled
  * language mixtures, and cluster-balanced subset selection.
  *
  * Scale notes (100 TB thinking):
  *   - the quality classifier is a LINEAR model whose weights fold into the
  *     projection as literals — scoring is pure map-side codegen'd
  *     expression work, zero shuffles for the score+filter path (the same
  *     seam a fastText/regression quality model exports to);
  *   - corpus diff shuffles ONLY (doc_id, md5) pairs — 40 bytes/row however
  *     wide the documents are, because the content hash is computed
  *     map-side before the full-outer join; on a bucketed store the join
  *     is co-located and the diff is shuffle-free;
  *   - the language-mixture weights are a per-language aggregate (5 rows)
  *     joined back by broadcast — the keep/drop decision is then map-side
  *     and deterministic in the doc's own hash, so any cluster size
  *     produces the identical sample;
  *   - balanced sampling partitions its window by cluster label — per-label
  *     top-k, never a global sort.
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Literal weights of the quality model (stand-in for an exported
    * regression/fastText quality classifier — the seam is the point:
    * weights arrive as data, scoring is map-side expression work). */
  private val W0 = -1.2; private val W_LOGWORDS = 0.35
  private val W_DISTINCT = 1.8; private val W_STOP = -2.5
  private val W_AVGLEN = 0.1

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // model-based quality scoring: logistic over engineered features
    // (log length, lexical diversity, stopword ratio, mean word length).
    // All features are array expressions over one tokenization — no
    // explode, no shuffle; the filter threshold is part of the output so
    // the keep/drop decision is auditable.
    "pipe_quality_classifier" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val nW = size(toks).cast("double")
      val distinctRatio = size(array_distinct(toks)).cast("double") / nW
      val stopRatio = graft.functions.TextFunctions
        .tokenCountIn(toks, Seq("the", "a", "of")).cast("double") / nW
      val avgLen = col("n_chars").cast("double") / nW
      val z = lit(W0) + lit(W_LOGWORDS) * log(nW) +
        lit(W_DISTINCT) * distinctRatio + lit(W_STOP) * stopRatio +
        lit(W_AVGLEN) * avgLen
      t(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_words"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("quality"),
        (lit(1.0) / (lit(1.0) + exp(-z)) >= 0.6).as("keep"))
        .orderBy("doc_id")
    }),

    // corpus snapshot diff (incremental ingestion): old snapshot = docs
    // with doc_id % 7 <> 0, where doc_id % 5 = 0 carries a truncated
    // earlier revision; new snapshot = docs with doc_id % 11 <> 3.
    // Content hashes are computed map-side, so the full-outer join
    // shuffles narrow (doc_id, md5) rows; classification is a map-side
    // CASE over the join output.
    "pipe_corpus_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val old = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
        .select(col("doc_id").as("o_id"),
          md5(when(pmod(col("doc_id"), lit(5)) === 0,
            substring(col("text"), 1, 20)).otherwise(col("text")))
            .as("o_md5"))
      val neu = docs.filter(pmod(col("doc_id"), lit(11)) =!= 3)
        .select(col("doc_id").as("n_id"), md5(col("text")).as("n_md5"))
      old.join(neu, old("o_id") === neu("n_id"), "full_outer")
        .select(
          coalesce(col("o_id"), col("n_id")).as("doc_id"),
          when(col("o_id").isNull, "added")
            .when(col("n_id").isNull, "removed")
            .when(col("o_md5") =!= col("n_md5"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("status")
    }),

    // temperature-rescaled language mixture (the multilingual-pretraining
    // alpha-sampling scheme): keep probability per language is
    // c^alpha-proportional, clamped to 1; the keep decision is
    // deterministic in the doc's own hash so the sample is identical at
    // any parallelism. Weights are a 5-row aggregate broadcast back.
    "pipe_lang_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cnt = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val tot = cnt.agg(sum(pow(col("n"), 0.5)).as("z"))
      val w = cnt.crossJoin(broadcast(tot))
        .withColumn("p_keep",
          least(lit(1.0),
            pow(col("n"), 0.5) / col("z") * lit(2000.0) / col("n")))
        .select(col("lang"), col("n").as("n_orig"), col("p_keep"))
      val u = (pmod(Similarity.hash60(col("doc_id").cast("string")),
        lit(1000000L)) + lit(0.5)) / 1000000.0
      val kept = docs.join(broadcast(w), "lang").filter(u < col("p_keep"))
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
      w.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_orig"),
          round(col("p_keep"), 6).as("p_keep"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("lang")
    }),

    // curriculum binning: fixed-width deciles of the quality score with
    // per-bin doc/token mass — the "order training data easy→hard"
    // preparation step. Scoring is the classifier's map-side expression;
    // the aggregate key is 10 bins (partial agg absorbs everything).
    "pipe_curriculum" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val nW = size(toks).cast("double")
      val distinctRatio = size(array_distinct(toks)).cast("double") / nW
      val stopRatio = graft.functions.TextFunctions
        .tokenCountIn(toks, Seq("the", "a", "of")).cast("double") / nW
      val avgLen = col("n_chars").cast("double") / nW
      val z = lit(W0) + lit(W_LOGWORDS) * log(nW) +
        lit(W_DISTINCT) * distinctRatio + lit(W_STOP) * stopRatio +
        lit(W_AVGLEN) * avgLen
      t(s, dir, "documents")
        .withColumn("q", lit(1.0) / (lit(1.0) + exp(-z)))
        .withColumn("bin", least(floor(col("q") * 10), lit(9)).cast("int"))
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("n_tokens"),
          round(avg("q"), 6).as("avg_q"))
        .orderBy("bin")
    }),

    // cluster-balanced subset: equal representation per semantic cluster
    // (embeddings.label = the IVF coarse cluster), members picked by a
    // deterministic hash order. The window partitions by label — per-label
    // top-k, the scale-safe shape.
    "pipe_balanced_sample" -> ((s, dir) => {
      val rankW = Window.partitionBy("label")
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      t(s, dir, "embeddings").select(col("vec_id"), col("label"))
        .withColumn("rank", row_number().over(rankW))
        .filter(col("rank") <= 8)
        .orderBy("label", "rank")
    }),

    // per-source frequency capping (the web-curation "no domain dominates"
    // rule): every source keeps at most cap docs, members chosen by
    // deterministic hash rank so the kept set is identical at any
    // parallelism. The cap is DATA-RELATIVE (80% of the mean docs/source)
    // so it binds at every scale factor rather than only above a magic
    // constant. Scale shape: the rank window partitions by source —
    // per-source local top-k (WindowGroupLimit), never a global sort; the
    // cap itself is a 1-row aggregate broadcast back.
    "pipe_domain_cap" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val cap = d.agg(greatest(lit(1L),
        floor(lit(0.8) * count(lit(1)) / countDistinct(col("source")))
          .cast("long")).as("cap"))
      val rankW = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      d.withColumn("rank", row_number().over(rankW))
        .crossJoin(broadcast(cap))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rank") <= col("cap"), 1L).otherwise(0L)).as("n_kept"),
          max("cap").as("cap"))
        .orderBy("source")
    }),

    // sequential filter-funnel attribution: the operational readout of a
    // multi-stage quality pipeline — how many docs enter, drop, and
    // survive EACH stage in order (length → word shape → repetition →
    // stopwords). All four predicates come from one map-side tokenize +
    // one per-doc aggregate; the funnel itself is a single 1-row aggregate
    // unpivoted into the 4-row report, so the whole query adds one
    // narrow shuffle regardless of corpus size.
    "pipe_filter_funnel" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(
        col("doc_id"), length(col("text")).as("tlen"),
        split(col("text"), " ").as("toks"))
      val sig = base.select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        round((col("tlen") - size(col("toks")) + lit(1.0)) /
          size(col("toks")), 6).as("mean_wlen"),
        graft.functions.TextFunctions.tokenCountIn(col("toks"),
          Seq("the", "a", "of", "and", "to", "in", "is", "it"))
          .cast("long").as("n_stop"),
        round(lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")), 6).as("dup_ratio"))
      val st = sig.select(
        col("n_words").between(30L, 80L).as("p1"),
        col("mean_wlen").between(4.1, 4.9).as("p2"),
        (col("dup_ratio") <= 0.60).as("p3"),
        (col("n_stop") >= 3L).as("p4"))
      st.agg(
        count(lit(1)).as("n0"),
        sum(when(col("p1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("p1") && col("p2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("p1") && col("p2") && col("p3"), 1L).otherwise(0L))
          .as("n3"),
        sum(when(col("p1") && col("p2") && col("p3") && col("p4"), 1L)
          .otherwise(0L)).as("n4"))
        .selectExpr(
          """stack(4,
               '1_min_words', n0, n1,
               '2_word_len',  n1, n2,
               '3_dup_ratio', n2, n3,
               '4_stopwords', n3, n4) AS (stage, n_in, n_out)""")
        .select(col("stage"), col("n_in"), (col("n_in") - col("n_out"))
          .as("n_drop"), col("n_out"))
        .orderBy("stage")
    }),

    // URL canonicalization + dedup — the first pass of every web-crawl
    // pipeline: the same page arrives under mixed-case scheme/host,
    // explicit default ports, trailing slashes, tracking parameters
    // (utm_*/gclid/fbclid), permuted query strings, and fragments.
    // Canonical form: lowercase scheme+host, default port stripped
    // (non-default kept), trailing slash stripped, tracking params
    // dropped, surviving params sorted, fragment dropped. The corpus has
    // no URL column, so the fixture PLANTS one deterministically from
    // doc_id (mixed case, 3 port shapes, 2 param orders — the oracle
    // plants the identical strings, cf. pipe_pii_scrub). Everything is
    // map-side string/array expression work; the only shuffle is the
    // 7-host rollup — scan-shaped at any corpus size.
    "pipe_url_canonicalize" -> ((s, dir) => {
      val id = col("doc_id")
      val planted = t(s, dir, "documents").select(id, concat(
        when(pmod(id, lit(2)) === 0, lit("HTTPS")).otherwise(lit("http")),
        lit("://CDN"), pmod(id, lit(7)).cast("string"), lit(".Example.com"),
        when(pmod(id, lit(3)) === 0,
          when(pmod(id, lit(2)) === 0, lit(":443")).otherwise(lit(":80")))
          .when(pmod(id, lit(11)) === 0, lit(":8080")).otherwise(lit("")),
        lit("/a/b"), pmod(id, lit(5)).cast("string"),
        when(pmod(id, lit(4)) === 0, lit("/")).otherwise(lit("")),
        when(pmod(id, lit(2)) === 0,
          concat(lit("?utm_source=feed&b=2&a="), pmod(id, lit(3)).cast("string")))
          .otherwise(concat(lit("?a="), pmod(id, lit(3)).cast("string"),
            lit("&b=2&gclid=xyz"))),
        when(pmod(id, lit(5)) === 0,
          concat(lit("#sec"), pmod(id, lit(3)).cast("string")))
          .otherwise(lit(""))).as("url"))
      val parsed = planted
        .withColumn("base", regexp_replace(col("url"), "#.*$", ""))
        .withColumn("scheme",
          lower(regexp_extract(col("base"), "^([A-Za-z]+)://", 1)))
        .withColumn("rest",
          regexp_replace(col("base"), "^[A-Za-z]+://", ""))
        .withColumn("hostport", regexp_extract(col("rest"), "^([^/?]+)", 1))
        .withColumn("host",
          lower(regexp_extract(col("hostport"), "^([^:]+)", 1)))
        .withColumn("port",
          regexp_extract(col("hostport"), ":([0-9]+)$", 1))
        .withColumn("kept_port",
          when(col("port") === "", lit(""))
            .when(col("scheme") === "https" && col("port") === "443", lit(""))
            .when(col("scheme") === "http" && col("port") === "80", lit(""))
            .otherwise(concat(lit(":"), col("port"))))
        .withColumn("pathq", regexp_replace(col("rest"), "^[^/?]+", ""))
        .withColumn("path", regexp_replace(
          regexp_extract(col("pathq"), "^([^?]*)", 1), "/+$", ""))
        .withColumn("params", array_sort(filter(
          split(regexp_extract(col("pathq"), "\\?(.*)$", 1), "&"),
          p => p =!= "" && substring(p, 1, 4) =!= "utm_" &&
            substring(p, 1, 6) =!= "gclid=" &&
            substring(p, 1, 7) =!= "fbclid=")))
        .withColumn("q", array_join(col("params"), "&"))
        .withColumn("canonical", concat(
          col("scheme"), lit("://"), col("host"), col("kept_port"),
          col("path"),
          when(col("q") === "", lit(""))
            .otherwise(concat(lit("?"), col("q")))))
      parsed.groupBy("host")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("canonical")).as("n_canonical"),
          min(col("canonical")).as("sample_url"))
        .select(col("host"), col("n_urls"), col("n_canonical"),
          round(lit(1.0) - col("n_canonical").cast("double") /
            col("n_urls"), 6).as("dup_ratio"),
          col("sample_url"))
        .orderBy("host")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "pipe_quality_classifier" -> """
      WITH f AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS distinct_ratio,
               CAST(len(list_filter(string_split(text, ' '),
                                    x -> x IN ('the', 'a', 'of'))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS stop_ratio,
               CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))
                 AS avg_len
        FROM documents),
      sc AS (
        SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
               1.0 / (1.0 + exp(-(-1.2 + 0.35 * ln(n_words)
                                  + 1.8 * distinct_ratio - 2.5 * stop_ratio
                                  + 0.1 * avg_len))) AS q
        FROM f)
      SELECT doc_id, n_words, round(q, 6) AS quality, q >= 0.6 AS keep
      FROM sc ORDER BY doc_id""",

    "pipe_corpus_diff" -> """
      WITH old AS (
        SELECT doc_id AS o_id,
               md5(CASE WHEN doc_id % 5 = 0 THEN substr(text, 1, 20)
                        ELSE text END) AS o_md5
        FROM documents WHERE doc_id % 7 <> 0),
      neu AS (
        SELECT doc_id AS n_id, md5(text) AS n_md5
        FROM documents WHERE doc_id % 11 <> 3),
      d AS (
        SELECT coalesce(o_id, n_id) AS doc_id,
               CASE WHEN o_id IS NULL THEN 'added'
                    WHEN n_id IS NULL THEN 'removed'
                    WHEN o_md5 <> n_md5 THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old FULL OUTER JOIN neu ON o_id = n_id)
      SELECT status, count(*) AS n_docs,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM d GROUP BY status ORDER BY status""",

    "pipe_lang_mixture" -> """
      WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      z AS (SELECT sum(pow(n, 0.5)) AS z FROM c),
      w AS (
        SELECT lang, n AS n_orig,
               least(1.0, pow(n, 0.5) / z * 2000.0 / n) AS p_keep
        FROM c, z),
      k AS (
        SELECT d.lang, count(*) AS n_kept
        FROM documents d JOIN w USING (lang)
        WHERE ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % 1000000) + 0.5) / 1000000.0 < p_keep
        GROUP BY d.lang)
      SELECT w.lang, n_orig, round(p_keep, 6) AS p_keep,
             coalesce(n_kept, 0) AS n_kept
      FROM w LEFT JOIN k ON w.lang = k.lang ORDER BY w.lang""",

    "pipe_curriculum" -> """
      WITH f AS (
        SELECT text,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS distinct_ratio,
               CAST(len(list_filter(string_split(text, ' '),
                                    x -> x IN ('the', 'a', 'of'))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS stop_ratio,
               CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))
                 AS avg_len
        FROM documents),
      sc AS (
        SELECT 1.0 / (1.0 + exp(-(-1.2 + 0.35 * ln(n_words)
                                  + 1.8 * distinct_ratio - 2.5 * stop_ratio
                                  + 0.1 * avg_len))) AS q,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM f)
      SELECT CAST(least(floor(q * 10), 9) AS INTEGER) AS bin,
             count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             round(avg(q), 6) AS avg_q
      FROM sc GROUP BY 1 ORDER BY bin""",

    "pipe_balanced_sample" -> """
      WITH r AS (
        SELECT vec_id, label,
               CAST(row_number() OVER (
                 PARTITION BY label
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                 AS INTEGER) AS rank
        FROM embeddings)
      SELECT vec_id, label, rank FROM r WHERE rank <= 8
      ORDER BY label, rank""",

    "pipe_domain_cap" -> """
      WITH cap AS (
        SELECT greatest(1, CAST(floor(0.8 * count(*)
                 / count(DISTINCT source)) AS BIGINT)) AS cap
        FROM documents),
      r AS (
        SELECT doc_id, source,
               row_number() OVER (
                 PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
        FROM documents)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN rank <= cap THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             max(cap) AS cap
      FROM r CROSS JOIN cap
      GROUP BY source ORDER BY source""",

    "pipe_filter_funnel" -> """
      WITH base AS (
        SELECT doc_id, length(text) AS tlen,
               string_split(text, ' ') AS toks
        FROM documents),
      sig AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               round((tlen - len(toks) + 1.0) / len(toks), 6) AS mean_wlen,
               CAST(len(list_filter(toks, x -> x IN
                 ('the','a','of','and','to','in','is','it'))) AS BIGINT)
                 AS n_stop,
               round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                 / len(toks), 6) AS dup_ratio
        FROM base),
      st AS (
        SELECT (n_words BETWEEN 30 AND 80) AS p1,
               (mean_wlen BETWEEN 4.1 AND 4.9) AS p2,
               (dup_ratio <= 0.60) AS p3,
               (n_stop >= 3) AS p4
        FROM sig),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n2,
               CAST(sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n3,
               CAST(sum(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n4
        FROM st)
      SELECT '1_min_words' AS stage, n0 AS n_in, n0 - n1 AS n_drop,
             n1 AS n_out FROM a
      UNION ALL SELECT '2_word_len', n1, n1 - n2, n2 FROM a
      UNION ALL SELECT '3_dup_ratio', n2, n2 - n3, n3 FROM a
      UNION ALL SELECT '4_stopwords', n3, n3 - n4, n4 FROM a
      ORDER BY stage""",

    "pipe_url_canonicalize" -> """
      WITH u AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) ||
               '://CDN' || (doc_id % 7) || '.Example.com' ||
               (CASE WHEN doc_id % 3 = 0 THEN
                       (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)
                     WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END) ||
               '/a/b' || (doc_id % 5) ||
               (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
               (CASE WHEN doc_id % 2 = 0
                     THEN '?utm_source=feed&b=2&a=' || (doc_id % 3)
                     ELSE '?a=' || (doc_id % 3) || '&b=2&gclid=xyz' END) ||
               (CASE WHEN doc_id % 5 = 0 THEN '#sec' || (doc_id % 3)
                     ELSE '' END) AS url
        FROM documents),
      p1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS base FROM u),
      p2 AS (SELECT doc_id,
                    lower(regexp_extract(base, '^([A-Za-z]+)://', 1)) AS scheme,
                    regexp_replace(base, '^[A-Za-z]+://', '') AS rest
             FROM p1),
      p3 AS (SELECT doc_id, scheme,
                    coalesce(regexp_extract(rest, '^([^/?]+)', 1), '') AS hostport,
                    regexp_replace(rest, '^[^/?]+', '') AS pathq
             FROM p2),
      p4 AS (SELECT doc_id, scheme,
                    lower(regexp_extract(hostport, '^([^:]+)', 1)) AS host,
                    coalesce(regexp_extract(hostport, ':([0-9]+)$', 1), '') AS port,
                    regexp_replace(coalesce(regexp_extract(pathq, '^([^?]*)', 1), ''),
                                   '/+$', '') AS path,
                    coalesce(regexp_extract(pathq, '\?(.*)$', 1), '') AS qs
             FROM p3),
      p5 AS (SELECT doc_id, scheme, host,
                    CASE WHEN port = '' THEN ''
                         WHEN scheme = 'https' AND port = '443' THEN ''
                         WHEN scheme = 'http' AND port = '80' THEN ''
                         ELSE ':' || port END AS kept_port,
                    path,
                    array_to_string(list_sort(list_filter(string_split(qs, '&'),
                      p -> p <> '' AND substr(p, 1, 4) <> 'utm_'
                           AND substr(p, 1, 6) <> 'gclid='
                           AND substr(p, 1, 7) <> 'fbclid=')), '&') AS q
             FROM p4),
      c AS (SELECT doc_id, host,
                   scheme || '://' || host || kept_port || path ||
                   (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canonical
            FROM p5)
      SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
             CAST(count(DISTINCT canonical) AS BIGINT) AS n_canonical,
             round(1.0 - CAST(count(DISTINCT canonical) AS DOUBLE) / count(*), 6)
               AS dup_ratio,
             min(canonical) AS sample_url
      FROM c GROUP BY host ORDER BY host"""
  )
}
