package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Q50–Q53 + Q61 — corpus-curation operators a training-data pipeline
  * runs after dedup/decontamination: PII redaction, URL/domain policy,
  * deterministic mixture interleaving, token-distribution stats, and
  * the Gopher composite quality rules.
  *
  * Cross-engine determinism follows the NorthStar rules: md5/regex
  * surfaces identical in both engines, integer arithmetic everywhere a
  * sort key is derived, the one floating aggregate (q53's entropy)
  * folds in an explicit word-asc order so both engines add identical
  * IEEE terms in identical sequence, and exact-integer ratios (q53's
  * ttr, q61's five rule ratios) are surfaced UNROUNDED per the
  * GraftQuery contract.
  *
  * The synthetic corpus contains no PII- or URL-shaped tokens (verified
  * at sf0.01: zero digits in any text), so q50/q51 oracle rows pin the
  * all-clean behavior; the operators' positive behavior is pinned by
  * Round9bSpec fixtures with real emails/phones/IPs/URLs.
  */
object Curation {
  /** Email/phone/IPv4 patterns, valid and identical under Java regex
    * (Spark) and RE2 (DuckDB): no backrefs, no lookaround. */
  private[graft] val EmailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private[graft] val Ipv4Pat = """\b(\d{1,3}\.){3}\d{1,3}\b"""
  private[graft] val PhonePat = """\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"""
  /** URL + domain-capture patterns (no quote chars — they embed in SQL
    * single-quoted literals verbatim — and NO backslashes in DomainPat:
    * it rides inside Spark `expr` strings, where '\s' in a single-quoted
    * literal collapses to 's' while DuckDB keeps it verbatim — a silent
    * cross-engine divergence the Round9Spec fixture caught. Whitespace
    * exclusion is redundant there anyway: inputs are `\S+` matches). */
  private[queries] val UrlPat = """https?://\S+"""
  private[queries] val DomainPat = "https?://([^/:]+)"
  /** Domain blocklist a curation pass drops documents for. */
  private[queries] val Blocklist = Seq(
    "badsite.example", "spam.example", "tracker.example")

  val all: Seq[GraftQuery] = Seq(
    Q50PiiRedact, Q51UrlDomains, Q52MixInterleave, Q53TokenEntropy,
    Q61GopherRules)
}

/** Q50 — PII redaction: count and mask emails, phone numbers and IPv4
  * addresses. Counts are taken on the ORIGINAL text (each pattern
  * independently); redaction applies email→ip→phone so the broader
  * ip pattern can never corrupt an already-redacted narrower match.
  * Entirely per-row regex work — codegen'd, shuffle-free except the
  * final doc_id sort; at 100 TB this is the map-only pass it must be. */
object Q50PiiRedact extends GraftQuery {
  import Curation._
  val name = "q50_pii_redact"
  def run(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailPat), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(PhonePat), lit(0)))
        .cast("long").as("n_phones"),
      size(regexp_extract_all(col("text"), lit(Ipv4Pat), lit(0)))
        .cast("long").as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailPat, "<EMAIL>"),
          Ipv4Pat, "<IP>"),
        PhonePat, "<PHONE>").as("redacted"))
      .withColumn("pii_total",
        col("n_emails") + col("n_phones") + col("n_ips"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        col("n_ips"), col("pii_total"), col("redacted"))
      .orderBy(col("doc_id"))
  val oracle = Some(s"""
    SELECT doc_id,
      CAST(length(regexp_extract_all(text, '$EmailPat')) AS BIGINT) AS n_emails,
      CAST(length(regexp_extract_all(text, '$PhonePat')) AS BIGINT) AS n_phones,
      CAST(length(regexp_extract_all(text, '$Ipv4Pat')) AS BIGINT) AS n_ips,
      CAST(length(regexp_extract_all(text, '$EmailPat'))
         + length(regexp_extract_all(text, '$PhonePat'))
         + length(regexp_extract_all(text, '$Ipv4Pat')) AS BIGINT) AS pii_total,
      regexp_replace(
        regexp_replace(
          regexp_replace(text, '$EmailPat', '<EMAIL>', 'g'),
          '$Ipv4Pat', '<IP>', 'g'),
        '$PhonePat', '<PHONE>', 'g') AS redacted
    FROM documents ORDER BY doc_id
  """.trim)
}

/** Q51 — URL/domain policy: per document, how many URLs it carries,
  * how many distinct domains, and how many hit the blocklist; `keep`
  * is the curation verdict. Per-row HOFs over the extracted URL list —
  * no shuffle before the final sort, and the blocklist is a literal
  * array (at scale: a broadcast set), never a join. */
object Q51UrlDomains extends GraftQuery {
  import Curation._
  val name = "q51_url_domains"
  private def blockArr = Blocklist.map(d => s"'$d'").mkString("array(", ", ", ")")
  def run(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("urls", regexp_extract_all(col("text"), lit(UrlPat), lit(0)))
      // drop the '' regexp_extract returns for a domain-less URL
      // ("http:///x", "http://:8080/x") — it would otherwise count as
      // a phantom distinct domain in both engines, consistently wrong
      .withColumn("domains",
        expr(s"filter(transform(urls, u_ -> lower(regexp_extract(u_, '$DomainPat', 1))), d_ -> d_ != '')"))
      .select(
        col("doc_id"),
        size(col("urls")).cast("long").as("n_urls"),
        size(array_distinct(col("domains"))).cast("long").as("n_domains"),
        expr(s"cast(size(filter(domains, d_ -> array_contains($blockArr, d_))) as bigint)")
          .as("n_blocked"))
      .withColumn("keep", col("n_blocked") === 0L)
      .orderBy(col("doc_id"))
  val oracle = Some {
    val blockList = Blocklist.map(d => s"'$d'").mkString("[", ", ", "]")
    s"""
    WITH u AS (
      SELECT doc_id,
        list_filter(list_transform(regexp_extract_all(text, '$UrlPat'),
          u_ -> lower(regexp_extract(u_, '$DomainPat', 1))), d_ -> d_ <> '') AS domains,
        CAST(length(regexp_extract_all(text, '$UrlPat')) AS BIGINT) AS n_urls
      FROM documents)
    SELECT doc_id, n_urls,
      CAST(length(list_distinct(domains)) AS BIGINT) AS n_domains,
      CAST(length(list_filter(domains, d_ -> list_contains($blockList, d_))) AS BIGINT) AS n_blocked,
      length(list_filter(domains, d_ -> list_contains($blockList, d_))) = 0 AS keep
    FROM u ORDER BY doc_id
    """.trim
  }
}

/** Q52 — deterministic mixture interleave (stride scheduling): give
  * each source an integer weight and emit the training order in which
  * any prefix contains sources proportionally to their weights. Per
  * source, doc n gets key n·stride where stride = LCM(weights)/weight —
  * pure integer arithmetic, so both engines order identically with no
  * float ties. The output's total ORDER BY *is* the training order;
  * deliberately NO global row_number materialization — that would be a
  * single-partition window, while the ORDER BY is Spark's
  * range-partitioned sort and scales to 100 TB. Weights here derive
  * from the source id (1 + src# mod 3); a real run would join a tiny
  * broadcast weight table. */
object Q52MixInterleave extends GraftQuery {
  val name = "q52_mix_interleave"
  def run(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        (expr("cast(substr(source, 4) as int)") % 3 + 1).as("weight"))
      .withColumn("rn", row_number().over(w).cast("long"))
      // stride: LCM(1,2,3)=6 → 6,3,2. element_at avoids the engines'
      // differing integer-division dialects (duckdb / returns DOUBLE)
      .withColumn("sort_key",
        col("rn") * element_at(array(lit(6L), lit(3L), lit(2L)), col("weight")))
      .orderBy(col("sort_key"), col("source"), col("doc_id"))
  }
  val oracle = Some("""
    WITH w AS (
      SELECT doc_id, source,
        CAST((CAST(substr(source, 4) AS INT) % 3) + 1 AS INT) AS weight
      FROM documents),
    r AS (
      SELECT doc_id, source, weight,
        CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn
      FROM w)
    SELECT doc_id, source, weight, rn,
      rn * ([6, 3, 2][weight]) AS sort_key
    FROM r ORDER BY sort_key, source, doc_id
  """.trim)
}

/** Q53 — token-distribution stats: per-document token count, type
  * count, type-token ratio and Shannon entropy of the token frequency
  * distribution (a gibberish/templated-text quality signal: natural
  * prose sits high, degenerate repetition collapses toward 0).
  * The one floating sum (Σ c·ln c) folds over counts in explicit
  * word-asc order, so Spark and DuckDB add identical IEEE terms in
  * identical sequence (the q18e left-fold rule); entropy is then two
  * IEEE ops on exact operands. Shape: tokenize→per-(doc,word) count→
  * per-doc fold — two partial-agg shuffles keyed by doc_id, no window. */
object Q53TokenEntropy extends GraftQuery {
  val name = "q53_token_entropy"
  def run(spark: SparkSession, dir: String): DataFrame = {
    val byWord = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .select(col("doc_id"),
        lower(regexp_replace(col("tok"), "[^a-zA-Z]", "")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
    byWord
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_types"),
        // word-asc ordered counts → order-deterministic float fold
        sort_array(collect_list(struct(col("word"), col("c")))).as("cs"))
      .withColumn("slc", expr(
        "aggregate(transform(cs, x_ -> cast(x_.c as double)), " +
          "cast(0 as double), (a_, x_) -> a_ + x_ * ln(x_))"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_types"),
        // UNROUNDED: a ratio of two exact integers is one
        // bit-deterministic IEEE division; ROUND(…, 4) on it is the
        // q55 halfway-point hazard (e.g. 87/4000 = 0.02175 rounds
        // 0.0218 in Spark, 0.0217 in DuckDB). entropy stays rounded —
        // it is a genuinely-float ln fold.
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        round(log(col("n_tokens").cast("double")) - col("slc") / col("n_tokens"), 4)
          .as("entropy"))
      .orderBy(col("doc_id"))
  }
  val oracle = Some(raw"""
    WITH words AS (
      SELECT doc_id,
        lower(regexp_replace(unnest(string_split_regex(text, '\s+')), '[^a-zA-Z]', '', 'g')) AS word
      FROM documents),
    byword AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
      FROM words WHERE word <> '' GROUP BY doc_id, word),
    agg AS (
      SELECT doc_id,
        CAST(sum(c) AS BIGINT) AS n_tokens,
        CAST(count(*) AS BIGINT) AS n_types,
        list(CAST(c AS DOUBLE) ORDER BY word ASC) AS cs
      FROM byword GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_types,
      CAST(n_types AS DOUBLE) / n_tokens AS ttr,
      round(ln(CAST(n_tokens AS DOUBLE))
        - list_reduce(list_prepend(CAST(0 AS DOUBLE), cs),
            (a_, x_) -> a_ + x_ * ln(x_)) / n_tokens, 4) AS entropy
    FROM agg ORDER BY doc_id
  """.trim)
}

/** Q61 — the Gopher quality rules (Rae et al. 2021, Appendix A): the
  * canonical published composite rule-set most production corpora run
  * before model-based scoring. Each document gets the FIRST failing
  * rule in the paper's order as its status (precedence mirrors
  * q42's drop-reason discipline: one cheapest-condemning reason).
  *
  * Rules: word count ∈ [50, 100k]; mean word length ∈ [3, 10];
  * hash-symbol-to-word ratio ≤ 0.1 AND '...'-run-to-word ratio ≤ 0.1
  * (the paper thresholds EACH symbol separately — a doc at 0.06+0.06
  * passes, a summed ratio would wrongly condemn it); <90% of lines
  * bullet-started; <30% of lines ellipsis-ended; ≥80% of words
  * containing an alphabetic char; ≥2 distinct stopwords present.
  *
  * One DELIBERATE deviation from App. A: the stopword list swaps the
  * paper's "with" for "a" — the synthetic corpus vocabulary contains
  * "the" and "a" but none of the paper's other six, so the paper's
  * exact list would tag every long fixture doc 'stopwords' and the
  * kept path would only ever run in crafted tests. A production run
  * swaps the literal list back.
  *
  * Entirely per-row HOF work over one projection binding tokens,
  * lines, and the LOWERED token array (bound once — 8 stopword probes
  * reference it; an inline transform would re-lowercase per probe) —
  * map-only at 100 TB, like q50. Ratio outputs are single IEEE
  * divisions of exact integers, surfaced UNROUNDED (the q55 rule),
  * zero-guarded so an empty doc hashes as 0.0 instead of
  * engine-specific null/NaN; the threshold comparisons therefore
  * agree across engines because both sides compare bit-identical
  * doubles. Stopword counting filters the 8-element literal list
  * against the token set (never the reverse: list_intersect's dedup
  * semantics differ subtly across engines).
  */
object Q61GopherRules extends GraftQuery {
  val name = "q61_gopher_rules"
  val MinWords = 50L
  val MaxWords = 100000L
  val Stopwords = Seq("the", "a", "be", "to", "of", "and", "that", "have")

  def run(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = Stopwords.map(s => s"'$s'").mkString("array(", ", ", ")")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        expr(NorthStar.toksExpr).as("t"),
        expr(NorthStar.linesExpr).as("lns"))
      .withColumn("tl", expr("transform(t, x_ -> lower(x_))"))
      .select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_words"),
        expr("aggregate(t, cast(0 as bigint), (a_, x_) -> a_ + length(x_))")
          .as("wchars"),
        expr("cast(size(filter(t, x_ -> x_ rlike '[A-Za-z]')) as bigint)")
          .as("n_alpha"),
        (length(col("text")) - length(regexp_replace(col("text"), "#", "")))
          .cast("long").as("n_hash"),
        expr("cast((length(text) - length(replace(text, '...', ''))) div 3 as bigint)")
          .as("n_ellip"),
        size(col("lns")).cast("long").as("n_lines"),
        expr("cast(size(filter(lns, s_ -> startswith(s_, '-') or startswith(s_, '*'))) as bigint)")
          .as("n_bullet"),
        expr("cast(size(filter(lns, s_ -> endswith(s_, '...'))) as bigint)")
          .as("n_ell_lines"),
        expr(s"cast(size(filter($stopArr, s_ -> " +
          "array_contains(tl, s_))) as bigint)")
          .as("n_stopwords"))
      .withColumn("mean_word_len",
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(col("wchars").cast("double") / col("n_words")))
      .withColumn("hash_ratio",
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(col("n_hash").cast("double") / col("n_words")))
      .withColumn("ellipsis_ratio",
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(col("n_ellip").cast("double") / col("n_words")))
      .withColumn("alpha_frac",
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(col("n_alpha").cast("double") / col("n_words")))
      .withColumn("bullet_frac",
        when(col("n_lines") === 0L, lit(0.0))
          .otherwise(col("n_bullet").cast("double") / col("n_lines")))
      .withColumn("ellipsis_frac",
        when(col("n_lines") === 0L, lit(0.0))
          .otherwise(col("n_ell_lines").cast("double") / col("n_lines")))
      .withColumn("status",
        when(col("n_words") < MinWords || col("n_words") > MaxWords,
          lit("word_count"))
          .when(col("mean_word_len") < 3.0 || col("mean_word_len") > 10.0,
            lit("word_length"))
          .when(col("hash_ratio") > 0.1 || col("ellipsis_ratio") > 0.1,
            lit("symbol_ratio"))
          .when(col("bullet_frac") > 0.9, lit("bullet_lines"))
          .when(col("ellipsis_frac") > 0.3, lit("ellipsis_lines"))
          .when(col("alpha_frac") < 0.8, lit("alpha_words"))
          .when(col("n_stopwords") < 2L, lit("stopwords"))
          .otherwise(lit("kept")))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("hash_ratio"), col("ellipsis_ratio"), col("alpha_frac"),
        col("bullet_frac"), col("ellipsis_frac"), col("n_stopwords"),
        col("status"))
      .orderBy(col("doc_id"))
  }

  val oracle = Some {
    val stopList = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    raw"""
    WITH b AS (
      SELECT doc_id, text, ${NorthStar.duckToks} AS t,
        ${NorthStar.duckLines} AS lns
      FROM documents),
    s AS (
      SELECT doc_id,
        CAST(len(t) AS BIGINT) AS n_words,
        CAST(COALESCE(list_sum(list_transform(t, x_ -> length(x_))), 0) AS BIGINT) AS wchars,
        CAST(len(list_filter(t, x_ -> regexp_matches(x_, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
        CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_ellip,
        CAST(len(lns) AS BIGINT) AS n_lines,
        CAST(len(list_filter(lns, s_ -> starts_with(s_, '-') OR starts_with(s_, '*'))) AS BIGINT) AS n_bullet,
        CAST(len(list_filter(lns, s_ -> ends_with(s_, '...'))) AS BIGINT) AS n_ell_lines,
        CAST(len(list_filter($stopList, s_ ->
          list_contains(list_transform(t, x_ -> lower(x_)), s_))) AS BIGINT) AS n_stopwords
      FROM b),
    f AS (
      SELECT doc_id, n_words, n_stopwords,
        CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(wchars AS DOUBLE) / n_words END AS mean_word_len,
        CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(n_hash AS DOUBLE) / n_words END AS hash_ratio,
        CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(n_ellip AS DOUBLE) / n_words END AS ellipsis_ratio,
        CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(n_alpha AS DOUBLE) / n_words END AS alpha_frac,
        CASE WHEN n_lines = 0 THEN 0.0 ELSE CAST(n_bullet AS DOUBLE) / n_lines END AS bullet_frac,
        CASE WHEN n_lines = 0 THEN 0.0 ELSE CAST(n_ell_lines AS DOUBLE) / n_lines END AS ellipsis_frac
      FROM s)
    SELECT doc_id, n_words, mean_word_len, hash_ratio, ellipsis_ratio,
      alpha_frac, bullet_frac, ellipsis_frac, n_stopwords,
      CASE WHEN n_words < $MinWords OR n_words > $MaxWords THEN 'word_count'
           WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'word_length'
           WHEN hash_ratio > 0.1 OR ellipsis_ratio > 0.1 THEN 'symbol_ratio'
           WHEN bullet_frac > 0.9 THEN 'bullet_lines'
           WHEN ellipsis_frac > 0.3 THEN 'ellipsis_lines'
           WHEN alpha_frac < 0.8 THEN 'alpha_words'
           WHEN n_stopwords < 2 THEN 'stopwords'
           ELSE 'kept' END AS status
    FROM f ORDER BY doc_id
  """.trim
  }
}
