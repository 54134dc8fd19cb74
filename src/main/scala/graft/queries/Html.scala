package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Q72 — HTML → text extraction (the raw-web front end): the one step
  * every real pretraining pipeline runs before anything in this
  * engine, generalizing the reference's scan+normalize stage
  * (`/root/reference/src/main.cpp:191-208` strips non-letters from
  * whitespace tokens; a crawl corpus must first strip MARKUP from
  * pages). Shape follows the public boilerplate-removal literature
  * (jusText / trafilatura): segment the page into BLOCKS at
  * block-level closing tags, score each block with cheap counters,
  * and keep the content blocks —
  *   - `<script>`/`<style>` subtrees are deleted outright;
  *   - a block survives iff its tag-stripped text is long enough
  *     (≥ [[Q72HtmlExtract.MinChars]] chars), its LINK DENSITY is low
  *     (chars inside `<a>` ≤ 1/3 of text chars — navigation chrome is
  *     mostly anchors), and its STOPWORD DENSITY is high enough
  *     (≥ 1/33 of words from [[Q72HtmlExtract.Stopwords]] — prose
  *     carries function words, copyright/nav boilerplate doesn't;
  *     the real-corpus jusText threshold is ~0.30 against a ~400-word
  *     stoplist — here it is calibrated to the synthetic vocabulary,
  *     whose only function words 'the'/'a' cover ~6% of tokens);
  *   - the extracted document is the kept blocks' text in page order.
  * All three gates are INTEGER comparisons (3·link ≤ len,
  * 33·stops ≥ words) so the cross-engine hash can't hinge on float
  * rounding.
  *
  * The corpus ships no HTML, so the page fixture is synthesized
  * INSIDE the query from `documents.text` by a SQL expression valid
  * verbatim in both engines ([[Q72HtmlExtract.htmlSql]]): title +
  * style + script head, a nav bar of anchors, an `<h1>`, the text as
  * two `<p>` halves (the second with a trailing "read more" link),
  * a doc_id-dependent too-short spam block, a doc_id-dependent
  * zero-stopword copyright block, and a footer link row. Each gate
  * has a block only IT removes: nav/footer die by link density, the
  * spam block by length, the copyright block by stopword density —
  * so the oracle's relational replay of the rules checks every gate,
  * and Round12Spec pins a hand-written page to its known text.
  *
  * Scale: pure per-row HOF work (split + transform/filter/aggregate,
  * all codegen'd, no UDF, no join, no shuffle) until the final
  * doc_id sort — at 100 TB this is the embarrassingly-parallel
  * map-only pass a crawl front end must be.
  */
object Q72HtmlExtract extends GraftQuery {
  val name = "q72_html_extract"

  /** Minimum tag-stripped chars for a content block. */
  val MinChars = 20
  /** Function words for the stopword-density gate; only 'the'/'a'
    * occur in the synthetic vocabulary, the rest future-proof the
    * list for real corpora. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is")

  /** The page fixture — one SQL expression over (doc_id, text), valid
    * verbatim in Spark SQL and DuckDB (concat coerces, CASE/%/substr
    * agree; floor-then-cast avoids DuckDB's round-on-cast). */
  private[graft] val htmlSql: String = """concat(
    '<html><head><title>doc ', doc_id, '</title>',
    '<style>p { color: red; }</style>',
    '<script>var a = 1; if (a < 2) { a = 3; }</script>',
    '</head><body>',
    '<div><a href="/">home</a> <a href="/about">about us</a> <a href="/contact">contact page</a></div>',
    '<h1>', substr(text, 1, 16), '</h1>',
    '<p>', substr(text, 1, cast(floor(length(text)/2.0) as int)), '</p>',
    '<p>', substr(text, cast(floor(length(text)/2.0) as int) + 1), ' <a href="/more">read more</a></p>',
    case when doc_id % 5 = 0 then '<p>buy now</p>' else '' end,
    case when doc_id % 3 = 0 then '<div>copyright 2024 example corporation rights reserved worldwide</div>' else '' end,
    '<div><a href="/tos">terms</a> <a href="/privacy">privacy</a></div>',
    '</body></html>')""".replaceAll("\\s+", " ").trim

  /** Script/style subtree eraser (lazy so nested `<` inside code
    * survives the non-greedy span; RE2 and java.util.regex agree). */
  private[graft] val DropPat = "<script>.*?</script>|<style>.*?</style>"
  /** Block separators: closing tags of the block-level elements. */
  private[graft] val BlockPat = "</title>|</h1>|</p>|</div>"
  /** Anchor text capture (group 1). */
  private[graft] val AnchorPat = "<a [^>]*>([^<]*)</a>"
  /** Any remaining tag. */
  private[graft] val TagPat = "<[^>]*>"

  private def stopArr = Stopwords.map(w => s"'$w'").mkString("array(", ", ", ")")

  /** Extraction over an input frame carrying (doc_id, html) — the
    * production surface; [[run]] wires the synthesized fixture in,
    * Round12Spec feeds hand-written pages. */
  private[graft] def extract(pages: DataFrame): DataFrame =
    pages
      .withColumn("blocks",
        split(regexp_replace(col("html"), DropPat, " "), BlockPat))
      // one struct per block: tag-stripped text + anchor-char count
      .withColumn("bstats", expr(s"""
        transform(blocks, b -> named_struct(
          'plain', trim(regexp_replace(regexp_replace(b, '$TagPat', ' '), ' +', ' ')),
          'link_chars', aggregate(
            transform(regexp_extract_all(b, '$AnchorPat', 1), t -> length(t)),
            0, (acc, x) -> acc + x)))"""))
      .withColumn("nonempty", expr("filter(bstats, s -> length(s.plain) > 0)"))
      .withColumn("kept", expr(s"""
        filter(nonempty, s ->
          length(s.plain) >= $MinChars
          AND s.link_chars * 3 <= length(s.plain)
          AND size(filter(split(s.plain, ' '), w -> array_contains($stopArr, w))) * 33
              >= size(split(s.plain, ' ')))"""))
      .select(
        col("doc_id"),
        size(col("nonempty")).cast("long").as("n_blocks"),
        size(col("kept")).cast("long").as("n_kept"),
        expr("array_join(transform(kept, s -> s.plain), ' ')").as("extracted"))
      .orderBy(col("doc_id"))

  def run(spark: SparkSession, dir: String): DataFrame =
    extract(Tables.documents(spark, dir)
      .select(col("doc_id"), expr(htmlSql).as("html")))

  /** The same block rules replayed relationally: DuckDB list HOFs
    * over the same fixture expression (regexp_replace needs the
    * explicit 'g'; list_sum AND
    * array_to_string are NULL on an empty list, hence the coalesces —
    * Spark's aggregate-with-0-init / array_join return 0 / ''). */
  val oracle = Some {
    val stopList = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""
    WITH pages AS (
      SELECT doc_id, $htmlSql AS html FROM documents),
    segmented AS (
      SELECT doc_id,
        list_transform(
          regexp_split_to_array(
            regexp_replace(html, '$DropPat', ' ', 'g'), '$BlockPat'),
          b -> struct_pack(
            plain := trim(regexp_replace(regexp_replace(b, '$TagPat', ' ', 'g'), ' +', ' ', 'g')),
            link_chars := coalesce(list_sum(
              list_transform(regexp_extract_all(b, '$AnchorPat', 1), t -> length(t))), 0)))
          AS bstats
      FROM pages),
    scored AS (
      SELECT doc_id,
        list_filter(bstats, s -> length(s.plain) > 0) AS nonempty
      FROM segmented),
    kept AS (
      SELECT doc_id, nonempty,
        list_filter(nonempty, s ->
          length(s.plain) >= $MinChars
          AND s.link_chars * 3 <= length(s.plain)
          AND len(list_filter(string_split(s.plain, ' '), w -> list_contains($stopList, w))) * 33
              >= len(string_split(s.plain, ' '))) AS keep
      FROM scored)
    SELECT doc_id,
      CAST(len(nonempty) AS BIGINT) AS n_blocks,
      CAST(len(keep) AS BIGINT) AS n_kept,
      coalesce(array_to_string(list_transform(keep, s -> s.plain), ' '), '') AS extracted
    FROM kept ORDER BY doc_id
    """.trim
  }
}

/** The raw-text front-end family: markup extraction + unicode
  * canonicalization — the two passes that turn crawl bytes into the
  * clean `documents.text` column every downstream operator assumes. */
object Html {
  val all: Seq[GraftQuery] = Seq(Q72HtmlExtract, Q73UnicodeNormalize)
}
