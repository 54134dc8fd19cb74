package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Q73 — Unicode normalization + script profiling: NFC/NFKC per
  * document plus per-script character counts, the canonicalization
  * pass a multiscript pretraining corpus runs before tokenization
  * (two encodings of "café" must hash, dedup, and count as ONE word —
  * q18/q57/q64 all assume it), via the native
  * [[graft.functions.UnicodeNormalize]] expression (registered as
  * `graft_nfc` / `graft_nfkc`).
  *
  * The synthetic corpus is pure ASCII, so — q72's pattern — the
  * multiscript fixture is synthesized inside the query: a
  * doc_id-keyed suffix cycling through (0) decomposed e + U+0301
  * (NFC composes it), (1) precomposed U+00E9 (NFC-invariant), (2)
  * fullwidth ＡＢ + Greek αβ (NFC-invariant, NFKC folds the
  * fullwidth pair to ASCII), (3) the U+FB01 ﬁ ligature + Cyrillic
  * абв (NFC-invariant, NFKC expands the ligature). Both engines
  * build byte-identical suffixes from explicit codepoints — Scala
  * `\\u` escapes here, `chr()` concatenations in the oracle — no raw
  * combining marks in either source text.
  *
  * ORACLE: DuckDB's `nfc_normalize` independently computes the NFC
  * column — two unrelated implementations of UAX #15 (JDK vs utf8proc)
  * must agree, which is the hash gate's whole point. DuckDB has no
  * NFKC, so the oracle derives the expected NFKC RELATIONALLY from
  * the fixture construction itself: the base text is ASCII
  * (NFKC-invariant) and each suffix's compatibility form is known,
  * so expected_nfkc = text ⧺ nfkc(suffix)-literal. Script counts
  * replay as length-minus-stripped with each engine's spelling of
  * the same Unicode script property (`\\p{IsLatin}` Java /
  * `\\p{Latin}` RE2). Round12Spec pins the NFKC-only cases
  * (fullwidth, ligature, compose-under-NFKC) against known strings,
  * plus interpreted-vs-codegen parity for the expression.
  *
  * Scale: map-only per-row work (one expression tree, whole-stage
  * codegen'd, no UDF/shuffle/join) until the final doc_id sort. */
object Q73UnicodeNormalize extends GraftQuery {
  val name = "q73_unicode_normalize"

  /** The four suffixes in RAW (pre-normalization) form, explicit
    * codepoint escapes only. */
  private[graft] val RawSuffixes = Seq(
    " cafe\u0301",                  // e + COMBINING ACUTE ACCENT
    " caf\u00e9",                   // precomposed e-acute
    " \uff21\uff22 \u03b1\u03b2", // fullwidth AB + Greek alpha beta
    " \ufb01le \u0430\u0431\u0432") // fi ligature + Cyrillic a-be-ve
  /** The same four suffixes after NFKC — the oracle's literal side. */
  private[graft] val NfkcSuffixes = Seq(
    " caf\u00e9", " caf\u00e9", " AB \u03b1\u03b2",
    " file \u0430\u0431\u0432")

  private def suffixCol: Column =
    element_at(array(RawSuffixes.map(lit): _*), (col("doc_id") % 4 + 1).cast("int"))

  private def nCol(src: String, clazz: String): Column =
    (length(col(src)) - length(regexp_replace(col(src), s"\\p{$clazz}", "")))
      .cast("long")

  def run(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), concat(col("text"), suffixCol).as("raw"))
      .select(
        col("doc_id"),
        length(col("raw")).cast("long").as("raw_len"),
        expr("graft_nfc(raw)").as("nfc"),
        expr("graft_nfkc(raw)").as("nfkc"),
        nCol("raw", "IsLatin").as("n_latin"),
        nCol("raw", "IsGreek").as("n_greek"),
        nCol("raw", "IsCyrillic").as("n_cyrillic"),
        nCol("raw", "Mn").as("n_marks"))
      .withColumn("nfc_len", length(col("nfc")).cast("long"))
      .withColumn("compat_changed", col("nfkc") =!= col("nfc"))
      .select(col("doc_id"), col("raw_len"), col("nfc"), col("nfc_len"),
        col("nfkc"), col("compat_changed"),
        col("n_latin"), col("n_greek"), col("n_cyrillic"), col("n_marks"))
      .orderBy(col("doc_id"))

  val oracle = Some {
    /** Render a suffix as a DuckDB expression: ASCII runs as quoted
      * literals, non-ASCII as chr() — byte-identical to the Scala
      * escapes above without any raw multibyte in the SQL text. */
    def duck(s: String): String = {
      val parts = new scala.collection.mutable.ListBuffer[String]
      val run = new StringBuilder
      def flush(): Unit =
        if (run.nonEmpty) { parts += s"'${run.toString}'"; run.clear() }
      s.foreach { ch =>
        if (ch >= ' ' && ch < 127 && ch != '\'') run += ch
        else { flush(); parts += s"chr(${ch.toInt})" }
      }
      flush()
      parts.mkString(" || ")
    }
    val rawCase = RawSuffixes.zipWithIndex.map { case (s, i) =>
      s"WHEN $i THEN ${duck(s)}" }.mkString(" ")
    val nfkcCase = NfkcSuffixes.zipWithIndex.map { case (s, i) =>
      s"WHEN $i THEN ${duck(s)}" }.mkString(" ")
    s"""
    WITH fixed AS (
      SELECT doc_id,
        text || CASE CAST(doc_id % 4 AS INT) $rawCase END AS raw,
        text || CASE CAST(doc_id % 4 AS INT) $nfkcCase END AS expected_nfkc
      FROM documents)
    SELECT doc_id,
      CAST(length(raw) AS BIGINT) AS raw_len,
      nfc_normalize(raw) AS nfc,
      CAST(length(nfc_normalize(raw)) AS BIGINT) AS nfc_len,
      expected_nfkc AS nfkc,
      (expected_nfkc <> nfc_normalize(raw)) AS compat_changed,
      CAST(length(raw) - length(regexp_replace(raw, '\\p{Latin}', '', 'g')) AS BIGINT) AS n_latin,
      CAST(length(raw) - length(regexp_replace(raw, '\\p{Greek}', '', 'g')) AS BIGINT) AS n_greek,
      CAST(length(raw) - length(regexp_replace(raw, '\\p{Cyrillic}', '', 'g')) AS BIGINT) AS n_cyrillic,
      CAST(length(raw) - length(regexp_replace(raw, '\\p{Mn}', '', 'g')) AS BIGINT) AS n_marks
    FROM fixed ORDER BY doc_id
    """.trim
  }
}
