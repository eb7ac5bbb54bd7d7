package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis for training-data pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions._`
  * (whole-stage-codegen'd Catalyst expressions — no UDFs), so filters
  * and projections using these columns still push down / prune.
  * Patterns are written in the subset of regex syntax that means the
  * same thing in Java (Spark) and RE2 (DuckDB oracle): no lookbehind,
  * no backreferences.
  */
object TextOps {

  /** Whitespace-collapsed, trimmed, lowercased canonical text. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Exact-dup fingerprint: md5 hex of the normalized text (same
    * function exists in DuckDB for the oracle). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Number of CJK (CJK Unified Ideographs block) characters. */
  def cjkCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", ""))

  /** Cheap language-family guess: >10% CJK chars → 'cjk', empty →
    * 'empty', else 'latin'. Deliberately simple so the identical
    * integer-threshold CASE is expressible in the DuckDB oracle. */
  def langGuess(text: Column): Column =
    when(length(text) === 0, lit("empty"))
      .when(cjkCount(text) * 10 > length(text), lit("cjk"))
      .otherwise(lit("latin"))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))

  /** English stopword hits (word-bounded). */
  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("\\b(the|a|an|and|of|to|in|is|it|for)\\b"), lit(0)))

  /** Integer-threshold quality gate (all-integer arithmetic so the
    * oracle comparison is exact): a doc passes when it has at least 20
    * tokens, at least one stopword per 50 tokens, and punctuation
    * density below 20%. */
  def qualityOk(text: Column): Column = {
    val toks = tokenCount(text)
    (toks >= 20) &&
      (stopwordCount(text) * 50 >= toks) &&
      (punctCount(text) * 5 <= toks)
  }
}
