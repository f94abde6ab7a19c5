package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic text primitives.
  *
  * Everything here is built from integer arithmetic, `ascii`, `md5` and
  * higher-order array functions — operations whose results are bit-identical
  * between Spark (codegen'd) and DuckDB (the correctness oracle). No
  * transcendental math, no engine-specific hash functions, no UDFs: all of it
  * stays inside whole-stage codegen and is safe at any scale.
  */
object TextFunctions {

  /** Modulus for all polynomial hashes; small enough that `a*h + b` never
    * overflows int64 (p^2 ≈ 1e18 < 2^63). */
  val HashMod = 1000000007L

  /** Whitespace tokens of a single-spaced text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Deterministic 31-base polynomial hash of a string over its ASCII codes:
    * fold (acc*31 + ascii(c)) % HashMod. Bit-identical in DuckDB as
    * list_reduce over string_split(s,''). (HOF form — fine for scalar use;
    * the hot per-document paths go through HashExpressions instead.) */
  def charHash(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % HashMod)

  /** Per-token polynomial hashes of a text column (native expression — one
    * tight loop per row; ASCII contract, bytes == ascii codes). */
  def tokenHashes(text: Column): Column = HashExpressions.token_hashes(text)

  /** Hashes of word `n`-grams (shingles), derived arithmetically from the
    * token hashes — no intermediate string building. shingle_i =
    * fold over n consecutive token hashes of (acc*31 + th) % HashMod. */
  def shingleHashes(text: Column, n: Int): Column =
    HashExpressions.shingle_hashes(tokenHashes(text), n)

  /** Count of tokens equal to any word in `words`. */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => words.map(w => t === w).reduce(_ || _))).cast("long")

  /** BPE-ish token count: runs of letters, runs of digits, or single other
    * non-space chars — the standard pre-tokenizer shape. Same regex semantics
    * in Java (Spark) and RE2 (DuckDB) for this simple alternation. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** Canonical-text fingerprint: md5 of lowercased, trimmed text. */
  def fingerprintMd5(text: Column): Column = md5(lower(trim(text)))

  /** 64-ish-bit content fingerprint as a rolling polynomial hash over token
    * hashes (order-sensitive, unlike a bag-of-words hash). */
  def fingerprintPoly(text: Column): Column =
    HashExpressions.poly_fold(tokenHashes(text))
}
