package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine token hashing for the dedup/fingerprint
  * operators (SURVEY.md §2 C2/C4).
  *
  * The driver's correctness gate replays every query in DuckDB, so hash
  * functions must be expressible identically in both engines. Built-in
  * hashes differ (Spark xxhash64/murmur vs DuckDB hash), so we define the
  * token value from primitives both engines share: first/last code point
  * and length. Collisions only weaken (never break) the MinHash/SimHash
  * approximations, and the exact-verification stages behind them are
  * collision-proof.
  */
object TextHash {

  /** Mersenne-31 modulus for MinHash permutations. */
  val MinHashP = 2147483647L
  /** Large prime modulus for document fingerprints. */
  val FpM = 1000000007L

  /** tokval(t) = Knuth-scrambled (first code point, last code point,
    * length). The multiplicative scramble gives avalanche so structurally
    * similar tokens ("tok30"/"qqq30") land far apart in hash space. */
  def tokval(t: Column): Column =
    ((ascii(t) * lit(65536L) + ascii(substring(t, -1, 1)) * lit(256L) + length(t))
      .cast("long") * lit(2654435761L)) % lit(MinHashP)

  /** SQL fragment computing the same tokval for a token expression. */
  def tokvalSql(t: String): String =
    s"(((ascii($t) * 65536 + ascii(substr($t, length($t), 1)) * 256 + length($t)) * 2654435761) % ${MinHashP})"

  /** MinHash permutation h: min over tokens of (a_h * tokval + b_h) mod P,
    * with a_h/b_h derived from the permutation index by Knuth's
    * multiplicative constant. */
  def minhashTerm(tv: Column, h: Column): Column = {
    val a = (h.cast("long") * lit(2654435761L) % lit(1000003L)) * lit(2L) + lit(1L)
    val b = h.cast("long") * lit(40503L) + lit(17L)
    (a * tv + b) % lit(MinHashP)
  }

  def minhashTermSql(tv: String, h: String): String =
    s"((((($h * 2654435761) % 1000003) * 2 + 1) * $tv + $h * 40503 + 17) % ${MinHashP})"

  /** Word n-gram shingles via higher-order functions — no explode/join, so
    * shingling stays inside WholeStageCodegen. 1-based element_at matches
    * DuckDB's 1-based list indexing. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB equivalent of [[shingles3]] over a list expression. */
  def shingles3Sql(toks: String): String =
    s"list_transform(range(1, greatest(len($toks) - 1, 1)), i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2])"
}
