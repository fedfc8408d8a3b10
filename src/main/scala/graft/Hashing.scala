package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Overflow-safe 32-bit multiplicative hash shared by the sampling /
  * split-assignment queries (q226 split manifest, q228 leakage audit,
  * q224/q229 sampled dedup eval) and their DuckDB oracles.
  *
  * The naive Knuth form `(id * 2654435761) % 2^32` overflows signed
  * 64-bit once id ≳ 3.47e9 — Spark would silently wrap (negative
  * remainder → every doc lands in 'train') while DuckDB RAISES on BIGINT
  * overflow, so engine and oracle would diverge exactly at the scale the
  * split claims to serve. Folding the id through the largest prime below
  * 2^30 first bounds the product at 1073741788 × 2654435761 ≈ 2.85e18 <
  * 2^63−1, so the hash is total over the ENTIRE non-negative BIGINT id
  * range and both engines compute it identically (no wrap, no raise).
  * The fold costs injectivity: ids differing by exactly FoldPrime
  * (~1.07e9) collide, so beyond 2^30 the hash is a FoldPrime-periodic
  * function of id — split/sample RATES stay unbiased (each residue class
  * is hashed uniformly), but id ranges straddling multiples of FoldPrime
  * get perfectly correlated assignments. Consumers that need full-range
  * injectivity (e.g. pair-level samplers keyed on the hash itself rather
  * than its bucket) must not rely on this function. Determinism and
  * pure-function-of-id (the properties the split manifest's
  * reproducible-release story rests on) are unchanged.
  * Precondition: id ≥ 0 (both engines give sign-of-dividend remainders).
  */
object Hashing {
  /** Largest prime < 2^30 — caps `fold * Knuth` inside signed 64-bit. */
  val FoldPrime = 1073741789L
  /** Knuth's multiplicative-hash constant (TAOCP vol. 3, §6.4). */
  val Knuth = 2654435761L
  val Mod32 = 4294967296L

  /** `((id % FoldPrime) * Knuth) % 2^32` — uniform per FoldPrime residue
    * class; NOT injective past 2^30 (id and id+FoldPrime collide).
    */
  def hash32(c: Column): Column =
    ((c % lit(FoldPrime)) * lit(Knuth)) % lit(Mod32)

  /** DuckDB rendering of [[hash32]] — textually identical arithmetic. */
  def sqlHash32(expr: String): String =
    s"((($expr) % $FoldPrime) * $Knuth) % $Mod32"

  /** Driver/spec-side re-derivation (same arithmetic on JVM longs). */
  def jvmHash32(id: Long): Long = ((id % FoldPrime) * Knuth) % Mod32
}
