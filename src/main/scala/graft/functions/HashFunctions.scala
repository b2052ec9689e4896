package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Stable, engine-portable hashes used by the dedup / LSH operators.
  *
  * All hashes derive from md5 over UTF-8 so an external ANSI-SQL engine
  * can reproduce them exactly (`('0x' || substr(md5(x),1,14))::bigint`
  * in DuckDB == `conv(substr(md5(x),1,14), 16, 10)` here) — that makes
  * MinHash/LSH results oracle-checkable instead of
  * implementation-defined. md5 is codegen'd (no Scala UDF) and cheap
  * relative to the shuffle these operators feed.
  */
object HashFunctions {

  /** 56-bit stable hash of a string column (14 hex digits of md5 —
    * fits a signed long with headroom).
    */
  def stableHash56(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** 52-bit variant (13 hex chars): for code paths that carry the hash
    * through a DOUBLE (e.g. TopKAgg scores) — 52 bits are exactly
    * representable in a 53-bit mantissa, where 56-bit values would
    * round and could reorder near-equal hashes vs. an integer-ordering
    * oracle.
    */
  def stableHash52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  /** Seeded variant: independent hash families for MinHash —
    * h_i(x) = stableHash56(i || ':' || x).
    */
  def seededHash56(seed: Int, c: Column): Column =
    stableHash56(concat(lit(s"$seed:"), c))

  /** Kirsch–Mitzenmacher two-hash family: ONE md5 per input yields
    * (h1, h2) = (hex[1..14], hex[15..28]) and every seeded hash is
    * h_i = (h1 + i*h2) mod 2^56 — k hash families for the price of one
    * digest, the standard construction for MinHash/Bloom filters. With
    * 16 minhash seeds this cuts the signature stage's md5 calls 16×.
    * No overflow: h1, h2 < 2^56 and i <= 63 keeps h1 + i*h2 < 2^62
    * (DuckDB, which errors on BIGINT overflow, replays it verbatim).
    */
  def kmHashPair(c: Column): Column = {
    val hex = md5(c)
    struct(conv(substring(hex, 1, 14), 16, 10).cast("long").as("h1"),
      conv(substring(hex, 15, 14), 16, 10).cast("long").as("h2"))
  }

  def kmHash(pair: Column, seed: Int): Column = {
    // h1 + seed*h2 < 2^56 + 127*2^56 = 2^63 stays in Long; beyond 127
    // Spark would silently wrap negative while DuckDB raises — fail
    // fast here instead of diverging between engines
    require(seed >= 0 && seed <= 127, s"km seed must be in [0, 127], got $seed")
    (pair.getField("h1") + lit(seed.toLong) * pair.getField("h2")) % lit(1L << 56)
  }

  /** Content fingerprint: md5 hex of the raw string. */
  def contentHash(c: Column): Column = md5(c)

  /** Normalized fingerprint: lower-case, whitespace collapsed — the
    * "document fingerprinting" form that survives trivial edits.
    */
  def normalizedFingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Whitespace tokenization shared by the text + dedup operators.
    * `\s+` on the trimmed string matches DuckDB's
    * `regexp_split_to_array(trim(x), '\s+')`.
    */
  def tokens(c: Column): Column = split(trim(c), "\\s+")
}
