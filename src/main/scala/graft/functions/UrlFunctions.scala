package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-grade URL canonicalization — the normalization web-corpus
  * pipelines run BEFORE exact/near dedup so that the same resource
  * fetched under cosmetic variations collapses to one key. The rules
  * are the widely published conservative set (they never merge two
  * genuinely different resources):
  *
  *  - scheme and host lowercase (RFC 3986 §6.2.2.1 case normalization)
  *  - leading `www.` dropped from the host
  *  - default ports `:80`/`:443` dropped
  *  - fragment (`#…`) dropped — never sent to the server
  *  - `utm_*` tracking parameters dropped
  *  - remaining query parameters sorted (order never matters to a
  *    well-behaved server; sorting makes equal param SETS equal keys)
  *  - trailing slashes stripped from the path
  *
  * Everything is builtin string/array expressions (split / lower /
  * filter / array_sort / concat — all codegen'd, SQL-replayable on
  * any engine); path case is preserved (paths are case-sensitive).
  * NULL in → NULL out.
  */
object UrlFunctions {

  def canonicalizeUrl(url: Column): Column = {
    // get() (not getItem) — a missing separator yields a 1-element
    // split and ANSI mode makes an out-of-bounds getItem THROW;
    // get() returns NULL, which is exactly the "absent part" we want
    val noFrag = get(split(url, "#", 2), lit(0))
    val pre = get(split(noFrag, "\\?", 2), lit(0))
    // absent query → get(…,1) is NULL → canonQ NULL → no '?' appended
    val query = get(split(noFrag, "\\?", 2), lit(1))
    val scheme = lower(get(split(pre, "://", 2), lit(0)))
    val rest = get(split(pre, "://", 2), lit(1))
    val hostPort = get(split(rest, "/", 2), lit(0))
    // path keeps its case; rtrim strips ALL trailing slashes
    val path = rtrim(rest.substr(length(hostPort) + 1, lit(Int.MaxValue)), "/")
    val host = regexp_replace(
      regexp_replace(lower(hostPort), "^www\\.", ""), ":(80|443)$", "")
    // substring-compare beats LIKE here: '_' is a LIKE wildcard and the
    // oracle-side escape rules differ per engine
    val params = filter(split(query, "&"),
      p => substring(p, 1, 4) =!= "utm_")
    val canonQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(canonQ.isNotNull && canonQ =!= "", concat(lit("?"), canonQ))
        .otherwise(lit("")))
  }
}
