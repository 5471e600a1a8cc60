package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first-pass key for crawl dedup (exact-URL
  * dedup runs before any content hashing in CommonCrawl-style pipelines,
  * because re-crawls of one page differ only in their URL decoration).
  *
  * Canonical form, applied in order:
  *   1. strip the fragment (`#...`)
  *   2. lowercase the scheme and the authority (host[:port])
  *   3. drop a default port (`:80` http, `:443` https) and a leading `www.`
  *   4. collapse duplicate `/` in the path and strip one trailing `/`
  *      (a bare authority canonicalizes to path `/`)
  *   5. drop tracking params (`utm_*`, `gclid`, `fbclid`, `ref`), sort the
  *      survivors byte-wise, and re-join — param order never distinguishes
  *      two URLs
  *
  * Everything is a per-row projection over Spark SQL builtins (regexes +
  * array HOFs) — it fuses into the scan, shuffles nothing, and has an
  * exact DuckDB mirror ([[canonicalizeUrlSql]]) so canonical keys are
  * engine-independent. Deliberately NOT handled (documented trade): percent-
  * encoding normalization and IDN — both need a decode table, and crawl
  * frontiers treat those variants as distinct keys anyway.
  */
object UrlFunctions {

  private val trackingRe = "^(utm_[^=]*|gclid|fbclid|ref)="

  /** Canonical URL as defined above; null stays null. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val auth = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host0 = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val host = regexp_replace(host0, "^www\\.", "")
    val pathRaw = regexp_extract(rest, "^[^/?]*([^?]*)", 1)
    val path0 = regexp_replace(pathRaw, "/{2,}", "/")
    val path1 = when(path0 === "" , lit("/"))
      .when(path0 =!= "/" , regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && not(p.rlike(trackingRe)))), "&")
    concat(scheme, lit("://"), host, path1,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** DuckDB mirror of [[canonicalizeUrl]] over a VARCHAR expression. */
  def canonicalizeUrlSql(expr: String): String = {
    val noFrag = s"regexp_replace($expr, '#.*$$', '')"
    val scheme = s"lower(regexp_extract($noFrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val rest = s"regexp_replace($noFrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    val auth = s"lower(regexp_extract($rest, '^([^/?]*)', 1))"
    val host0 = s"""CASE WHEN $scheme = 'http' THEN regexp_replace($auth, ':80$$', '')
                   | WHEN $scheme = 'https' THEN regexp_replace($auth, ':443$$', '')
                   | ELSE $auth END""".stripMargin.replace("\n", "")
    val host = s"regexp_replace($host0, '^www\\.', '')"
    val pathRaw = s"regexp_extract($rest, '^[^/?]*([^?]*)', 1)"
    val path0 = s"regexp_replace($pathRaw, '/{2,}', '/', 'g')"
    val path1 = s"""CASE WHEN $path0 = '' THEN '/'
                   | WHEN $path0 <> '/' THEN regexp_replace($path0, '/$$', '')
                   | ELSE $path0 END""".stripMargin.replace("\n", "")
    val query = s"regexp_extract($rest, '\\?(.*)$$', 1)"
    val kept = s"""array_to_string(list_sort(list_filter(string_split($query, '&'),
                  | p -> p <> '' AND NOT regexp_matches(p, '$trackingRe'))), '&')""".stripMargin.replace("\n", "")
    s"""$scheme || '://' || $host || $path1 ||
       | CASE WHEN $kept = '' THEN '' ELSE '?' || $kept END""".stripMargin.replace("\n", "")
  }
}
