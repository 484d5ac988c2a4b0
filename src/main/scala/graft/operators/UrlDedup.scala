package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** dd21: URL-CANONICALIZATION dedup — the crawl-level FIRST pass every
  * published web pipeline runs before any content dedup (CommonCrawl's
  * URL-level dedup; RefinedWeb §3.1 runs URL dedup before MinHash; C4
  * likewise): the same page is fetched under many spellings — case-varied
  * hosts, tracking parameters, trailing slashes, fragments — and
  * canonicalizing then keeping one fetch per canonical URL removes the
  * cheapest duplicate class at O(1) per document, no content comparison.
  *
  * The corpus carries no URL column, so (exactly like tx07's synthesized
  * PII) each document derives one DETERMINISTICALLY — doc_ids sharing a
  * page slot spell the same page differently:
  *   - host case-varies on `doc_id % 3`;
  *   - a `utm_source` tracking parameter appears on `doc_id % 2`;
  *   - a trailing slash on `doc_id % 5`;
  *   - a `#fragment` on `doc_id % 7`.
  *
  * Canonicalization (the published recipe): lowercase scheme+host, strip
  * the fragment, drop `utm_*` parameters, strip the trailing slash. Kept
  * fetch per canonical URL = lowest doc_id (deterministic survivor, dd07's
  * convention). No backreference replacements — Spark (Java regex) and
  * DuckDB (RE2) only share plain-text substitution semantics.
  *
  * Scale: one narrow codegen projection per document builds and
  * canonicalizes the URL (no shuffle), then ONE hash aggregate per
  * canonical group (min doc_id + group size, partial-agg friendly) and an
  * equi-join back — the same shape as dd01 exact dedup, never all-pairs.
  */
object UrlDedup {

  // both engines build the raw URL from the same arithmetic
  private def rawUrlSql: String =
    """'https://' ||
      |  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM' ELSE 'www.example.com' END) ||
      |  '/' || source || '/page-' || CAST(doc_id % 997 AS VARCHAR) ||
      |  (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
      |  (CASE WHEN doc_id % 2 = 0
      |        THEN '?utm_source=feed&id=' || CAST(doc_id % 997 AS VARCHAR)
      |        ELSE '?id=' || CAST(doc_id % 997 AS VARCHAR) END) ||
      |  (CASE WHEN doc_id % 7 = 0 THEN '#sec' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END)"""
      .stripMargin

  val dd21 = Q(
    "dd21_url_dedup",
    s"""WITH doc AS (SELECT doc_id, ($rawUrlSql) AS raw_url FROM documents),
      |canon AS (SELECT doc_id, raw_url,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(
      |            lower(regexp_extract(raw_url, '^(https?://[^/]+)', 1)) ||
      |              regexp_replace(raw_url, '^https?://[^/]+', ''),
      |            '#.*$$', ''),
      |          '\\?utm_[^&#]*&', '?'),
      |        '&utm_[^&#]*', ''),
      |      '/\\?', '?') AS url_canon
      |  FROM doc),
      |grp AS (SELECT url_canon, MIN(doc_id) AS keeper, COUNT(*) AS n_fetches
      |  FROM canon GROUP BY url_canon)
      |SELECT c.doc_id, c.url_canon,
      |  CAST(g.n_fetches AS BIGINT) AS n_fetches,
      |  (c.doc_id = g.keeper) AS keep
      |FROM canon c JOIN grp g ON c.url_canon = g.url_canon""".stripMargin) { (s, d) =>
    val raw =
      concat(lit("https://"),
        when(col("doc_id") % 3 === 0, lit("WWW.Example.COM"))
          .otherwise(lit("www.example.com")),
        lit("/"), col("source"), lit("/page-"), (col("doc_id") % 997).cast("string"),
        when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 2 === 0,
          concat(lit("?utm_source=feed&id="), (col("doc_id") % 997).cast("string")))
          .otherwise(concat(lit("?id="), (col("doc_id") % 997).cast("string"))),
        when(col("doc_id") % 7 === 0,
          concat(lit("#sec"), (col("doc_id") % 5).cast("string"))).otherwise(lit("")))
    val canon = {
      val noFrag = regexp_replace(raw, "#.*$", "")
      val hostLower = concat(
        lower(regexp_extract(noFrag, "^(https?://[^/]+)", 1)),
        regexp_replace(noFrag, "^https?://[^/]+", ""))
      val noUtm = regexp_replace(
        regexp_replace(hostLower, "\\?utm_[^&#]*&", "?"), "&utm_[^&#]*", "")
      regexp_replace(noUtm, "/\\?", "?")
    }
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), canon.as("url_canon"))
    val grp = docs.groupBy("url_canon")
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_fetches"))
    docs.join(grp, "url_canon")
      .select(col("doc_id"), col("url_canon"),
        col("n_fetches").cast("long").as("n_fetches"),
        (col("doc_id") === col("keeper")).as("keep"))
  }
}
