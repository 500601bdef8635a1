package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup keys — the standard
  * pre-filter of CommonCrawl-derived pipelines (CCNet / RefinedWeb
  * normalize URLs before any content dedup, since the same page is
  * recrawled under scheme/www/port/tracking-param variants).
  *
  * Expression-only by design: nine chained `regexp_replace`/`lower`
  * calls that stay inside whole-stage codegen on the scan — no UDF, no
  * shuffle; at 100 TB the canonical key is computed where the row is
  * read and feeds the usual hash-groupBy survivor pick.
  *
  * Reference behavior surveyed from the public pipeline literature, not
  * any single implementation: lowercase; strip scheme and `www.`; strip
  * default ports; drop the fragment; remove tracking parameters
  * (`utm_*`, `fbclid`) wherever they sit in the query string; collapse
  * the separator artifacts those removals leave; strip a trailing
  * slash. Each pattern is anchored so engines with replace-first vs
  * replace-all defaults agree once the oracle passes the `g` flag.
  */
object UrlCanonical {
  def canonicalizeUrl(u: Column): Column = {
    val steps: Seq[Column => Column] = Seq(
      c => lower(c),
      c => regexp_replace(c, "^https?://", ""),
      c => regexp_replace(c, "^www\\.", ""),
      c => regexp_replace(c, ":(443|80)/", "/"),
      c => regexp_replace(c, "#.*$", ""),
      // a tracking param followed by another param: drop it AND its
      // trailing separator
      c => regexp_replace(c, "(utm_[a-z]+|fbclid)=[^&#]*&", ""),
      // a tracking param at the end: drop it AND its leading separator
      c => regexp_replace(c, "[?&](utm_[a-z]+|fbclid)=[^&#]*$", ""),
      // '/?q=' -> '?q=' so path-slash variants converge when a query
      // string follows
      c => regexp_replace(c, "/\\?", "?"),
      c => regexp_replace(c, "/$", ""))
    steps.foldLeft(u)((c, f) => f(c))
  }
}
