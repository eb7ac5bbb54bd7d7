package graft.ops

import graft.core.UrlCanon
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Column wrappers over the pure URL canonicalization core (UrlCanon) —
  * the north rule's frontier-key functions, usable in any DataFrame
  * plan. Deterministic scalar UDFs (pure string work, no network/DNS),
  * marked nondeterministic-free so Catalyst can push/dedup them. */
object UrlOps {

  private val canonUdf = udf((u: String) => UrlCanon.canonicalize(u))
  private val hostUdf = udf((u: String) => UrlCanon.host(u))
  private val rootUdf = udf((u: String) => UrlCanon.rootSiteUrl(u))

  /** Full canonical form (lowercase scheme/host, default ports stripped,
    * fragment dropped, percent-escapes normalized). */
  def canonicalize(url: Column): Column = canonUdf(url)

  /** Registered host, lowercased. */
  def host(url: Column): Column = hostUdf(url)

  /** Reference-compatible root-site extraction (HtmlHelper.cs:17-31). */
  def rootSite(url: Column): Column = rootUdf(url)
}
