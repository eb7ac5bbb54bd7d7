package graft.ops

import graft.core.UrlCanon
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** The dot-suffix chain of a hostname: `a.b.c` →
    * `[a.b.c, b.c, c]` — every domain the host equals or sits under.
    * Pure Catalyst (split + transform over sequence), the unit a
    * domain-blocklist match explodes to. */
  def hostSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts)), "."))
  }

  /** UT1-style domain-blocklist filter — the adult/malware/spam domain
    * scrub crawl corpora pass through before training: a row is dropped
    * when its host EQUALS a blocked domain or is a SUBDOMAIN of one
    * (`ads.example.com` is blocked by `example.com`).
    *
    * Scale shape: suffix matching becomes an equi-join by exploding
    * each host into its dot-suffix chain (bounded by label depth, ≤ ~6)
    * on a SLIM (key, suffix) projection — bodies never ride the
    * explode; the blocklist (driver-bounded: UT1 is a few million
    * rows) broadcasts into a semi-join, so blocked keys emerge from a
    * map-side hash probe; the final left_anti against the original
    * rows joins on the 8-byte key. Nothing quadratic, no UDF, and the
    * blocklist is a TABLE (not a literal IN), so a 10⁶-domain list
    * costs a broadcast, not a plan blow-up. */
  def dropBlockedHosts(rows: DataFrame, blocklist: DataFrame,
                       keyCol: String, hostCol: String): DataFrame = {
    // normalize BOTH sides before suffix matching: lowercase + strip
    // trailing dots, so the absolute-FQDN form 'ads.example.com.' (legal,
    // and preserved by UrlCanon.host) and mixed-case hosts from callers
    // that bypassed UrlCanon can't evade the blocklist
    def norm(c: Column): Column = lower(regexp_replace(c, "\\.+$", ""))
    val blockedKeys = rows
      .select(col(keyCol), explode(hostSuffixes(norm(col(hostCol)))).as("sfx"))
      .join(broadcast(blocklist.select(norm(col("domain")).as("sfx"))),
        Seq("sfx"), "left_semi")
      .select(keyCol).distinct()
    rows.join(blockedKeys, Seq(keyCol), "left_anti")
  }
}
