package graft.crawl

import java.sql.Timestamp

/** SPI seam for the reference's browser-proxy source — S5, the one §2
  * component whose real implementation is out of sandbox scope (no
  * network, no WebView): the reference routes JS-heavy sites through a
  * rendering proxy that returns the post-JS DOM
  * (/root/reference/Source/WebCrawler.Proxy/Windows/RequestProxy.xaml.cs:53-145,
  * /root/reference/Source/WebCrawler.Queue/ProxyDispatcher.cs:51-110).
  *
  * The Spark-side architecture is the page-table-lookup shape either
  * way (SURVEY §2.1): tasks for hosts whose rule sets
  * `RuleSpec.browser_fetch` are diverted from the snapshot fetch-join
  * to a `mapPartitions` over this service — one binding per partition,
  * calls inside the partition iterator, politeness/scheduling already
  * applied upstream exactly as for snapshot fetches. A production
  * implementation wraps an HTTP client to a headless-browser fleet;
  * tests bind a deterministic fake (WaveEdgeSpec) — swapping one for
  * the other changes NOTHING in the engine plan.
  *
  * Implementations must be Serializable (the binding ships to
  * executors) and thread-safe per instance (one instance may serve
  * several partitions of one executor).
  */
trait RenderFetcher extends Serializable {

  /** Fetch + render one URL. None = fetch failure (counted per host in
    * the wave metrics like any snapshot miss). */
  def fetch(url: String): Option[RenderFetcher.Rendered]
}

object RenderFetcher {
  /** One rendered page: the post-render HTML bytes and the fetch
    * time (stamped by the service — the analogue of the snapshot
    * table's `warc_ts`). */
  final case class Rendered(html: Array[Byte], fetchedAt: Timestamp)
}
