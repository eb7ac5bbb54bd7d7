package graft.core

import java.util.regex.Pattern

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** DOM link-tree catalog auto-detection — the faithful re-expression of
  * the reference's `HtmlAnalyzer` auto path over [[MiniDom]] trees
  * (/root/reference/Source/WebCrawler/Analyzers/HtmlAnalyzer.cs:
  * GetValidLinks :13-33, AutoDetectCatalogs :239-282, GetSimilarLinks
  * :368-381, FilterBlocks :383-391, BuildLinkTrees :393-465,
  * PopulatePublishDate :467-473, RemoveNoiseBranches :480-571,
  * RemoveShortContinuousLinksFromTree :573-609, LinkTreeNode :741-1053):
  *
  *  1. collect every `<a href>` with its indexed DOM path
  *     (`/html[1]/body[1]/ul[1]/li[2]/a[1]` — HtmlAgilityPack XPath
  *     shape), dropping fragment/javascript links;
  *  2. group similar links by index-stripped path, excluding
  *     noise areas (`\b(header|footer|aside|nav|abbr)\b` on the path)
  *     and small / short-text groups;
  *  3. fold each group's consecutive links into LINK TREES via the
  *     continuity rules (index+1 across the shared parent, identical
  *     child path for upward travel);
  *  4. populate per-node raw dates from each iteration container's
  *     text, then REMOVE NOISE BRANCHES: adopt the most-dated subtree
  *     when ≥5 nodes are dated, drop undated / short-text / duplicate-
  *     url columns, trim short-text head/tail runs, simplify;
  *  5. convert surviving trees to blocks (iteration path `…/li[*]/a[1]`
  *     + link-text score), filter small/short blocks;
  *  6. per block, extract items through the SAME container/relative
  *     XPath walk the rule engine uses; keep the first non-empty block
  *     ordered all-dated-first then score desc.
  */
object LinkTreeDetect {

  final case class Link(xpath: String, url: String, text: String)

  /** One extracted catalog item (pre-canonicalization). `publishedRaw`
    * marks partial date/time strings — the reference's `HasDate`
    * includes them (CatalogItem.HasDate, HtmlAnalyzer.cs:730-736). */
  final case class RawItem(url: String, title: String,
      published: Option[java.time.LocalDateTime], publishedRaw: Option[String]) {
    def hasDate: Boolean = published.isDefined || publishedRaw.isDefined
  }

  // Constants.cs:8-11
  private val MinLinkCount = 3
  private val MinLinkTextLen = 10
  private val MinLinkTextLenSafe = 5
  private val MinLinkCountDated = 5

  private val noiseArea = Pattern.compile("(?i)\\b(header|footer|aside|nav|abbr)\\b")
  private val nodeIndex = Pattern.compile("\\[\\d+\\]")
  private val firstInt = Pattern.compile("\\d+")

  // ---- link collection --------------------------------------------------

  /** Walk the DOM once: HAP-style indexed path per element node, an
    * index (path → node) for container text lookups, and the valid
    * links in document order (GetValidLinks, HtmlAnalyzer.cs:13-33). */
  private def collect(root: DomNode): (Vector[Link], mutable.HashMap[String, DomNode]) = {
    val links = Vector.newBuilder[Link]
    val byPath = mutable.HashMap.empty[String, DomNode]
    def walk(n: DomNode, path: String): Unit = {
      val tagCounts = mutable.HashMap.empty[String, Int]
      n.children.foreach { c =>
        if (!c.isText) {
          val i = tagCounts.updateWith(c.tag)(v => Some(v.getOrElse(0) + 1)).get
          val p = s"$path/${c.tag}[$i]"
          byPath(p) = c
          if (c.tag == "a") {
            c.attr("href").foreach { href =>
              val h = href.trim
              if (h.nonEmpty && !h.startsWith("#") &&
                  !h.toLowerCase(java.util.Locale.ROOT).startsWith("javascript"))
                links += Link(p, h, TextNormalize.normalizeText(c.innerText))
            }
          }
          walk(c, p)
        }
      }
    }
    walk(root, "")
    (links.result(), byPath)
  }

  // ---- LinkTreeNode (HtmlAnalyzer.cs:741-1053) --------------------------

  private final class TNode(val path: String, val link: Link) {
    def this(path: String) = this(path, null)
    val segments: Array[String] = path.split('/')
    val depth: Int = segments.length
    var parent: TNode = _
    val children: ArrayBuffer[TNode] = ArrayBuffer.empty
    var publishedRaw: Option[String] = None

    def hasDate: Boolean = publishedRaw.isDefined
    def isLeafLink: Boolean = link != null

    def updateRelations(p: TNode, kids: TNode*): Unit = {
      if (p == null) {
        if (parent != null) parent.children -= this
        parent = null
      } else if (p ne parent) {
        if (parent != null) parent.children -= this
        parent = p
        p.children += this
      }
      kids.foreach(_.updateRelations(this))
    }

    def sharedParentPath(other: TNode): (String, Int) = {
      var lvl = 0
      while (lvl < segments.length && lvl < other.segments.length &&
        segments(lvl) == other.segments(lvl)) lvl += 1
      (containerPath(lvl), lvl)
    }

    def relativePath(d: Int): String = segments.drop(d).mkString("/")
    def containerPath(d: Int): String = segments.take(d).mkString("/")

    def indexUnder(parentPath: String): Int =
      if (parentPath.isEmpty) 0
      else {
        val rel = relativePath(TNode.pathDepth(parentPath))
        val m = firstInt.matcher(rel)
        if (m.find()) m.group().toInt else 0
      }

    def iterationRelativePath(parentPath: String): String =
      if (parentPath == null || parentPath.isEmpty) path
      else relativePath(TNode.pathDepth(parentPath) + 1)

    /** e.g. `/html[1]/body[1]/ul[1]/li[1]` for leaf `…/li[1]/a[1]`
      * whose parent node is `…/ul[1]` (GetIterationContainerPath). */
    def iterationContainerPath: String =
      if (parent == null) path else containerPath(parent.depth + 1)

    def getRoot: TNode = { var t = this; while (t.parent != null) t = t.parent; t }

    def descendants(leafOnly: Boolean = false,
        out: ArrayBuffer[TNode] = ArrayBuffer.empty): ArrayBuffer[TNode] = {
      if (!leafOnly || isLeafLink) out += this
      children.foreach(_.descendants(leafOnly, out))
      out
    }

    /** Depth below which ALL children are dated (GetDatedChildrenDepth). */
    def datedChildrenDepth: Int =
      if (!hasDate) -1
      else if (children.isEmpty || children.exists(!_.hasDate)) depth
      else math.max(depth + 1, children.map(_.datedChildrenDepth).min)

    /** Iteration path with `[*]` at every container-iteration depth
      * (GetIterationPath). */
    def iterationPath: Option[String] = {
      val nodes = descendants()
      val firstLeaf = nodes.find(_.isLeafLink).getOrElse(return None)
      val iterDepths = nodes.filter(!_.isLeafLink).map(_.depth).toSet
      val sb = new StringBuilder
      firstLeaf.segments.zipWithIndex.drop(1).foreach { case (seg, d) =>
        val part = if (iterDepths.contains(d)) nodeIndex.matcher(seg).replaceAll("[*]")
          else seg
        sb.append('/').append(part)
      }
      Some(sb.toString)
    }

    /** Collapse single-child chains; drop childless containers
      * (Simplify, HtmlAnalyzer.cs:990-1023). */
    def simplify(): TNode = {
      val valid = children.toArray.map(_.simplify()).filter(_ != null)
      if (valid.isEmpty) {
        if (isLeafLink) this
        else { updateRelations(null); null }
      } else if (valid.length == 1) {
        valid(0).updateRelations(parent)
        updateRelations(null)
        valid(0)
      } else this
    }
  }

  private object TNode {
    def pathDepth(p: String): Int = p.split('/').length
  }

  private final case class Block(linkPath: String, linkCount: Int, linkTextLength: Int) {
    def score: Long = linkTextLength.toLong // Block.Score, HtmlAnalyzer.cs:675-682
  }

  // ---- tree building (BuildLinkTrees, HtmlAnalyzer.cs:393-465) ----------

  private def buildLinkTrees(links: Seq[Link]): Vector[TNode] = {
    val trees = ArrayBuffer.empty[TNode]
    var prevLeaf: TNode = null
    links.foreach { link =>
      val curLeaf = new TNode(link.xpath, link)
      if (prevLeaf == null) trees += curLeaf
      else {
        val (parentPath, parentDepth) = curLeaf.sharedParentPath(prevLeaf)
        var temp = prevLeaf
        while (temp.parent != null && temp.parent.depth > parentDepth)
          temp = temp.parent
        val index1 = temp.indexUnder(parentPath)
        val index2 = curLeaf.indexUnder(parentPath)
        if (temp.parent == null) { // travel up, new iteration
          if (index2 == index1 + 1 &&
            (index1 == 1 ||
              temp.iterationRelativePath(parentPath) == curLeaf.iterationRelativePath(parentPath)))
            new TNode(parentPath).updateRelations(null, temp, curLeaf)
          else trees += curLeaf
        } else if (temp.parent.path == parentPath) { // same match
          if (index2 == index1 + 1) curLeaf.updateRelations(temp.parent)
          else trees += curLeaf
        } else if (temp.parent.depth < parentDepth) { // travel down
          if (index2 == index1 + 1)
            new TNode(parentPath).updateRelations(temp.parent, temp, curLeaf)
          else trees += curLeaf
        }
      }
      prevLeaf = curLeaf
    }
    trees.map(_.getRoot).toVector
  }

  private def populatePublishDate(node: TNode,
      byPath: mutable.HashMap[String, DomNode]): Unit = {
    node.publishedRaw = byPath.get(node.iterationContainerPath)
      .flatMap(n => ArticleExtractor.getPublishDateRaw(n.innerText))
    node.children.toArray.foreach(populatePublishDate(_, byPath))
  }

  // ---- noise-branch removal (HtmlAnalyzer.cs:480-609) -------------------

  private def removeNoiseBranches(root0: TNode): Option[TNode] = {
    var root = root0
    val treeNodes0 = root.descendants()
    val datedRoot = treeNodes0.iterator
      .filter(!_.isLeafLink)
      .map(o => (o, o.datedChildrenDepth))
      .filter(_._2 > 0)
      .foldLeft(Option.empty[(TNode, Int)]) { (best, cur) =>
        if (best.forall(_._2 < cur._2)) Some(cur) else best
      } // OrderByDescending().First() keeps the FIRST of max value

    datedRoot.foreach { case (dr, drDepth) =>
      val nodes = dr.descendants()
      val datedIteration = nodes.count(_.hasDate) >= MinLinkCountDated
      if (datedIteration) {
        root = dr
        root.updateRelations(null) // adopt and separate from parent tree
        var leafNodes = nodes.filter(_.isLeafLink).toVector
        // group leaves by COLUMN = relative path below the dated depth
        val byColumn = leafNodes.groupBy(_.relativePath(drDepth))
        if (byColumn.size < leafNodes.length) { // only for >1 columns
          val columnsWithDate = byColumn.filter(_._2.forall(_.hasDate)).keySet
          byColumn.foreach { case (key, col) =>
            val shortText = col.map(_.link.text.length).sum.toDouble / col.size < MinLinkTextLen
            if ((columnsWithDate.nonEmpty && !columnsWithDate.contains(key)) || shortText)
              col.foreach(_.updateRelations(null))
          }
          leafNodes = root.descendants(leafOnly = true).toVector
          val colKey = (n: TNode) => n.segments.drop(drDepth).mkString("/")
          val byColumn2 = leafNodes.groupBy(colKey)
          // among duplicate-url columns keep the min-avg-text one;
          // equal averages tie-break on DOCUMENT ORDER of the column's
          // first link (the reference's LINQ GroupBy is insertion-
          // ordered and OrderBy stable — a HashMap-iteration tie-break
          // would pick a different survivor across runs/Scala versions)
          val firstIdx: Map[String, Int] = leafNodes.zipWithIndex
            .groupMapReduce(p => colKey(p._1))(_._2)(math.min)
          val dupCols = byColumn2.toVector
            .filter { case (_, col) => col.map(_.link.url).distinct.size > 1 }
            .map { case (key, col) =>
              (col, col.map(_.link.text.length).sum / col.size, firstIdx(key)) }
            .sortBy { case (_, avg, idx) => (avg, idx) }
          dupCols.drop(1).foreach(_._1.foreach(_.updateRelations(null)))
          root = root.simplify()
        }
      }
    }

    if (root == null || root.isLeafLink) return None

    // trim head/tail runs of short-text sibling links
    removeShortContinuousLinks(root.descendants(leafOnly = true).toVector, fromHead = true)
    removeShortContinuousLinks(root.descendants(leafOnly = true).toVector, fromHead = false)

    Option(root.simplify())
  }

  private def removeShortContinuousLinks(leaves0: Vector[TNode], fromHead: Boolean): Unit = {
    val leaves = if (fromHead) leaves0 else leaves0.reverse
    var index = 0
    var go = true
    while (go && index < leaves.length) {
      val lnk = leaves(index)
      var run = leaves.drop(index)
      val nextGroup = run.indexWhere(_.parent ne lnk.parent)
      if (nextGroup != -1) run = run.take(nextGroup)
      if (run.map(_.link.text.length).sum.toDouble / run.size < MinLinkTextLenSafe) {
        run.foreach(_.updateRelations(null))
        index += run.size
      } else go = false
    }
  }

  // ---- per-block item extraction (GetCatalogItems, cs:284-366) ----------

  /** Shared with the XPath RULE path (a rule's ContentUrlExp link path
    * goes through the same Block.ContainerPath / RelativeLinkXPath
    * split — HtmlAnalyzer.cs:82,666-720). */
  def itemsFromLinkPath(doc: DomNode, linkPath: String,
      validateDate: Boolean): Vector[RawItem] = {
    val starIdx = linkPath.lastIndexOf("[*]")
    val (containerPath, relLink) =
      if (starIdx < 0) (linkPath, ".")
      else (linkPath.substring(0, starIdx), "." + linkPath.substring(starIdx + 3))
    var items = MiniXPath.selectNodes(doc, containerPath).flatMap { block =>
      val linkNode =
        if (relLink == ".") Some(block)
        else MiniXPath.selectSingle(block, relLink)
      linkNode.flatMap { ln =>
        ln.attr("href").filter(_.nonEmpty).map { href =>
          val blockText = block.innerText
          RawItem(href,
            TextNormalize.normalizeText(ln.innerText),
            ArticleExtractor.getPublishDate(blockText),
            ArticleExtractor.getPublishDateRaw(blockText))
        }
      }
    }
    // dedup by url keeping the first TITLED item, in first-occurrence
    // order; untitled-only urls are dropped (HtmlAnalyzer.cs:328-335)
    locally {
      val order = Vector.newBuilder[String]
      val seenUrl = mutable.HashSet.empty[String]
      val chosen = mutable.HashMap.empty[String, RawItem]
      items.foreach { r =>
        if (seenUrl.add(r.url)) order += r.url
        if (!chosen.contains(r.url) && r.title.nonEmpty) chosen(r.url) = r
      }
      items = order.result().flatMap(chosen.get)
    }
    // trim undated head/tail when the dated run is significant (W4)
    if (validateDate && items.count(_.hasDate) >= MinLinkCountDated) {
      val from = items.indexWhere(_.hasDate)
      val last = items.lastIndexWhere(_.hasDate)
      items = items.slice(from, last + 1)
    }
    // trim short-text head/tail links — guard mirrors the reference
    // literally, quirks included (HtmlAnalyzer.cs:356-363)
    val fromIdx = items.indexWhere(_.title.length >= MinLinkTextLenSafe)
    val endIdx = items.lastIndexWhere(_.title.length >= MinLinkTextLenSafe)
    if (fromIdx > 0 || endIdx > 0)
      items = items.slice(fromIdx, endIdx + 1)
    items
  }

  // ---- the auto-detect pipeline -----------------------------------------

  /** Winning block's items, or empty. Also exposes the winning
    * iteration path for the rule-editor assist (U12, DetectListPath). */
  def detectWithPath(html: String): (Vector[RawItem], Option[String]) = {
    val doc = MiniDom.parse(html)
    val (links, byPath) = collect(doc)
    if (links.isEmpty) return (Vector.empty, None)

    // group similar links (GetSimilarLinks) — insertion-ordered
    val groups = mutable.LinkedHashMap.empty[String, ArrayBuffer[Link]]
    links.foreach { l =>
      if (!noiseArea.matcher(l.xpath).find()) {
        val key = nodeIndex.matcher(l.xpath).replaceAll("")
        groups.getOrElseUpdate(key, ArrayBuffer.empty) += l
      }
    }
    val similar = groups.values.filter(g =>
      g.size >= MinLinkCount &&
        g.map(l => Option(l.text).map(_.length).getOrElse(0)).max >= MinLinkTextLen)

    var trees = similar.flatMap(g => buildLinkTrees(g.toSeq)).toVector
    trees.foreach(populatePublishDate(_, byPath))
    trees = trees.flatMap(removeNoiseBranches)

    val blocks = trees.flatMap { t =>
      t.iterationPath.map { p =>
        val ls = t.descendants(leafOnly = true)
        Block(p, ls.size, ls.map(_.link.text.length).sum)
      }
    }.filter(b => b.linkTextLength.toDouble / b.linkCount >= MinLinkTextLen &&
      b.linkCount >= MinLinkCount) // FilterBlocks

    // per-block items; winner = all-dated first, then score desc,
    // stable on block order (DetectCatalogItems, HtmlAnalyzer.cs:54-73)
    val withItems = blocks
      .map(b => (b, itemsFromLinkPath(doc, b.linkPath, validateDate = true)))
      .filter(_._2.nonEmpty)
    if (withItems.isEmpty) return (Vector.empty, None)
    val best = withItems.zipWithIndex.maxBy { case ((b, items), i) =>
      (if (items.forall(_.hasDate)) 1 else 0, b.score, -i)
    }._1
    (best._2, Some(best._1.linkPath))
  }
}
