package graft.core

import scala.collection.mutable

/** XPath subset evaluator over [[MiniDom]] trees — covers the
  * expression shapes the reference's rule table holds in its
  * cnt_exp_root/url/title/date/content/author columns
  * (/root/reference/Source/MySQLSchema.sql:44-61), evaluated by
  * HtmlAgilityPack SelectNodes/SelectSingleNode in the reference
  * (Analyzers/HtmlAnalyzer.cs:41-82, 155-235):
  *
  *   {{{//div[@class='news']/ul/li[星]/a}}}  (catalog link iteration —
  *   "星" standing in for the literal star, which cannot appear in a
  *   nested Scala comment), {{{//div[@id='content']}}} (article content
  *   root), {{{//h1}}}, {{{.//span[2]}}},
  *   {{{//x[contains(@class,'date')]}}} with x also meaning star.
  *
  * Grammar: `('.')? ('/' | '//') step ( ('/' | '//') step )*` where
  * step = `(name | '*')` followed by predicates
  * `[n]`, `[*]`, `[last()]`, `[@attr]`, `[@attr='v']`,
  * `[contains(@attr,'v')]`. Positional predicates rank a node among
  * its parent's matching children (standard abbreviated-XPath
  * semantics, same as HtmlAgilityPack). Unsupported syntax throws
  * IllegalArgumentException at compile so bad rules fail loudly.
  */
object MiniXPath {

  sealed trait Pred
  final case class PosEq(n: Int) extends Pred
  case object PosAny extends Pred           // [*] — every position
  case object PosLast extends Pred          // [last()]
  final case class HasAttr(name: String) extends Pred
  final case class AttrEq(name: String, v: String) extends Pred
  final case class AttrContains(name: String, v: String) extends Pred

  final case class Step(descendant: Boolean, name: String, preds: Vector[Pred])

  /** Compile an expression to steps. Leading `.` (relative) and
    * absolute forms evaluate identically here: the context node is
    * whatever the caller passes. */
  def compile(expr: String): Vector[Step] = {
    if (expr == null) throw new IllegalArgumentException("null xpath")
    var s = expr.trim
    if (s.startsWith(".")) s = s.substring(1)
    if (s.isEmpty) return Vector.empty
    if (!s.startsWith("/"))
      s = "/" + s // tolerate "div/a" as "./div/a"
    val steps = Vector.newBuilder[Step]
    var i = 0
    while (i < s.length) {
      // axis
      var desc = false
      if (s.startsWith("//", i)) { desc = true; i += 2 }
      else if (s.charAt(i) == '/') i += 1
      else throw new IllegalArgumentException(s"bad step at $i in: $expr")
      // name
      val n0 = i
      while (i < s.length && s.charAt(i) != '/' && s.charAt(i) != '[') i += 1
      val name = s.substring(n0, i).trim
      if (name.isEmpty)
        throw new IllegalArgumentException(s"empty step name in: $expr")
      if (name.startsWith("@") || name.endsWith("()"))
        throw new IllegalArgumentException(
          s"unsupported terminal '$name' (element steps only) in: $expr")
      // predicates
      val preds = Vector.newBuilder[Pred]
      while (i < s.length && s.charAt(i) == '[') {
        val close = s.indexOf(']', i)
        if (close < 0) throw new IllegalArgumentException(s"unclosed [ in: $expr")
        preds += compilePred(s.substring(i + 1, close).trim, expr)
        i = close + 1
      }
      steps += Step(desc, name.toLowerCase(java.util.Locale.ROOT), preds.result())
    }
    steps.result()
  }

  private val attrEqPat =
    java.util.regex.Pattern.compile("""@([\w:-]+)\s*=\s*(?:'([^']*)'|"([^"]*)")""")
  private val containsPat = java.util.regex.Pattern.compile(
    """contains\(\s*@([\w:-]+)\s*,\s*(?:'([^']*)'|"([^"]*)")\s*\)""")

  private def compilePred(p: String, full: String): Pred = {
    if (p == "*") return PosAny
    if (p == "last()") return PosLast
    if (p.nonEmpty && p.forall(_.isDigit)) return PosEq(p.toInt)
    val eq = attrEqPat.matcher(p)
    if (eq.matches())
      return AttrEq(eq.group(1).toLowerCase(java.util.Locale.ROOT),
        Option(eq.group(2)).getOrElse(eq.group(3)))
    val ct = containsPat.matcher(p)
    if (ct.matches())
      return AttrContains(ct.group(1).toLowerCase(java.util.Locale.ROOT),
        Option(ct.group(2)).getOrElse(ct.group(3)))
    if (p.startsWith("@") && p.drop(1).matches("""[\w:-]+"""))
      return HasAttr(p.drop(1).toLowerCase(java.util.Locale.ROOT))
    throw new IllegalArgumentException(s"unsupported predicate [$p] in: $full")
  }

  private def nameMatches(step: String, n: DomNode): Boolean =
    !n.isText && (step == "*" || n.tag == step)

  /** Evaluate one step over a context set, document order, deduped. */
  private def evalStep(ctx: Vector[DomNode], step: Step): Vector[DomNode] = {
    // candidate groups: (group = matching children of one parent) — the
    // unit positional predicates rank within
    val groups = mutable.LinkedHashMap.empty[DomNode, mutable.ArrayBuffer[DomNode]]
    def addGroup(parent: DomNode): Unit = {
      val g = groups.getOrElseUpdate(parent, mutable.ArrayBuffer.empty)
      if (g.isEmpty)
        parent.children.foreach(c => if (nameMatches(step.name, c)) g += c)
    }
    if (step.descendant) {
      def walk(n: DomNode): Unit = { addGroup(n); n.children.foreach(walk) }
      ctx.foreach(walk)
    } else ctx.foreach(addGroup)

    val out = Vector.newBuilder[DomNode]
    val seen = mutable.Set.empty[DomNode]
    groups.foreach { case (_, g0) =>
      var g: Seq[DomNode] = g0.toSeq
      step.preds.foreach { pred =>
        g = pred match {
          case PosAny         => g
          case PosEq(k)       => if (k >= 1 && k <= g.size) Seq(g(k - 1)) else Nil
          case PosLast        => g.lastOption.toSeq
          case HasAttr(a)     => g.filter(_.attr(a).isDefined)
          case AttrEq(a, v)   => g.filter(_.attr(a).contains(v))
          case AttrContains(a, v) => g.filter(_.attr(a).exists(_.contains(v)))
        }
      }
      g.foreach(n => if (seen.add(n)) out += n)
    }
    out.result()
  }

  def selectNodes(ctx: DomNode, steps: Vector[Step]): Vector[DomNode] =
    steps.foldLeft(Vector(ctx))(evalStep)

  def selectNodes(ctx: DomNode, expr: String): Vector[DomNode] =
    selectNodes(ctx, compile(expr))

  def selectSingle(ctx: DomNode, expr: String): Option[DomNode] =
    selectNodes(ctx, expr).headOption
}
