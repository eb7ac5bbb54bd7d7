package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level text analysis for training-data pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions._`
  * (whole-stage-codegen'd Catalyst expressions — no UDFs), so filters
  * and projections using these columns still push down / prune.
  * Patterns are written in the subset of regex syntax that means the
  * same thing in Java (Spark) and RE2 (DuckDB oracle): no lookbehind,
  * no backreferences.
  */
object TextOps {

  /** Explicit whitespace character class used by EVERY token split that
    * an oracle replays. Java's `\s` includes vertical tab (\x0B) but
    * RE2's (DuckDB) does not, so `\s` is NOT engine-identical — a
    * document containing \x0B would tokenize differently in Spark vs
    * the oracle and break the bit-for-bit contract. This class spells
    * out Java's set; the oracle SQL uses the same literal characters. */
  val WsClass = "[ \\t\\n\\x0B\\f\\r]"

  /** One-or-more run of [[WsClass]] — the token-split pattern. */
  val Ws: String = WsClass + "+"

  /** Whitespace-collapsed, trimmed, lowercased canonical text. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, Ws, " ")))

  /** Exact-dup fingerprint: md5 hex of the normalized text (same
    * function exists in DuckDB for the oracle). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), Ws)))

  /** Number of CJK (CJK Unified Ideographs block) characters. */
  def cjkCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", ""))

  /** Cheap language-family guess: >10% CJK chars → 'cjk', empty →
    * 'empty', else 'latin'. Deliberately simple so the identical
    * integer-threshold CASE is expressible in the DuckDB oracle. */
  def langGuess(text: Column): Column =
    when(length(text) === 0, lit("empty"))
      .when(cjkCount(text) * 10 > length(text), lit("cjk"))
      .otherwise(lit("latin"))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))

  /** English stopword hits (word-bounded). */
  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("\\b(the|a|an|and|of|to|in|is|it|for)\\b"), lit(0)))

  /** BPE-ish subword token count: letter runs, single digits, and
    * single non-alphanumeric glyphs — the GPT-2-style pre-tokenizer
    * shape (letters group, numbers split to digits, punctuation stands
    * alone), written in the regex subset that means the same thing in
    * Java and RE2. A much closer proxy for model-token budgets than
    * the whitespace count: "don't, 42!" is 2 whitespace tokens but 7
    * BPE-ish tokens. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"), lit(0)))

  private val RollB = 1000003L        // polynomial base (prime)
  private val RollM = 2147483647L     // modulus 2^31-1 (Mersenne prime)

  /** Polynomial (Rabin–Karp) rolling-hash fingerprint over normalized
    * whitespace tokens: h ← (h·B + tokHash) mod M, left to right, with
    * B = 1000003, M = 2³¹−1, tokHash = leading 8 md5 hex digits of the
    * token. ORDER-SENSITIVE, unlike [[fingerprint]] — swapped tokens
    * change the hash — which is what shingle/fingerprint pipelines
    * slide over. All-integer math: h < 2³¹, B < 2²⁰, tokHash < 2³² keep
    * every intermediate below 2⁵², exact in 64-bit on both engines, so
    * the DuckDB oracle replays it bit-for-bit. Pure Catalyst
    * (`aggregate` higher-order fn over `split`) — no UDF, stays
    * distributed and pruning-friendly. Empty/blank text hashes to 0. */
  def rollingFingerprint(text: Column): Column = {
    val toks = filter(split(lower(trim(text)), Ws), t => t =!= "")
    aggregate(toks, lit(0L), (h, t) =>
      pmod(h * lit(RollB) +
        conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(RollM)))
  }

  /** Deterministic 16-bit hash bucket of a key (0..65535): the leading
    * 4 hex digits of md5 of the key's string form. The same expression
    * exists verbatim in DuckDB ('0x'||substring(md5(..),1,4)), so
    * sample membership is oracle-exact — no RNG, no seed state, and a
    * re-run (or a different cluster size) selects the SAME rows. */
  def hashBucket16(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int")

  /** Deterministic per-stratum hash sampling — the training-data
    * mixing primitive ("rebalance the language mix to these rates").
    * Keeps a row iff hashBucket16(key) < floor(fraction(stratum) ·
    * 65536). A pure filter: no shuffle, no RNG, embarrassingly
    * parallel at any cluster size, and the kept set is a SUBSET
    * relation across fractions (raising a stratum's rate only ADDS
    * rows — stable incremental re-mixes). Integer threshold compare,
    * so the DuckDB oracle reproduces membership bit-for-bit. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           fractions: Map[String, Double],
                           defaultFraction: Double): DataFrame = {
    def cutoff(f: Double): Int = (f * 65536).toInt
    val cut = fractions.foldLeft(lit(cutoff(defaultFraction))) {
      case (acc, (k, f)) => when(stratum === k, lit(cutoff(f))).otherwise(acc)
    }
    df.where(hashBucket16(key) < cut)
  }

  /** Deterministic multi-epoch source mixing — the up/down-sampling
    * step that turns per-source mix WEIGHTS into a materialized
    * training view (public LM data recipes repeat high-quality sources
    * w > 1 times and thin low-quality ones w < 1): each row is emitted
    * ⌊w⌋ times plus one more iff its 16-bit hash bucket falls under
    * frac(w)·65536, one output row per (doc, epoch). Pure projection +
    * generator — no shuffle, no RNG, embarrassingly parallel — and
    * integer-exact, so an external engine replays copy counts
    * bit-for-bit. Subset-stable like [[stratifiedHashSample]]: raising
    * a weight only ADDS epochs, never reshuffles existing ones. */
  def epochMix(df: DataFrame, key: Column, stratum: Column,
               weights: Map[String, Double],
               defaultWeight: Double): DataFrame = {
    def whole(w: Double): Int = w.toInt
    def cutoff(w: Double): Int = ((w - w.toInt) * 65536).toInt
    val base = weights.foldLeft(lit(whole(defaultWeight))) {
      case (acc, (k, w)) => when(stratum === k, lit(whole(w))).otherwise(acc)
    }
    val cut = weights.foldLeft(lit(cutoff(defaultWeight))) {
      case (acc, (k, w)) => when(stratum === k, lit(cutoff(w))).otherwise(acc)
    }
    require(!df.columns.contains("epoch"),
      "epochMix: input already has an 'epoch' column")
    val nEp = "__epoch_mix_n" // collision-proof scratch name
    val n = base + when(hashBucket16(key) < cut, 1).otherwise(0)
    df.select(col("*"), n.as(nEp))
      .where(col(nEp) > 0)
      .select(col("*"),
        explode(sequence(lit(0), col(nEp) - 1)).as("epoch"))
      .drop(nEp)
  }

  /** Non-empty lowercase whitespace tokens as an array column (pure
    * projection — the building block the repetition / merge-pair ops
    * below compose). */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), Ws), t => t =!= "")

  /** Adjacent token pairs ("bigrams") of a token-array column — the
    * within-doc repetition unit (Gopher-style duplicate-2-gram
    * signals) and the BPE merge-candidate unit. Empty array for docs
    * with fewer than 2 tokens, identical to the oracle's CASE guard. */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Highest within-doc occurrence count over a grams array (0 when
    * empty) — the numerator of Gopher's "fraction of characters in the
    * most common n-gram" repetition filter. O(d²) in the per-doc gram
    * count but a pure projection: no shuffle, no UDF, embarrassingly
    * parallel at any corpus size. */
  def topGramFreq(grams: Column): Column =
    when(size(grams) === 0, lit(0))
      .otherwise(array_max(transform(array_distinct(grams),
        x => size(filter(grams, y => y === x)))))

  /** Per-document top TF-IDF term — the keyword-extraction /
    * domain-relevance primitive (the signal importance-filtering
    * pipelines rank documents by). `tf` is the within-doc term count,
    * `df` the number of documents containing the term, and the score
    * is the ALL-INTEGER `tf·10⁶ div df` (truncating integer division,
    * exact in 64-bit on both engines) so the DuckDB oracle replays the
    * ranking bit-for-bit — a float `ln(N/df)` idf would rank the same
    * way for a fixed corpus but could not be hash-compared safely.
    * Ties break on term ascending via the window's ORDER BY.
    *
    * Scale shape: the tf table is one row per (doc, term) from a
    * map-side partial-aggregated groupBy; df aggregates THAT table
    * (never the raw token stream); the tf⋈df equi-join is on the term
    * key and the final top-1 is a doc-partitioned window — no global
    * sort, nothing quadratic, and hot stopword terms cost one df row
    * each, not a skew blow-up. */
  def tfidfTopTerm(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("score", expr("tf * 1000000 div df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("doc_id", "term", "tf", "df", "score")
      .orderBy("doc_id")
  }

  /** Inverted-index shard build: `term → (df, capped posting list)` —
    * the corpus-side artifact a search / decontamination / n-gram
    * lookup service is bootstrapped from. Postings are
    * `docid:tf` pairs, ascending doc_id, serialized as one string
    * (arrays hash awkwardly across engines; the string IS the on-disk
    * shard format for a line-oriented index).
    *
    * Scale shape: one shuffle to `(term, doc_id)` with map-side
    * partial counts, then a window + final aggregate that BOTH reuse
    * that hash partitioning on `term` (no further exchange — pinned in
    * PlanSpec). Stopword-term skew is bounded by `maxPostings`: the
    * row_number cap discards a hot term's tail BEFORE collect_list, so
    * no task ever materializes an unbounded posting array, while `df`
    * still counts the full list. `minDf` drops the hapax-legomena long
    * tail (typically >half of all terms) from the output shard. */
  def invertedIndex(docs: DataFrame, minDf: Long = 2L,
                    maxPostings: Int = 32): DataFrame = {
    val tf = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("term").orderBy("doc_id")
    tf.withColumn("rn", row_number().over(w))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(
          transform(
            array_sort(collect_list(when(col("rn") <= maxPostings,
              struct(col("doc_id"), col("tf"))))),
            p => concat(p("doc_id"), lit(":"), p("tf"))),
          ",").as("postings"))
      .where(col("df") >= minDf)
      .orderBy("term")
  }

  /** BM25 top-k retrieval for a fixed query-term set — the serving-side
    * counterpart of [[invertedIndex]]: which crawled documents best
    * answer a query. Integer-scaled BM25 variant (k1 = 1.2, b = 0.75)
    * so the DuckDB oracle replays the ranking bit-for-bit; the idf LOG
    * is kept (r4 verdict: the earlier pure-rational form over-rewarded
    * rare terms and diverged from standard BM25 rankings on high-df
    * terms) in replayable integer form — the binary-magnitude trick
    * `length(bin(x))` = ⌊log₂ x⌋ + 1 already proven cross-engine by
    * q59's familiarity weights and q64's DSIR ratios:
    *
    *   ratio10  = ((2(N − df) + 1) · 1024) div (2·df + 1)
    *              (the BM25 idf rational (N−df+½)/(df+½), pre-scaled
    *               2¹⁰ so sub-1 ratios keep magnitude resolution)
    *   idfbits  = len(bin(ratio10)) — ⌊log₂ ratio10⌋+1, floored at 1:
    *              ultra-common terms contribute the minimum weight
    *              instead of flipping sign as the real log would
    *   norm1000 = 250 + (750 · dl · 1000) div adl1000
    *   denom    = tf·1000 + (12 · norm1000) div 10
    *   tscore   = idfbits · ((tf · 2 200 000) div denom)
    *   score(d) = Σ_terms tscore,  top k by (score desc, doc_id)
    *
    * Every intermediate stays far under 2⁶³ up to N ≈ 10⁹ docs
    * (ratio10 ≤ 2·10¹², idfbits ≤ 41, tf factor ≤ 2200).
    *
    * Scale shape: the explode is filtered to the |Q| query terms BEFORE
    * the (doc_id, dl, term) partial-agg shuffle, so only matching
    * postings ever move; df (|Q| rows) and the corpus stats (1 row) are
    * broadcast; the final per-doc sum shuffles only docs that matched
    * at least one term; top-k plans as TakeOrderedAndProject. Docs with
    * no query term never appear (score 0). */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String],
               k: Int = 10): DataFrame = {
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      tokens(col("text")).as("toks"))
    val stats = base.agg(count(lit(1)).as("n"),
      expr("(sum(size(toks)) * 1000L) div count(1)").as("adl1000"))
    val tf = base
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfAgg = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfAgg), "term")
      .crossJoin(broadcast(stats))
      .withColumn("tscore", expr(
        """CAST(length(bin(((2 * (n - df) + 1) * 1024L) div (2 * df + 1))) AS BIGINT)
          | * ((tf * 2200000L) div
          |     (tf * 1000L + (12 * (250 + (750 * dl * 1000L) div adl1000)) div 10))""".stripMargin))
      .groupBy("doc_id")
      .agg(sum(col("tscore")).as("score"), count(lit(1)).as("nterms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** EXACT nearest-rank percentiles of an integer-valued column per
    * group — corpus-QA numbers (p50/p90/p99 doc length per language)
    * computed the scale-right way: aggregate to (group, value) COUNTS
    * first, so the windows run over the bounded distinct-value
    * domain (≤ max doc length rows per group), never the corpus rows.
    * `approx_percentile` trades exactness for a non-replayable sketch;
    * for integer domains the exact form is cheap and the DuckDB
    * oracle replays it bit-for-bit.
    *
    * Nearest-rank definition: p-th percentile = min v with
    * cum(v) ≥ ⌈p·n/100⌉, encoded integer-exactly as
    * `100·cum ≥ p·n`. NULL values are EXCLUDED from both the
    * population n and the candidates (percentile of the present
    * values) — excluded explicitly because the engines disagree on
    * null sort order (Spark NULLS FIRST, DuckDB NULLS LAST), so any
    * implicit null handling would silently diverge from the oracle.
    * One (grp, v) partial-agg shuffle; the cumulative and total
    * windows SHARE the grp hash partitioning; the final
    * per-(grp, pct) min is a slim aggregate. */
  def integerPercentiles(df: DataFrame, group: Column, value: Column,
                         pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val counts = df
      .select(group.cast("string").as("grp"), value.cast("long").as("v"))
      .where(col("v").isNotNull)
      .groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy("grp").orderBy("v")))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("grp")))
    cum.select(col("grp"), col("v"), col("cum"), col("n"),
        explode(array(pcts.map(p => lit(p)): _*)).as("pct"))
      .where(col("cum") * 100L >= col("pct") * col("n"))
      .groupBy("grp", "pct").agg(min(col("v")).as("value"))
      .orderBy("grp", "pct")
  }

  /** Integer-threshold quality gate (all-integer arithmetic so the
    * oracle comparison is exact): a doc passes when it has at least 20
    * tokens, at least one stopword per 50 tokens, and punctuation
    * density below 20%. */
  def qualityOk(text: Column): Column = {
    val toks = tokenCount(text)
    (toks >= 20) &&
      (stopwordCount(text) * 50 >= toks) &&
      (punctCount(text) * 5 <= toks)
  }

  /** Gopher's "stop word" vocabulary (Rae et al. 2021 §A1.1: a doc must
    * contain at least 2 of these 8 common English words). */
  private val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** How many DISTINCT Gopher stop words a token array contains
    * (0..8). Spark `array_intersect` and DuckDB `list_intersect` both
    * return the deduplicated common set, so the count is
    * engine-identical. */
  def gopherStopwordKinds(toks: Column): Column =
    size(array_intersect(array_distinct(toks),
      array(GopherStops.map(lit): _*)))

  /** Tokens containing at least one ASCII letter (tokens are already
    * lowercased, so `[a-z]` covers the alphabet) — the numerator of
    * Gopher's ≥80%-alphabetic-words rule. */
  def alphaTokenCount(toks: Column): Column =
    size(filter(toks, t => t.rlike("[a-z]")))

  /** Gopher-style quality-rule verdicts (Rae et al. 2021 §A1.1), one
    * row per document with every rule's 0/1 verdict plus the overall
    * pass — the per-rule breakdown is what corpus-quality dashboards
    * aggregate, and keeping losers with their failure reasons (instead
    * of filtering them out) is how reject-sampling audits work.
    *
    * All thresholds are INTEGER cross-multiplications (a·k ≥ b·m, never
    * a float ratio), so the DuckDB oracle replays every verdict
    * bit-for-bit. A pure projection over the text column: no shuffle,
    * no join, no UDF — embarrassingly parallel at any corpus size
    * (PlanSpec pins the exchange-free plan). Rules, integer form:
    *  - ok_count:   20 ≤ n_tok ≤ 100000        (corpus-scaled bounds)
    *  - ok_wordlen: 3·n_tok ≤ Σ|tok| ≤ 10·n_tok (mean word length 3–10)
    *  - ok_symbol:  10·(#'#' + #'...') ≤ n_tok  (symbol-to-word ≤ 0.1)
    *  - ok_alpha:   5·n_alpha ≥ 4·n_tok         (≥80% alphabetic words)
    *  - ok_stop:    ≥2 distinct Gopher stop words
    */
  def qualityVerdicts(docs: DataFrame): DataFrame = {
    // the token array and every HOF-derived measure materialize as
    // ALIASED columns in their own projections before any verdict
    // references them (interpreted-HOF rule — see the q48 note in
    // SparkEntry / SCALE.md §8): the inlined form re-instantiated the
    // tokenize chain in every ok_* expression AND again inside `pass`,
    // ~20 interpreted copies per row on the q56 bench path.
    // CollapseProject preserves multi-referenced non-cheap aliases, so
    // this still plans as a chain of pure projections — zero shuffle.
    val staged = docs
      .select(col("doc_id"), col("text"), tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tok"),
        aggregate(col("w"), lit(0L), (a, t) => a + length(t))
          .as("sum_tok_chars"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "#", ""))).as("__hash_n"),
        ((length(col("text")) -
          length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
          .as("__ell_n"),
        alphaTokenCount(col("w")).cast("long").as("n_alpha"),
        gopherStopwordKinds(col("w")).cast("long").as("n_stop_kinds"))
    val nTok = col("n_tok"); val sumLen = col("sum_tok_chars")
    val okCount = (nTok >= 20 && nTok <= 100000).cast("int")
    val okWordlen = (sumLen >= nTok * 3 && sumLen <= nTok * 10).cast("int")
    val okSymbol = ((col("__hash_n") + col("__ell_n")) * 10 <= nTok).cast("int")
    val okAlpha = (col("n_alpha") * 5 >= nTok * 4).cast("int")
    val okStop = (col("n_stop_kinds") >= 2).cast("int")
    staged.select(
      col("doc_id"), nTok, sumLen, col("n_alpha"), col("n_stop_kinds"),
      okCount.as("ok_count"), okWordlen.as("ok_wordlen"),
      okSymbol.as("ok_symbol"), okAlpha.as("ok_alpha"), okStop.as("ok_stop"),
      (okCount * okWordlen * okSymbol * okAlpha * okStop).as("pass"))
      .orderBy("doc_id")
  }

  /** Pack documents into fixed-token-budget training sequences — the
    * step between a cleaned corpus and a token stream: documents are
    * concatenated in a deterministic order and cut into `binTokens`-
    * sized samples; each doc is labeled with the sequence bin its FIRST
    * token lands in (`seq_bin`) and its offset inside that bin
    * (`bin_off`). Long docs straddle bins, exactly like the standard
    * pack-then-split pretraining layout.
    *
    * Scale shape: the running offset is a windowed sum PARTITIONED BY
    * the shard column (`source`) — per-shard windows, never a global
    * single-partition sort; at 100 TB each dump/shard packs
    * independently and in parallel, which is also what keeps the
    * layout stable when shards are added. All-integer (`DIV`/`%`), so
    * the DuckDB oracle replays bin assignment bit-for-bit. */
  def packSequences(docs: DataFrame, binTokens: Int): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("start_off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tok"),
        expr(s"start_off DIV $binTokens").as("seq_bin"),
        (col("start_off") % binTokens).as("bin_off"))
      .orderBy("doc_id")
  }

  /** Reference-corpus n-gram familiarity score — the integer analog of
    * CCNet's reference-LM quality filter ("how much does this document
    * look like the trusted corpus?"): documents whose word bigrams are
    * frequent in a reference slice score high; gibberish and boilerplate
    * score low. Per non-reference doc:
    *  - n_gram2:  its bigram occurrence count,
    *  - n_hit:    occurrences whose bigram exists in the reference,
    *  - logscore: Σ occurrences · (⌊log₂ ref_count⌋ + 1) — the
    *    binary-magnitude weight (`length(bin(n))`, engine-identical in
    *    Spark and DuckDB) standing in for a float log-probability, so
    *    the oracle compares exactly.
    *
    * Scale shape: bigrams ride as 60-bit md5-prefix hashes (8 bytes,
    * never strings); the corpus side pre-aggregates per (doc, gram) so
    * join fan-out is bounded by distinct grams per doc; the reference
    * count table is a partial-aggregatable groupBy of the (small,
    * fixed) reference slice, so the planner broadcasts it and corpus
    * grams are a map-side hash probe — no corpus-side shuffle beyond
    * the per-doc aggregation. `isRef` is a predicate over doc_id. */
  def familiarityScores(docs: DataFrame, isRef: Column): DataFrame = {
    // tokens materialize into a column before the bigram lambda: an
    // interpreted HOF lambda re-referencing an un-aliased tokenize
    // expression re-evaluates it per element (see the q48 note in
    // SparkEntry)
    val grams = docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(bigrams(col("w"))).as("g"))
      .select(col("doc_id"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("gh"))
    val ref = grams.where(isRef)
      .groupBy("gh").agg(count(lit(1)).as("rn"))
    val corpus = grams.where(not(isRef))
      .groupBy("doc_id", "gh").agg(count(lit(1)).as("cnt"))
    val scored = corpus.join(ref, Seq("gh"), "left")
      .groupBy("doc_id").agg(
        sum(col("cnt")).as("n_gram2"),
        sum(when(col("rn").isNotNull, col("cnt")).otherwise(0L)).as("n_hit"),
        sum(col("cnt") * when(col("rn").isNotNull,
          length(bin(col("rn"))).cast("long")).otherwise(0L)).as("logscore"))
    docs.where(not(isRef)).select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_gram2"), lit(0L)).as("n_gram2"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(col("logscore"), lit(0L)).as("logscore"))
      .orderBy("doc_id")
  }

  /** DSIR-style importance scoring + selection (Xie et al. 2023,
    * arXiv:2302.03169, "Data Selection for Language Models via
    * Importance Resampling") in integer-exact form: score every RAW
    * document by how much its hashed-bigram distribution looks like
    * the TARGET slice rather than the raw corpus itself, then select
    * the top-`topK` by that log-ratio. Where DSIR uses float log
    * p̂(g)−log q̂(g) over hashed n-gram bucket frequencies, this uses
    * the binary-magnitude weight ⌊log₂(n+1)⌋+1 (`length(bin(n+1))`,
    * engine-identical in Spark and DuckDB — the q59 trick; the +1
    * cancels in the tn−qn difference) with add-one smoothing, so the
    * oracle compares bit-for-bit:
    *   logratio = Σ_g cnt_g · (len(bin(tn_b+1)) − len(bin(qn_b+1)))
    * over the doc's bigram occurrences, b = 60-bit md5 hash % nBuckets.
    *
    * Scale shape: grams ride as 8-byte hashed bucket ids; BOTH
    * frequency tables are bounded at `nBuckets` rows by construction,
    * hence explicitly broadcast — the raw side's only shuffles are the
    * two per-doc partial-aggregations. Selection is a TakeOrdered over
    * slim (doc_id, logratio) pairs (never a global single-partition
    * window) joined back as a flag, so the full scored table streams
    * through untouched. */
  def importanceScores(docs: DataFrame, isTarget: Column,
                       nBuckets: Int = 4096, topK: Int = 100): DataFrame = {
    val grams = docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(bigrams(col("w"))).as("g"))
      .select(col("doc_id"),
        (conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long")
          % nBuckets).as("b"))
    val tgtN = grams.where(isTarget).groupBy("b").agg(count(lit(1)).as("tn"))
    val raw = grams.where(not(isTarget))
    val rawN = raw.groupBy("b").agg(count(lit(1)).as("qn"))
    val perDoc = raw.groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
    val weighted = perDoc
      .join(broadcast(tgtN), Seq("b"), "left")
      .join(broadcast(rawN), Seq("b")) // inner: b came from raw itself
      .groupBy("doc_id").agg(
        sum(col("cnt")).as("n_gram2"),
        sum(col("cnt") *
          (length(bin(coalesce(col("tn"), lit(0L)) + 1)).cast("long")
            - length(bin(col("qn") + 1)).cast("long"))).as("logratio"))
    val scored = docs.where(not(isTarget)).select("doc_id")
      .join(weighted, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_gram2"), lit(0L)).as("n_gram2"),
        coalesce(col("logratio"), lit(0L)).as("logratio"))
    val topIds = scored
      .orderBy(col("logratio").desc, col("doc_id"))
      .limit(topK)
      .select(col("doc_id"), lit(1).as("sel"))
    scored.join(broadcast(topIds), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_gram2"), col("logratio"),
        coalesce(col("sel"), lit(0)).as("selected"))
      .orderBy("doc_id")
  }
}
