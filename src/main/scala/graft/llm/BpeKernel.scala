package graft.llm

import org.apache.spark.unsafe.types.UTF8String

/** Compiled form of a learned BPE merge list — built once (driver), a
  * single broadcast-sized reference object inside the codegen'd
  * [[graft.functions.BpeTokenize]] expression.
  *
  * Scale rationale (VERDICT r7 §"what's wrong"): [[Bpe.applyMerges]]
  * unrolls the merge list into O(#merges) nested `replace` expression
  * nodes — an executable, SQL-mirrorable SPEC that is perfect at the
  * oracle's 24 merges and a plan-size/codegen explosion at a
  * production 8k-32k vocabulary (thousands of expression nodes per
  * projection). This class + [[BpeKernel]] are the scale path: ONE
  * expression node holding the vocabulary as data, per-row cost
  * independent of the merge count. [[BpeKernel.tokenize]] is pinned
  * byte-identical to the replace chain (BpeSpec property cases + the
  * tx11 oracle, whose SQL side still replays the literal chain).
  *
  * The merge list must be WELL-FORMED: each side of merge i is either
  * a single code point or the result of an earlier merge j < i —
  * exactly what [[Bpe.learn]] produces (it can only ever pair symbols
  * that exist). The constructor enforces this, because the fast
  * tokenizer's correctness argument depends on it: a later merge can
  * then never create an adjacency an EARLIER merge would have matched
  * (new pairs always involve the just-created symbol), so processing
  * merges one-at-a-time in rank order with per-merge candidate lists
  * reproduces the chain's sequential application.
  */
final class BpeVocab(mergeList: Seq[Bpe.Merge]) extends Serializable {
  val merges: Array[Bpe.Merge] = mergeList.toArray

  {
    val produced = new java.util.HashSet[String]()
    merges.zipWithIndex.foreach { case (m, i) =>
      def ok(s: String): Boolean =
        (s.nonEmpty && s.codePointCount(0, s.length) == 1) || produced.contains(s)
      require(ok(m.l) && ok(m.r),
        s"merge $i (${m.l}|${m.r}) references a symbol no earlier merge " +
          "produces — not a learned (well-formed) merge list")
      require(!m.l.contains(Bpe.Sep) && !m.r.contains(Bpe.Sep),
        s"merge $i contains the delimiter '${Bpe.Sep}'")
      produced.add(m.merged)
    }
  }

  /** rank by pair, keyed "<l.length> <l><r>" (the length prefix
    * makes the concatenation unambiguous for arbitrary symbol text). */
  val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case (mg, i) =>
      // first occurrence wins: a duplicated pair's second rank can never
      // fire (the first already consumed every occurrence; any NEW
      // occurrence is only matchable by ranks after the merge creating
      // it, and learn() never re-emits a pair anyway)
      m.putIfAbsent(BpeVocab.key(mg.l, mg.r), i)
    }
    m
  }

  def size: Int = merges.length
}

object BpeVocab {
  private[llm] def key(l: String, r: String): String = {
    val sb = new java.lang.StringBuilder(l.length + r.length + 4)
    sb.append(l.length).append(' ').append(l).append(r)
    sb.toString
  }
}

/** Merge-count-independent BPE tokenizer: symbolize + apply every
  * merge, byte-identical to
  * `Bpe.applyMerges(Bpe.symbolize(text), merges)` but with per-row
  * cost O(len · log len) regardless of vocabulary size.
  *
  * Representation: every symbol is a CONTIGUOUS SPAN of the input
  * (merges only ever concatenate adjacent symbols), so the symbol
  * sequence is a doubly-linked list of span heads over the original
  * string — no per-symbol allocation. Candidate positions for each
  * merge rank are collected once (initial adjacent-pair scan) and
  * incrementally as merges create new adjacencies; ranks are processed
  * in increasing order off a heap, each with the chain's exact
  * two-pass semantics:
  *
  *  - pass 1 walks candidates left-to-right; after a merge, the very
  *    next symbol is BARRED from starting a match (String.replace
  *    resumes scanning after the consumed trailing delimiter, so the
  *    following symbol has lost the leading delimiter a match needs);
  *  - pass 2 replays the deferred (barred) candidates the same way.
  *
  * New adjacencies created while applying rank r register only for
  * ranks > r — in the sequential chain, earlier merges already ran and
  * never revisit (see [[BpeVocab]]'s well-formedness contract for why
  * they also never need to).
  */
object BpeKernel {

  def tokenize(text: UTF8String, vocab: BpeVocab): UTF8String =
    if (text == null) null
    else UTF8String.fromString(tokenizeString(text.toString, vocab))

  def tokenizeString(s: String, vocab: BpeVocab): String = {
    val len = s.length
    val sepCh = Bpe.Sep.charAt(0)
    if (len == 0) return Bpe.Sep // symbolize("") = "|", no pairs to merge
    // span heads over code points, EXCEPT \n: symbolize's `(.)` regex skips
    // \n in BOTH engines (Java and RE2 — the four Java-only terminators are
    // stripped upstream, Bpe.stripSep), so "a\nb" symbolizes to "|a|\nb|" —
    // a \n-run GLUES to the following code point as one base symbol, and a
    // trailing \n-run sits after the final delimiter, outside any symbol
    val head = new Array[Boolean](len)
    val endp = new Array[Int](len)
    val nxt = new Array[Int](len)
    val prv = new Array[Int](len)
    var tail = len // start of the trailing \n-run (== len when none)
    while (tail > 0 && s.charAt(tail - 1) == '\n') tail -= 1
    var p = 0
    var prev = -1
    while (p < tail) {
      val start = p
      while (s.charAt(p) == '\n') p += 1 // glue the run to the next code point
      val cc = Character.charCount(s.codePointAt(p))
      head(start) = true; endp(start) = p + cc
      prv(start) = prev
      if (prev >= 0) nxt(prev) = start
      prev = start; p += cc
    }
    if (prev >= 0) nxt(prev) = -1

    val ranks = vocab.ranks
    val merges = vocab.merges
    if (!ranks.isEmpty) {
      val occ = new java.util.HashMap[Integer, java.util.ArrayList[Integer]]()
      val heap = new java.util.PriorityQueue[Integer]()
      // register position `a` as a candidate for the pair (span a, span b),
      // if that pair has a rank beyond `afterRank`
      def register(a: Int, b: Int, afterRank: Int): Unit = {
        val sb = new java.lang.StringBuilder(endp(a) - a + endp(b) - b + 4)
        sb.append(endp(a) - a).append(' ')
          .append(s, a, endp(a)).append(s, b, endp(b))
        val r = ranks.get(sb.toString)
        if (r != null && r > afterRank) {
          var lst = occ.get(r)
          if (lst == null) { lst = new java.util.ArrayList[Integer](); occ.put(r, lst); heap.add(r) }
          lst.add(a)
        }
      }
      p = 0
      while (tail > 0 && p >= 0 && nxt(p) >= 0) { register(p, nxt(p), -1); p = nxt(p) }

      def valid(c: Int, l: String, r: String): Boolean =
        head(c) && endp(c) - c == l.length && s.regionMatches(c, l, 0, l.length) && {
          val q = nxt(c)
          q >= 0 && endp(q) - q == r.length && s.regionMatches(q, r, 0, r.length)
        }

      while (!heap.isEmpty) {
        val rank: Int = heap.poll()
        val m = merges(rank)
        val cand = occ.remove(rank)
        val arr = new Array[Int](cand.size())
        var i = 0
        while (i < arr.length) { arr(i) = cand.get(i); i += 1 }
        java.util.Arrays.sort(arr)
        // merge span c with its successor; returns the new successor (the
        // symbol barred from starting a match for the rest of this pass)
        def applyAt(c: Int): Int = {
          val q = nxt(c)
          endp(c) = endp(q)
          head(q) = false
          val y = nxt(q)
          nxt(c) = y
          if (y >= 0) {
            prv(y) = c
            register(c, y, rank)
          }
          val x = prv(c)
          if (x >= 0) register(x, c, rank)
          y
        }
        val deferred = new java.util.ArrayList[Integer]()
        var bar = -1
        i = 0
        while (i < arr.length) { // pass 1
          val c = arr(i)
          if (valid(c, m.l, m.r)) {
            if (c == bar) deferred.add(c)
            else bar = applyAt(c)
          }
          i += 1
        }
        bar = -1
        i = 0
        while (i < deferred.size()) { // pass 2
          val c: Int = deferred.get(i)
          // a candidate barred AGAIN stays unmerged — the chain's second
          // replace pass leaves it exactly the same way
          if (c != bar && valid(c, m.l, m.r)) bar = applyAt(c)
          i += 1
        }
      }
    }

    val out = new java.lang.StringBuilder(2 * len + 1)
    out.append(sepCh)
    if (tail > 0) {
      p = 0
      while (p >= 0) {
        out.append(s, p, endp(p)).append(sepCh)
        p = nxt(p)
      }
    }
    if (tail < len) out.append(s, tail, len) // trailing \n-run, undelimited
    out.toString
  }
}
