package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching for blocklist/contamination
  * filtering (the C4/Gopher "bad words" pass): ONE Aho-Corasick scan
  * (Aho & Corasick 1975) over each document counts every occurrence of
  * every pattern and the set of distinct patterns hit — O(|text| +
  * hits) per document regardless of pattern count, where the
  * per-pattern alternative (|patterns| `contains`/`replace` passes, or
  * an exploded pattern⋈doc join) pays |patterns| × |text|. At a
  * C4-sized blocklist (hundreds of phrases) over 100 TB that factor is
  * the difference between one scan and four hundred.
  *
  * The automaton is built once per distinct pattern-list and cached in
  * a ConcurrentHashMap (the [[Bpe]] memo discipline) keyed by the spec
  * string, so executors compile it on first use per JVM and every call
  * after is probe-only. Patterns arrive as ONE spec string joined with
  * '\\u0001' — a shape a literal expression can carry through codegen.
  *
  * Results pack into ONE long `total_hits * 1024 + distinct_patterns`
  * (valid while patterns <= 64 << 1024, enforced at build): a single
  * primitive return keeps the expression codegen-friendly; callers
  * unpack with div/pmod. Occurrence semantics are ALL match positions
  * (overlapping occurrences of DIFFERENT patterns each count; a single
  * pattern can self-overlap only if it has a border — q138's fixture
  * list is border-free, making the replace-count oracle formula exact).
  */
object MultiMatch {

  val Sep = '\u0001'
  val PackBase = 1024L
  val MaxPatterns = 64

  /** True iff some proper prefix of p is also a suffix — the condition
    * under which occurrences of p can overlap each other (and the
    * non-overlapping replace-count oracle would undercount). */
  def hasBorder(p: String): Boolean =
    (1 until p.length).exists(k => p.regionMatches(0, p, p.length - k, k))

  private final class Automaton(patterns: Array[String]) {
    require(patterns.nonEmpty && patterns.length <= MaxPatterns,
      s"MultiMatch supports 1..$MaxPatterns patterns, got ${patterns.length}")
    require(patterns.forall(_.nonEmpty), "empty pattern")

    // Trie with HashMap transitions (built once per JVM per list; the
    // scan is a probe per character, not a rebuild).
    private val children =
      scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
    private val endCount = scala.collection.mutable.ArrayBuffer(0)
    private val endMask = scala.collection.mutable.ArrayBuffer(0L)

    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { ch =>
        val nxt = children(node).get(ch)
        node = if (nxt != null) nxt.intValue()
        else {
          children += new java.util.HashMap[Character, Integer]()
          endCount += 0
          endMask += 0L
          children(node).put(ch, children.length - 1)
          children.length - 1
        }
      }
      endCount(node) += 1
      endMask(node) |= 1L << pi
    }

    private val fail = Array.fill(children.length)(0)
    // outCount/outMask aggregate the fail chain so the scan reads one
    // node, not a chain walk per position.
    private val outCount = endCount.toArray
    private val outMask = endMask.toArray

    locally { // BFS fail-link construction
      val queue = scala.collection.mutable.Queue[Int]()
      children(0).forEach { (_, c) => queue += c.intValue() }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        outCount(u) += outCount(fail(u))
        outMask(u) |= outMask(fail(u))
        children(u).forEach { (ch, c) =>
          var f = fail(u)
          while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
          val fc = children(f).get(ch)
          fail(c) = if (fc != null && fc.intValue() != c.intValue())
            fc.intValue() else 0
          queue += c.intValue()
        }
      }
    }

    def scan(text: String): Long = {
      var state = 0
      var total = 0L
      var mask = 0L
      var i = 0
      val n = text.length
      while (i < n) {
        val ch = text.charAt(i)
        var next = children(state).get(ch)
        while (next == null && state != 0) {
          state = fail(state)
          next = children(state).get(ch)
        }
        state = if (next == null) 0 else next.intValue()
        total += outCount(state)
        mask |= outMask(state)
        i += 1
      }
      total * PackBase + java.lang.Long.bitCount(mask)
    }
  }

  private val cache = new ConcurrentHashMap[String, Automaton]()

  /** Static entry point for generated Java: packed
    * `total_hits * 1024 + distinct_patterns` for `text` against the
    * '\\u0001'-joined pattern list `spec`. */
  def stats(text: UTF8String, spec: UTF8String): Long = {
    val s = spec.toString
    var ac = cache.get(s)
    if (ac == null) {
      ac = new Automaton(s.split(Sep))
      cache.putIfAbsent(s, ac)
    }
    ac.scan(text.toString)
  }

  /** `multi_match_pack(text, patterns): BIGINT` as a codegen'd native
    * expression; `patterns` must be a literal list (joined here). */
  def packCol(text: Column, patterns: Seq[String]): Column = {
    require(patterns.nonEmpty && patterns.length <= MaxPatterns &&
      patterns.forall(p => p.nonEmpty && p.indexOf(Sep) < 0),
      s"bad pattern list: $patterns")
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.MultiMatchPackLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          org.apache.spark.sql.functions.lit(patterns.mkString(Sep.toString)))))
  }
}
