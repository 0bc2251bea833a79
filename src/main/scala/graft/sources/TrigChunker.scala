package graft.sources

import scala.collection.mutable
import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Document-parallel TriG: parse ONE giant TriG/Turtle document with
  * line-split parallelism instead of [[RdfIO.readTrig]]'s one-task-per-file
  * `wholetext` scan (the reference streams a single document on one thread
  * — NgsCmdImpls.java:289-305; at 100 TB a single multi-GB dump must not
  * serialize onto one core).
  *
  * Two distributed passes over the line-split file:
  *
  *  1. '''Plan''' — each partition runs three copies of a tiny cross-line
  *     automaton (one per possible incoming literal state: outside, inside
  *     `'''…'''`, inside `"""…"""`; long strings are the only tokens that
  *     can span lines in the grammar) and emits a composable summary:
  *     outgoing state, brace/bracket depth delta, and the last line that
  *     ends a top-level statement (`.` or `}` outside literals/comments)
  *     per relative depth. The driver folds the P summaries (P = number of
  *     splits, tiny) into absolute states, picks one safe boundary line
  *     per partition, and collects the directive preamble
  *     (`@prefix`/`@base`/`PREFIX`/`BASE` lines, which must precede all
  *     data for chunking to be sound).
  *  2. '''Parse''' — lines are shuffled once by chunk id (chunk k = lines
  *     after boundary k-1 up to boundary k), reassembled in order with the
  *     directive preamble prepended, and each chunk parses independently
  *     through [[TrigParser]] with a per-chunk fresh-bnode prefix
  *     (`_:c<k>g<n>`) so anonymous-bnode labels never collide across
  *     chunks. Labeled bnodes (`_:b1`) keep their verbatim document-scoped
  *     labels, so a label shared across chunks still denotes one node.
  *
  * Falls back to the sequential wholetext parse (identical semantics, one
  * task) whenever the plan cannot be proven safe: directives after the
  * first data statement, an unterminated token at a line end (escape/IRI/
  * short string spanning EOL — malformed anyway), or a document that ends
  * inside a literal or block (the wholetext parser then produces the loud
  * error). Caveat: chunked mode reassembles lines with `\n`, so a long
  * literal containing a raw CR loses it — use [[RdfIO.readTrig]] for
  * byte-exact CRLF long literals.
  */
object TrigChunker {

  private final val OUT = 0 // literal states: 1 = inside ''' , 2 = inside """

  /** Effect of one line on the cross-line automaton given the literal
    * state at line start.
    */
  private[sources] final case class LineFx(outState: Int, depthDelta: Int,
      endsStatement: Boolean, unsafe: Boolean)

  /** One automaton's partition summary (for one assumed incoming state):
    * outgoing literal state, depth delta, committed boundary candidates
    * (relative depth after the line -> last such line index), a pending
    * candidate on the partition's last statement-ending line (committed
    * only if the next content line does not start with a statement-final
    * `.`, which would belong to the previous statement), and whether any
    * line was unsafe to reason about.
    */
  private[sources] final case class AutoSum(outState: Int, depthDelta: Int,
      lastEndByRelDepth: Map[Int, Long], pending: Option[(Int, Long)],
      unsafe: Boolean)

  /** @param directives directive-shaped lines seen under the incoming-OUT
    *                    automaton: (line idx, text, self-contained?)
    * @param firstData  first non-directive content line idx (-1 if none)
    * @param firstContentDotLeading whether the partition's first content
    *                    line starts with a statement-final `.`
    */
  private[sources] final case class PartSum(pid: Int, nLines: Long,
      sums: IndexedSeq[AutoSum], directives: Seq[(Long, String, Boolean)],
      firstData: Long, firstContentDotLeading: Option[Boolean])

  private[sources] def scanLine(s: String, in: Int): LineFx = {
    var state = in
    var depth = 0
    var last = ' '
    var unsafe = false
    var i = 0
    val n = s.length
    while (i < n && !unsafe) {
      if (state != OUT) {
        val q = if (state == 1) '\'' else '"'
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= n) unsafe = true // escape would span EOL
          i += 2
        } else if (c == q && i + 2 < n && s.charAt(i + 1) == q &&
            s.charAt(i + 2) == q) {
          state = OUT; last = 'L'; i += 3
        } else i += 1
      } else {
        val c = s.charAt(i)
        c match {
          case '#' => i = n // comment to EOL
          case '<' => // IRIs cannot contain '>' (no escapes for it)
            val j = s.indexOf('>', i + 1)
            if (j < 0) unsafe = true else { last = '>'; i = j + 1 }
          case '"' | '\'' =>
            if (i + 2 < n && s.charAt(i + 1) == c && s.charAt(i + 2) == c) {
              state = if (c == '\'') 1 else 2
              i += 3
            } else { // short string: must close on this line
              var j = i + 1
              var esc = false
              var closed = false
              while (j < n && !closed) {
                val ch = s.charAt(j)
                if (esc) esc = false
                else if (ch == '\\') esc = true
                else if (ch == c) closed = true
                j += 1
              }
              if (!closed) unsafe = true else { last = 'L'; i = j }
            }
          case '{' | '(' | '[' => depth += 1; last = c; i += 1
          case '}' | ')' | ']' => depth -= 1; last = c; i += 1
          case ' ' | '\t' | '\r' => i += 1
          case _ => last = c; i += 1
        }
      }
    }
    LineFx(state, depth,
      !unsafe && state == OUT && (last == '.' || last == '}'), unsafe)
  }

  private def isDirectiveLine(t: String): Boolean = {
    def kw(k: String): Boolean =
      t.regionMatches(true, 0, k, 0, k.length) &&
        (t.length == k.length || t.charAt(k.length).isWhitespace)
    t.startsWith("@prefix") || t.startsWith("@base") ||
      kw("PREFIX") || kw("BASE")
  }

  /** A directive confined to its line: `@`-form ends with its `.`,
    * SPARQL form ends with the IRI's `>`.
    */
  private def selfContained(t: String): Boolean =
    t.endsWith(".") || t.endsWith(">")

  private def dotLeading(t: String): Boolean =
    t.charAt(0) == '.' && (t.length == 1 || !t.charAt(1).isDigit)

  /** One pass over a partition's lines driving all three automata (each
    * line is scanned once per DISTINCT current state — after every literal
    * closes the automata converge to OUT, so in practice one scan/line).
    */
  private[sources] def summarize(pid: Int, lines: Iterator[String]): PartSum = {
    val st = Array(0, 1, 2)
    val depth = Array(0, 0, 0)
    val maps = Array.fill(3)(mutable.HashMap.empty[Int, Long])
    val pending = Array.fill[Option[(Int, Long)]](3)(None)
    val unsafe = Array(false, false, false)
    val directives = mutable.ArrayBuffer.empty[(Long, String, Boolean)]
    var firstData = -1L
    var firstContentDot: Option[Boolean] = None
    var idx = 0L
    while (lines.hasNext) {
      val line = lines.next()
      val t = line.trim
      val isContent = t.nonEmpty && t.charAt(0) != '#'
      if (isContent && firstContentDot.isEmpty)
        firstContentDot = Some(dotLeading(t))
      if (st(0) == OUT && isContent) {
        if (isDirectiveLine(t)) directives += ((idx, t, selfContained(t)))
        else if (firstData < 0) firstData = idx
      }
      // resolve pendings: a content line that does not start with a
      // statement-final '.' confirms the previous candidate as a boundary
      var a = 0
      while (a < 3) {
        pending(a) match {
          case Some((rd, pidx)) if isContent =>
            if (!dotLeading(t)) maps(a)(rd) = pidx
            pending(a) = None
          case _ => ()
        }
        a += 1
      }
      val cache = mutable.HashMap.empty[Int, LineFx]
      a = 0
      while (a < 3) {
        val fx = cache.getOrElseUpdate(st(a), scanLine(line, st(a)))
        if (fx.unsafe) unsafe(a) = true
        depth(a) += fx.depthDelta
        st(a) = fx.outState
        if (fx.endsStatement) pending(a) = Some((depth(a), idx))
        a += 1
      }
      idx += 1
    }
    PartSum(pid, idx,
      Array.tabulate(3)(a =>
        AutoSum(st(a), depth(a), maps(a).toMap, pending(a), unsafe(a))).toIndexedSeq,
      directives.toSeq, firstData, firstContentDot)
  }

  // global line position: (partition id, line index) packed into a long
  private def encode(pid: Int, idx: Long): Long = (pid.toLong << 40) | idx

  private[sources] final case class ChunkPlan(boundaries: Array[Long],
      preamble: String)

  /** Fold the per-partition summaries into a chunk plan, or None when the
    * document cannot be proven chunk-safe (caller falls back to the
    * sequential wholetext parse).
    */
  private[sources] def plan(parts: Seq[PartSum]): Option[ChunkPlan] = {
    val sorted = parts.sortBy(_.pid).toIndexedSeq
    var st = OUT
    var depth = 0
    var carried: Option[Long] = None
    var bad = false
    val bounds = mutable.ArrayBuffer.empty[Long]
    val dirs = mutable.ArrayBuffer.empty[(Long, String)]
    var firstData = Long.MaxValue
    var k = 0
    while (k < sorted.length && !bad) {
      val p = sorted(k)
      val sum = p.sums(st)
      if (sum.unsafe) bad = true
      else {
        // a carried boundary candidate resolves at this partition's first
        // content line (pending implies the previous partition ended OUT,
        // so the lexical dot-leading check is exact)
        if (carried.isDefined && p.firstContentDotLeading.isDefined) {
          if (!p.firstContentDotLeading.get) bounds += carried.get
          carried = None
        }
        if (st == OUT) { // directives are only meaningful outside literals
          p.directives.foreach { case (i, t, selfC) =>
            if (!selfC) bad = true // multi-line directive: not chunk-safe
            else dirs += ((encode(p.pid, i), t))
          }
          if (p.firstData >= 0)
            firstData = math.min(firstData, encode(p.pid, p.firstData))
        }
        sum.lastEndByRelDepth.get(-depth).foreach(i => bounds += encode(p.pid, i))
        if (p.firstContentDotLeading.isDefined)
          carried = sum.pending.collect { case (rd, i) if rd == -depth =>
            encode(p.pid, i)
          }
        st = sum.outState
        depth += sum.depthDelta
      }
      k += 1
    }
    // document must end outside literals and blocks (else let the
    // wholetext parser produce its loud error); all directives must
    // precede all data (file-scoped preamble); a trailing pending at EOF
    // would only open an empty chunk, so it is dropped
    if (bad || st != OUT || depth != 0 || dirs.exists(_._1 > firstData)) None
    else Some(ChunkPlan(bounds.toArray.sorted,
      dirs.sortBy(_._1).map(_._2).mkString("\n")))
  }

  private final class ChunkPartitioner(n: Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = key.asInstanceOf[(Int, Long)]._1
  }

  /** Plan-only entry (exposed for tests and for callers that want to know
    * whether the parallel path engages): number of chunks and preamble.
    */
  private[graft] def planFor(spark: SparkSession, path: String,
      minPartitions: Int = 0): Option[(Int, String)] = {
    val lines = linesOf(spark, path, minPartitions)
    plan(collectSummaries(lines)).map(p => (p.boundaries.length + 1, p.preamble))
  }

  private def linesOf(spark: SparkSession, path: String,
      minPartitions: Int): RDD[String] = {
    val sc = spark.sparkContext
    sc.textFile(path,
      if (minPartitions > 0) minPartitions else sc.defaultParallelism)
  }

  private def collectSummaries(lines: RDD[String]): Seq[PartSum] =
    lines.mapPartitionsWithIndex((pid, it) =>
      Iterator.single(summarize(pid, it))).collect().toSeq

  /** Parse one TriG/Turtle document with line-split parallelism, falling
    * back to [[RdfIO.readTrig]] when no safe chunking exists. The same
    * deterministic RDD lineage serves both passes, so the split boundaries
    * of pass 1 and pass 2 agree by construction.
    */
  def readTrigChunked(spark: SparkSession, path: String,
      defaultGraph: String = "<urn:x-arq:DefaultGraph>",
      minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val lines = linesOf(spark, path, minPartitions)
    plan(collectSummaries(lines)) match {
      case None => RdfIO.readTrig(spark, path, defaultGraph)
      case Some(cp) =>
        val bounds = cp.boundaries
        val preamble = cp.preamble
        val nChunks = bounds.length + 1
        val keyed = lines.mapPartitionsWithIndex { (pid, it) =>
          var idx = 0L
          it.map { l =>
            val pos = encode(pid, idx)
            idx += 1
            // chunk id = number of boundaries strictly before pos, with a
            // boundary line belonging to the chunk it terminates
            val b = java.util.Arrays.binarySearch(bounds, pos)
            val chunk = if (b >= 0) b else -b - 1
            ((chunk, pos), l)
          }
        }
        val quads = keyed
          .repartitionAndSortWithinPartitions(new ChunkPartitioner(nChunks))
          .mapPartitions { it =>
            if (!it.hasNext) Iterator.empty
            else {
              val ((chunkId, _), first) = it.next()
              val doc = new StringBuilder
              if (chunkId > 0 && preamble.nonEmpty)
                doc.append(preamble).append('\n')
              doc.append(first).append('\n')
              it.foreach { case (_, l) => doc.append(l).append('\n') }
              TrigParser.parse(doc.toString, defaultGraph,
                genPrefix = "c" + chunkId + "g")
            }
          }
        spark.createDataset(quads).select("graph", "subj", "pred", "obj")
    }
  }
}
