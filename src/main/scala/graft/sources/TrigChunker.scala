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
      firstEndByRelDepth: Map[Int, Long], unsafe: Boolean)

  /** @param directivesA per INCOMING literal state: directive-shaped
    *                    lines seen while that automaton is outside
    *                    literals: (line idx, text, self-contained?)
    * @param firstDataA per incoming state: first non-directive content
    *                    line idx (-1 if none) — per-state so data hidden
    *                    behind an incoming long literal still counts once
    *                    the literal closes
    * @param firstContentDotLeading whether the partition's first content
    *                    line starts with a statement-final `.`
    */
  /** `headLines` are the partition's leading lines (through each
    * automaton's first confirmed boundary, size-capped) — the small
    * fragments the zero-shuffle assembly strategy ships between tasks;
    * `headCoversAll` = the whole partition fit under the cap.
    */
  private[sources] final case class PartSum(pid: Int, nLines: Long,
      sums: IndexedSeq[AutoSum],
      directivesA: IndexedSeq[Seq[(Long, String, Boolean)]],
      firstDataA: IndexedSeq[Long],
      firstContentDotLeading: Option[Boolean],
      headLines: Vector[String], headCoversAll: Boolean)

  private[graft] def scanLine(s: String, in: Int): LineFx = {
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
          case '\\' =>
            // a backslash OUTSIDE literals/IRIs is a PN_LOCAL escape
            // (e.g. `ex:obj\.`), which this scanner does not model — the
            // char after it must not be scored (a trailing `\.` is NOT a
            // statement end). Unsafe ⇒ the planner falls back to the
            // sequential wholetext parse, which rejects PN_LOCAL_ESC
            // loudly — same outcome in both modes, never a silent split.
            unsafe = true
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
    val firstMaps = Array.fill(3)(mutable.HashMap.empty[Int, Long])
    val pending = Array.fill[Option[(Int, Long)]](3)(None)
    val unsafe = Array(false, false, false)
    val directivesA = Array.fill(3)(
      mutable.ArrayBuffer.empty[(Long, String, Boolean)])
    val firstDataA = Array(-1L, -1L, -1L)
    var firstContentDot: Option[Boolean] = None
    // head collection for the zero-shuffle assembly strategy: keep leading
    // lines until every automaton has a confirmed first boundary (or the
    // cap trips — then only the shuffle strategy can use this partition)
    val headLines = Vector.newBuilder[String]
    var headCount = 0
    var headBytes = 0L
    var collecting = true
    var idx = 0L
    while (lines.hasNext) {
      val line = lines.next()
      // first non-whitespace char without allocating a trimmed copy
      var ci = 0
      val ln = line.length
      while (ci < ln && (line.charAt(ci) == ' ' || line.charAt(ci) == '\t' ||
        line.charAt(ci) == '\r')) ci += 1
      val isContent = ci < ln && line.charAt(ci) != '#'
      val contentDot = isContent && line.charAt(ci) == '.' &&
        (ci + 1 >= ln || !line.charAt(ci + 1).isDigit)
      if (isContent && firstContentDot.isEmpty)
        firstContentDot = Some(contentDot)
      if (isContent) {
        // directive / first-data detection per automaton (only while that
        // automaton is outside literals at line start); the trimmed text
        // is only built on the rare directive-shaped lines
        val dirShaped = line.charAt(ci) == '@' || line.charAt(ci) == 'P' ||
          line.charAt(ci) == 'p' || line.charAt(ci) == 'B' ||
          line.charAt(ci) == 'b'
        lazy val trimmed = line.substring(ci).trim
        var d = 0
        while (d < 3) {
          if (st(d) == OUT) {
            if (dirShaped && isDirectiveLine(trimmed))
              directivesA(d) += ((idx, trimmed, selfContained(trimmed)))
            else if (firstDataA(d) < 0) firstDataA(d) = idx
          }
          d += 1
        }
      }
      // resolve pendings: a content line that does not start with a
      // statement-final '.' confirms the previous candidate as a boundary
      var a = 0
      while (a < 3) {
        if (pending(a).isDefined && isContent) {
          val (rd, pidx) = pending(a).get
          if (!contentDot) {
            maps(a)(rd) = pidx
            if (!firstMaps(a).contains(rd)) firstMaps(a)(rd) = pidx
          }
          pending(a) = None
        }
        a += 1
      }
      if (collecting) {
        headLines += line
        headCount += 1
        headBytes += line.length + 1
        if (headCount >= 65536 || headBytes >= 8L * 1024 * 1024) collecting = false
      }
      // the three automata usually share a state (everything converges to
      // OUT once literals close) — scan once per DISTINCT current state
      val fx0 = scanLine(line, st(0))
      val fx1 = if (st(1) == st(0)) fx0 else scanLine(line, st(1))
      val fx2 =
        if (st(2) == st(0)) fx0
        else if (st(2) == st(1)) fx1
        else scanLine(line, st(2))
      val fxs = Array(fx0, fx1, fx2)
      a = 0
      while (a < 3) {
        val fx = fxs(a)
        if (fx.unsafe) unsafe(a) = true
        depth(a) += fx.depthDelta
        st(a) = fx.outState
        if (fx.endsStatement) pending(a) = Some((depth(a), idx))
        a += 1
      }
      if (collecting && firstMaps(0).nonEmpty && pending(0).isEmpty &&
          firstMaps(1).nonEmpty && pending(1).isEmpty &&
          firstMaps(2).nonEmpty && pending(2).isEmpty) collecting = false
      idx += 1
    }
    PartSum(pid, idx,
      Array.tabulate(3)(a =>
        AutoSum(st(a), depth(a), maps(a).toMap, pending(a),
          firstMaps(a).toMap, unsafe(a))).toIndexedSeq,
      directivesA.map(_.toSeq).toIndexedSeq,
      firstDataA.toIndexedSeq, firstContentDot,
      headLines.result(), collecting)
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
        p.directivesA(st).foreach { case (i, t, selfC) =>
          if (!selfC) bad = true // multi-line directive: not chunk-safe
          else dirs += ((encode(p.pid, i), t))
        }
        if (p.firstDataA(st) >= 0)
          firstData = math.min(firstData, encode(p.pid, p.firstDataA(st)))
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

  /** One task of the zero-shuffle assembly strategy: partition `pid`
    * parses `[preamble +] lines(bIdx+1 ..) + append` as chunk `chunkId`;
    * the first boundary partition additionally parses `preText` (the file
    * head = chunk 0). `append` carries the SMALL head fragments of the
    * following partitions up to and including the next boundary line —
    * the only text that moves between tasks.
    */
  private[sources] final case class TaskSpec(bIdx: Long, chunkId: Int,
      append: String, preText: String)

  private[sources] final case class AssemblyPlan(specs: Map[Int, TaskSpec],
      preamble: String)

  /** Zero-shuffle plan: boundary = each partition's FIRST confirmed
    * statement end, so a chunk is one partition's tail plus the next
    * partition's (few-line) head — the bulk text never shuffles. None when
    * any needed fragment is unavailable (head cap, unconfirmed boundary,
    * unsafe line, directives after data): callers then try the shuffle
    * strategy, then wholetext.
    */
  private[sources] def planAssembly(parts: Seq[PartSum]): Option[AssemblyPlan] = {
    val sorted = parts.sortBy(_.pid).toIndexedSeq
    var st = OUT
    var depth = 0
    var bad = false
    val dirs = mutable.ArrayBuffer.empty[(Long, String)]
    var firstData = Long.MaxValue
    // pid -> boundary idx (None = partition rides inside a neighbor chunk)
    val bounds = mutable.LinkedHashMap.empty[Int, Long]
    var k = 0
    while (k < sorted.length && !bad) {
      val p = sorted(k)
      val sum = p.sums(st)
      if (sum.unsafe) bad = true
      else {
        p.directivesA(st).foreach { case (i, txt, selfC) =>
          if (!selfC) bad = true
          else dirs += ((encode(p.pid, i), txt))
        }
        if (p.firstDataA(st) >= 0)
          firstData = math.min(firstData, encode(p.pid, p.firstDataA(st)))
        sum.firstEndByRelDepth.get(-depth) match {
          case Some(b) if b < p.headLines.length =>
            bounds(p.pid) = b // boundary line must sit inside the head slice
          case Some(_) => bad = true // head cap tripped before the boundary
          case None =>
            // no boundary: the whole partition must ride along as a head
            if (!p.headCoversAll) bad = true
        }
        st = sum.outState
        depth += sum.depthDelta
      }
      k += 1
    }
    if (bad || st != OUT || depth != 0 || dirs.exists(_._1 > firstData) ||
      bounds.isEmpty) return None
    val preamble = dirs.sortBy(_._1).map(_._2).mkString("\n")
    val byPid = sorted.map(p => p.pid -> p).toMap
    val bs = bounds.toIndexedSeq // (pid, bIdx) in pid order
    def headSlice(pid: Int, bIdx: Long): String =
      byPid(pid).headLines.take(bIdx.toInt + 1).mkString("\n")
    def fullHeads(fromExcl: Int, toExcl: Int): Seq[String] =
      (fromExcl + 1 until toExcl).map(pid => byPid(pid).headLines.mkString("\n"))
        .filter(_.nonEmpty)
    // chunk 0 = everything up to and including the first boundary line
    val (p0, b0) = bs.head
    val preText = (fullHeads(-1, p0) :+ headSlice(p0, b0)).mkString("\n")
    val specs = bs.indices.map { j =>
      val (p, b) = bs(j)
      val append =
        if (j + 1 < bs.length) {
          val (np, nb) = bs(j + 1)
          (fullHeads(p, np) :+ headSlice(np, nb)).mkString("\n")
        } else fullHeads(p, sorted.length).mkString("\n")
      p -> TaskSpec(b, j + 1, append, if (j == 0) preText else "")
    }.toMap
    Some(AssemblyPlan(specs, preamble))
  }

  private def runAssembly(spark: SparkSession, lines: RDD[String],
      ap: AssemblyPlan, defaultGraph: String): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ap)
    val quads = lines.mapPartitionsWithIndex { (pid, it) =>
      bc.value.specs.get(pid) match {
        case None => Iterator.empty // lines ride inside a neighbor's append
        case Some(spec) =>
          val preamble = bc.value.preamble
          val sb = new StringBuilder
          if (preamble.nonEmpty) sb.append(preamble).append('\n')
          var idx = 0L
          while (it.hasNext) {
            val l = it.next()
            if (idx > spec.bIdx) sb.append(l).append('\n')
            idx += 1
          }
          if (spec.append.nonEmpty) sb.append(spec.append).append('\n')
          val tail = TrigParser.parse(sb.toString, defaultGraph,
            genPrefix = "c" + spec.chunkId + "g")
          val head =
            if (spec.preText.nonEmpty)
              TrigParser.parse(spec.preText, defaultGraph, genPrefix = "c0g")
            else Iterator.empty
          head ++ tail
      }
    }
    spark.createDataset(quads).select("graph", "subj", "pred", "obj")
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
    val sums = collectSummaries(linesOf(spark, path, minPartitions))
    planAssembly(sums).map(ap => (ap.specs.size + 1, ap.preamble))
      .orElse(plan(sums).map(p => (p.boundaries.length + 1, p.preamble)))
  }

  /** Which execution strategy the planner picks for this file (tests). */
  private[graft] def strategyFor(spark: SparkSession, path: String,
      minPartitions: Int = 0): String = {
    if (nonSplittable(path)) return "wholetext-gz"
    val sums = collectSummaries(linesOf(spark, path, minPartitions))
    if (planAssembly(sums).isDefined) "assembly"
    else if (plan(sums).isDefined) "shuffle"
    else "wholetext"
  }

  /** gzip streams have no split points: `sc.textFile` would hand the whole
    * file to ONE task, so the chunk planner could only ever "plan" a
    * single chunk — pure overhead (an extra summary pass) for a
    * sequential parse. Route straight to the wholetext parser instead,
    * LOUDLY here rather than silently degrading: decompress-then-chunk
    * (or a splittable codec like bzip2/zstd-seekable) is the way to
    * parallelize a compressed giant document.
    */
  private def nonSplittable(path: String): Boolean = path.endsWith(".gz")

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
    if (nonSplittable(path)) return RdfIO.readTrig(spark, path, defaultGraph)
    val lines = linesOf(spark, path, minPartitions)
    val sums = collectSummaries(lines)
    planAssembly(sums) match {
      case Some(ap) => return runAssembly(spark, lines, ap, defaultGraph)
      case None => ()
    }
    runShuffleOrWholetext(spark, path, lines, sums, defaultGraph)
  }

  /** Fallback chain: one full-text shuffle by chunk id, else wholetext. */
  private def runShuffleOrWholetext(spark: SparkSession, path: String,
      lines: RDD[String], sums: Seq[PartSum],
      defaultGraph: String): DataFrame = {
    import spark.implicits._
    plan(sums) match {
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
