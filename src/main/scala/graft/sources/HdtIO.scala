package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HDT (Header-Dictionary-Triples) binary RDF — reader and writer built
  * from the PUBLIC format description (the W3C Member Submission "Binary
  * RDF Representation for Publication and Exchange (HDT)" and the layout
  * the rdfhdt implementations document): `$HDT` control sections with
  * CRC-protected headers, VByte integers, the Four-Section dictionary in
  * Plain Front Coding, and BitmapTriples in SPO order over Log64-packed
  * sequences. The reference consumes `.hdt` as a triple language via a
  * Jena plugin (NgsCmdImpls.java:73 `JenaPluginHdt.LANG_HDT`); no
  * reference code was consulted for this implementation.
  *
  * Conformance stance (honest sandbox limits): the container has no HDT
  * library and no third-party `.hdt` file, so byte-level interop cannot
  * be exercised here. What IS verified: full write→read round-trips over
  * adversarial term sets (HdtSpec), the structural invariants of the
  * format (section order, CRC checks — corruption fails loudly), and the
  * Four-Section id algebra (shared subject-object ids, per-section byte
  * sort). CRC polynomials follow the published implementations: CRC-8
  * poly 0x07, CRC-16/ARC (0x8005 reflected), CRC-32C (Castagnoli).
  *
  * Scale shape:
  *  - READ is distributed where it counts: the packed PFC dictionary and
  *    the triple id arrays are compact (that is HDT's point) and ride one
  *    broadcast; subject ranges fan out one task each, and every task
  *    decodes its ids straight out of the broadcast blocks — ZERO
  *    shuffles, no driver-side triple materialization.
  *  - WRITE is a single sequential file by format definition (like every
  *    HDT producer). It exists for interop + fixtures and is bounded by a
  *    loud cap — the engine's scale sinks remain the distributed
  *    N-Quads/TriG/parquet writers.
  */
object HdtIO {

  /** Writer refuses above this many triples — the single-file HDT encode
    * is inherently driver-side; at scale, write parquet/N-Quads instead.
    */
  val MaxWriteTriples = 5000000L

  // ------------------------------------------------------------ low level

  /** CRC-8, polynomial 0x07, init 0. */
  private[sources] final class Crc8 {
    private var crc = 0
    def update(b: Int): Unit = {
      var c = (crc ^ (b & 0xff)) & 0xff
      var i = 0
      while (i < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; i += 1 }
      crc = c
    }
    def update(bs: Array[Byte], from: Int, until: Int): Unit = {
      var i = from; while (i < until) { update(bs(i)); i += 1 }
    }
    def value: Int = crc & 0xff
  }

  /** CRC-16/ARC: poly 0x8005 reflected (0xA001), init 0. */
  private[sources] final class Crc16 {
    private var crc = 0
    def update(b: Int): Unit = {
      var c = crc ^ (b & 0xff)
      var i = 0
      while (i < 8) { c = if ((c & 1) != 0) (c >>> 1) ^ 0xA001 else c >>> 1; i += 1 }
      crc = c & 0xffff
    }
    def update(bs: Array[Byte], from: Int, until: Int): Unit = {
      var i = from; while (i < until) { update(bs(i)); i += 1 }
    }
    def value: Int = crc & 0xffff
  }

  /** CRC-32C (Castagnoli), reflected poly 0x82F63B78, init/xorout -1. */
  private[sources] final class Crc32c {
    private var crc = 0xffffffff
    def update(b: Int): Unit = {
      var c = (crc ^ (b & 0xff)) & 0xff
      var i = 0
      while (i < 8) { c = if ((c & 1) != 0) (c >>> 1) ^ 0x82F63B78 else c >>> 1; i += 1 }
      crc = (crc >>> 8) ^ c
    }
    def update(bs: Array[Byte], from: Int, until: Int): Unit = {
      var i = from; while (i < until) { update(bs(i)); i += 1 }
    }
    def value: Int = ~crc
  }

  /** HDT VByte: 7 data bits per byte, least-significant group first, the
    * FINAL byte carries the high bit.
    */
  private[sources] def writeVByte(out: ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0, s"vbyte: negative $v0")
    var v = v0
    while (v > 127) { out.write((v & 127).toInt); v >>= 7 }
    out.write((v | 0x80).toInt)
  }

  private[sources] final class In(val bytes: Array[Byte], var pos: Int) {
    def u8(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def vbyte(): Long = {
      var v = 0L; var shift = 0
      var b = u8()
      while ((b & 0x80) == 0) {
        v |= b.toLong << shift; shift += 7; b = u8()
      }
      v |= (b & 0x7f).toLong << shift
      v
    }
    /** Null-terminated UTF-8 string. */
    def zString(): String = {
      val start = pos
      while (bytes(pos) != 0) pos += 1
      val s = new String(bytes, start, pos - start, UTF_8)
      pos += 1
      s
    }
  }

  private def crc8Of(bs: Array[Byte], from: Int, until: Int): Int = {
    val c = new Crc8; c.update(bs, from, until); c.value
  }
  private def crc32Of(bs: Array[Byte], from: Int, until: Int): Int = {
    val c = new Crc32c; c.update(bs, from, until); c.value
  }

  /** Output buffer exposing its backing array (valid up to `size`) so
    * section CRCs read it in place — `toByteArray` would clone the whole
    * accumulated file once per CRC, O(sections × fileSize) in copies.
    */
  private final class Buf(cap: Int) extends ByteArrayOutputStream(cap) {
    def bytes: Array[Byte] = buf
  }

  // -------------------------------------------------- control information

  private val Cookie = "$HDT".getBytes(UTF_8)
  private[sources] val TypeGlobal = 1
  private[sources] val TypeHeader = 2
  private[sources] val TypeDictionary = 3
  private[sources] val TypeTriples = 4

  private val FormatGlobal = "<http://purl.org/HDT/hdt#HDTv1>"
  private val FormatDictFour = "<http://purl.org/HDT/hdt#dictionaryFour>"
  private val FormatBitmapTriples = "<http://purl.org/HDT/hdt#triplesBitmap>"

  private def writeControl(out: Buf, tpe: Int,
      format: String, props: String): Unit = {
    val start = out.size
    out.write(Cookie, 0, 4)
    out.write(tpe)
    val f = format.getBytes(UTF_8); out.write(f, 0, f.length); out.write(0)
    val p = props.getBytes(UTF_8); out.write(p, 0, p.length); out.write(0)
    val c = new Crc16; c.update(out.bytes, start, out.size)
    out.write(c.value & 0xff); out.write((c.value >> 8) & 0xff)
  }

  private[sources] final case class Control(tpe: Int, format: String,
      props: Map[String, String])

  private def readControl(in: In): Control = {
    val start = in.pos
    require(in.bytes.length - in.pos >= 4 &&
      Cookie.indices.forall(i => in.bytes(in.pos + i) == Cookie(i)),
      s"hdt: missing $$HDT cookie at byte ${in.pos}")
    in.pos += 4
    val tpe = in.u8()
    val format = in.zString()
    val propsStr = in.zString()
    val c = new Crc16; c.update(in.bytes, start, in.pos)
    val stored = in.u8() | (in.u8() << 8)
    require(stored == c.value,
      f"hdt: control CRC16 mismatch at byte $start (stored $stored%04x, computed ${c.value}%04x)")
    val props = propsStr.split(';').iterator.filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }
      .toMap
    Control(tpe, format, props)
  }

  // ------------------------------------------------------- bit sequences

  /** Serialize packed words as little-endian bytes, BYTE-ALIGNED at the
    * end like the published rdfhdt layout: only ceil(nBits/8) bytes are
    * written — the trailing word is truncated, not zero-padded to 8
    * bytes (ADVICE r9: full-word trailers would misalign against real
    * .hdt files in both directions). One bulk `write`, not a per-byte
    * loop.
    */
  private def writePackedWords(out: Buf, words: Array[Long], nBits: Long): Unit = {
    val nBytes = ((nBits + 7) / 8).toInt
    val bs = new Array[Byte](nBytes)
    var j = 0
    while (j < nBytes) {
      bs(j) = ((words(j >> 3) >>> (8 * (j & 7))) & 0xff).toByte
      j += 1
    }
    out.write(bs, 0, nBytes)
  }

  /** Read ceil(nBits/8) little-endian bytes back into packed words. */
  private def readPackedWords(in: In, nBits: Long): Array[Long] = {
    val nBytes = ((nBits + 7) / 8).toInt
    val words = new Array[Long]((nBytes + 7) / 8)
    var j = 0
    while (j < nBytes) {
      words(j >> 3) |= (in.bytes(in.pos + j) & 0xffL) << (8 * (j & 7))
      j += 1
    }
    in.pos += nBytes
    words
  }

  /** Write a SequenceLog64: type 1, numbits, VByte count, CRC8 header,
    * LSB-first packed bits as little-endian bytes (final word
    * byte-aligned), CRC32 data.
    */
  private def writeSeqLog64(out: Buf, vals: Array[Long]): Unit = {
    val max = if (vals.isEmpty) 0L else vals.max
    val bits = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(max))
    val start = out.size
    out.write(1)
    out.write(bits)
    writeVByte(out, vals.length.toLong)
    out.write(crc8Of(out.bytes, start, out.size))
    val nWords = ((vals.length.toLong * bits + 63) / 64).toInt
    val words = new Array[Long](nWords)
    var i = 0
    while (i < vals.length) {
      val bitPos = i.toLong * bits
      val w = (bitPos / 64).toInt; val off = (bitPos % 64).toInt
      words(w) |= vals(i) << off
      if (off + bits > 64) words(w + 1) |= vals(i) >>> (64 - off)
      i += 1
    }
    val dataStart = out.size
    writePackedWords(out, words, vals.length.toLong * bits)
    val crc = crc32Of(out.bytes, dataStart, out.size)
    var j = 0; while (j < 4) { out.write((crc >>> (8 * j)) & 0xff); j += 1 }
  }

  private[sources] final case class SeqLog64(bits: Int, n: Long, words: Array[Long]) {
    def apply(i: Long): Long = {
      val bitPos = i * bits
      val w = (bitPos / 64).toInt; val off = (bitPos % 64).toInt
      val lo = words(w) >>> off
      val v = if (off + bits > 64) lo | (words(w + 1) << (64 - off)) else lo
      if (bits == 64) v else v & ((1L << bits) - 1)
    }
  }

  private def readSeqLog64(in: In): SeqLog64 = {
    val start = in.pos
    val tpe = in.u8()
    require(tpe == 1, s"hdt: sequence type $tpe unsupported (expect 1=Log64)")
    val bits = in.u8()
    val n = in.vbyte()
    val stored8 = { val c = new Crc8; c.update(in.bytes, start, in.pos); val s = in.u8(); (c.value, s) }
    require(stored8._1 == stored8._2, "hdt: sequence header CRC8 mismatch")
    val dataStart = in.pos
    val words = readPackedWords(in, n * bits) // byte-aligned trailer
    val crc = crc32Of(in.bytes, dataStart, in.pos)
    var stored = 0L
    var j = 0; while (j < 4) { stored |= in.u8().toLong << (8 * j); j += 1 }
    require(stored == (crc & 0xffffffffL),
      "hdt: sequence data CRC32 mismatch (corrupt file — or a pre-r10 " +
        "graft .hdt, whose full-word trailers predate the byte-aligned " +
        "layout: re-encode it)")
    SeqLog64(bits, n, words)
  }

  /** Bitmap: type 1, VByte numbits, CRC8 header, LE bytes (byte-aligned
    * trailer like the published layout), CRC32.
    */
  private def writeBitmap(out: Buf, bits: Array[Boolean]): Unit = {
    val start = out.size
    out.write(1)
    writeVByte(out, bits.length.toLong)
    out.write(crc8Of(out.bytes, start, out.size))
    val nWords = (bits.length + 63) / 64
    val words = new Array[Long](nWords)
    var i = 0
    while (i < bits.length) { if (bits(i)) words(i / 64) |= 1L << (i % 64); i += 1 }
    val dataStart = out.size
    writePackedWords(out, words, bits.length.toLong)
    val crc = crc32Of(out.bytes, dataStart, out.size)
    var j = 0; while (j < 4) { out.write((crc >>> (8 * j)) & 0xff); j += 1 }
  }

  private[sources] final case class Bitmap(n: Long, words: Array[Long]) {
    def apply(i: Long): Boolean =
      (words((i / 64).toInt) & (1L << (i % 64).toInt)) != 0

    /** Set bits in [0, until) — word-popcount, so slicing a scan into K
      * tasks costs K·(words) popcounts, not K·(bits) probes.
      */
    def rank(until: Long): Long = {
      val w = (until / 64).toInt; val off = (until % 64).toInt
      var c = 0L; var i = 0
      while (i < w) { c += java.lang.Long.bitCount(words(i)); i += 1 }
      if (off > 0) c += java.lang.Long.bitCount(words(w) & ((1L << off) - 1))
      c
    }

    /** Position of the k-th (1-based) set bit. */
    def select(k: Long): Long = {
      require(k >= 1, s"select($k)")
      var remaining = k
      var i = 0
      while (i < words.length) {
        val pc = java.lang.Long.bitCount(words(i))
        if (remaining <= pc) {
          var w = words(i)
          var bit = 0
          while (true) {
            if ((w & 1L) != 0) {
              remaining -= 1
              if (remaining == 0) return i.toLong * 64 + bit
            }
            w >>>= 1; bit += 1
          }
        }
        remaining -= pc
        i += 1
      }
      throw new IllegalStateException(s"hdt: select($k) beyond bitmap")
    }
  }

  private def readBitmap(in: In): Bitmap = {
    val start = in.pos
    val tpe = in.u8()
    require(tpe == 1, s"hdt: bitmap type $tpe unsupported")
    val n = in.vbyte()
    val c8 = { val c = new Crc8; c.update(in.bytes, start, in.pos); c.value }
    require(in.u8() == c8, "hdt: bitmap header CRC8 mismatch")
    val dataStart = in.pos
    val words = readPackedWords(in, n) // byte-aligned trailer
    val crc = crc32Of(in.bytes, dataStart, in.pos)
    var stored = 0L
    var j = 0; while (j < 4) { stored |= in.u8().toLong << (8 * j); j += 1 }
    require(stored == (crc & 0xffffffffL),
      "hdt: bitmap data CRC32 mismatch (corrupt file — or a pre-r10 " +
        "graft .hdt, whose full-word trailers predate the byte-aligned " +
        "layout: re-encode it)")
    Bitmap(n, words)
  }

  // ------------------------------------------- PFC dictionary sections

  private val BlockSize = 16

  /** Plain-Front-Coding section over a byte-order-SORTED term array
    * (already UTF-8-encoded — terms encode ONCE in writeHdtLocal, not per
    * comparison/write): type 2, VByte numstrings/bytes/blocksize, CRC8;
    * Log64 block offsets; packed blocks (first string full, then VByte
    * common-prefix + suffix, all null-terminated); CRC32 over the packed
    * bytes.
    */
  private def writePfc(out: Buf, sorted: Array[Array[Byte]]): Unit = {
    val packed = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    var prev: Array[Byte] = null
    while (i < sorted.length) {
      val cur = sorted(i)
      if (i % BlockSize == 0) {
        offsets += packed.size.toLong
        packed.write(cur, 0, cur.length)
      } else {
        var common = 0
        val lim = math.min(prev.length, cur.length)
        while (common < lim && prev(common) == cur(common)) common += 1
        writeVByte(packed, common.toLong)
        packed.write(cur, common, cur.length - common)
      }
      packed.write(0)
      prev = cur
      i += 1
    }
    val data = packed.toByteArray
    val start = out.size
    out.write(2)
    writeVByte(out, sorted.length.toLong)
    writeVByte(out, data.length.toLong)
    writeVByte(out, BlockSize.toLong)
    out.write(crc8Of(out.bytes, start, out.size))
    writeSeqLog64(out, offsets.toArray)
    val dataStart = out.size
    out.write(data, 0, data.length)
    val crc = crc32Of(out.bytes, dataStart, out.size)
    var j = 0; while (j < 4) { out.write((crc >>> (8 * j)) & 0xff); j += 1 }
  }

  /** A loaded PFC section: packed bytes + block index, decoded lazily and
    * BLOCK-LOCALLY (each id costs at most one blockSize walk) — this is
    * what rides the broadcast to executors.
    */
  private[sources] final case class PfcSection(n: Long, blockSize: Int,
      offsets: SeqLog64, data: Array[Byte]) extends Serializable {

    /** Extract the 1-based id's string. */
    def extract(id: Long): String = {
      require(id >= 1 && id <= n, s"hdt: dictionary id $id out of [1,$n]")
      val block = (id - 1) / blockSize
      val skip = ((id - 1) % blockSize).toInt
      var pos = offsets(block).toInt
      // first string of the block, kept as the mutable prefix buffer
      var end = pos
      while (data(end) != 0) end += 1
      val buf = java.util.Arrays.copyOfRange(data, pos, end)
      pos = end + 1
      var cur: Array[Byte] = buf
      var k = 0
      while (k < skip) {
        val in = new In(data, pos)
        val common = in.vbyte().toInt
        pos = in.pos
        end = pos
        while (data(end) != 0) end += 1
        val next = new Array[Byte](common + (end - pos))
        System.arraycopy(cur, 0, next, 0, common)
        System.arraycopy(data, pos, next, common, end - pos)
        cur = next
        pos = end + 1
        k += 1
      }
      new String(cur, UTF_8)
    }

  }

  private def readPfc(in: In): PfcSection = {
    val start = in.pos
    val tpe = in.u8()
    require(tpe == 2, s"hdt: dictionary section type $tpe unsupported (expect 2=PFC)")
    val n = in.vbyte()
    val nbytes = in.vbyte()
    val bsz = in.vbyte().toInt
    val c8 = { val c = new Crc8; c.update(in.bytes, start, in.pos); c.value }
    require(in.u8() == c8, "hdt: PFC header CRC8 mismatch")
    val offsets = readSeqLog64(in) // written even when empty — symmetric
    val dataStart = in.pos
    val data = java.util.Arrays.copyOfRange(in.bytes, dataStart, dataStart + nbytes.toInt)
    in.pos = dataStart + nbytes.toInt
    val crc = crc32Of(in.bytes, dataStart, in.pos)
    var stored = 0L
    var j = 0; while (j < 4) { stored |= in.u8().toLong << (8 * j); j += 1 }
    require(stored == (crc & 0xffffffffL), "hdt: PFC data CRC32 mismatch")
    PfcSection(n, bsz, offsets, data)
  }

  // --------------------------------------------------- term lexical forms

  /** Engine canonical term → HDT dictionary string (IRIs lose their angle
    * brackets; literals and bnodes keep their N-Triples form).
    */
  private[sources] def toDictForm(term: String): String =
    if (term.length >= 2 && term.charAt(0) == '<' && term.endsWith(">"))
      term.substring(1, term.length - 1)
    else term

  /** HDT dictionary string → engine canonical term. */
  private[sources] def fromDictForm(s: String): String =
    if (s.isEmpty) s
    else if (s.charAt(0) == '"' || s.startsWith("_:")) s
    else "<" + s + ">"

  // --------------------------------------------------------------- write

  /** Encode a triple frame (subj, pred, obj in the engine's canonical
    * lexical forms) as one `.hdt` file. Four-Section dictionary: terms
    * appearing as BOTH subject and object share ids 1..|shared|;
    * subject-only and object-only terms follow in their own sections;
    * predicates number independently. All sections byte-sorted.
    *
    * Driver-side by format definition (one sequential file) — bounded by
    * [[MaxWriteTriples]] with a loud error. Exactly TWO Spark jobs run:
    * the distributed dedup + cap count, then one collect; dictionary
    * construction, id assignment and the SPO sort are driver-local under
    * the cap (measured: the Spark-side formulation — role aggregation +
    * three broadcast id maps + a sort shuffle — spent ~6 s in broadcast
    * serialization and shuffles that the driver does in well under 1 s
    * at cap-scale).
    */
  def writeHdt(triples: DataFrame, path: String): Unit = {
    val spark = triples.sparkSession
    import spark.implicits._
    // LIMIT cap+1 collect: the distinct computes once and the loud cap
    // check needs NO separate count+cache pass — if the limit truncated
    // (cap+1 rows came back) the input is over budget and we fail
    // before encoding; otherwise the collect IS the full distinct set.
    // Driver memory stays bounded by cap+1 rows either way.
    val rows = triples.selectExpr("subj", "pred", "obj").distinct()
      .limit(MaxWriteTriples.toInt + 1)
      .as[(String, String, String)].collect()
    require(rows.length <= MaxWriteTriples,
      s"hdt write: more than MaxWriteTriples=$MaxWriteTriples distinct " +
        "triples — the single-file HDT encode is driver-side; use the " +
        "distributed parquet/N-Quads sinks at scale")
    writeHdtLocal(rows, path)
  }

  /** The driver-local encode behind [[writeHdt]] (input already distinct
    * and under the cap).
    */
  /** Phase timing for the local encode (`-Dgraft.hdt.timing=true`). */
  private def tlog(label: String, t0: Long): Long = {
    val t = System.nanoTime()
    if (sys.props.get("graft.hdt.timing").contains("true"))
      System.err.println(f"[hdt-enc] $label%-18s ${(t - t0) / 1e9}%.3fs")
    t
  }

  private[graft] def writeHdtLocal(rows: Array[(String, String, String)],
      path: String): Unit = {
    {
      var tmark = System.nanoTime()
      val n = rows.length.toLong
      // dict forms computed ONCE per row (the id-assignment loop below
      // reuses these arrays — the previous form re-substring'd every term
      // a second time, ~2n extra allocations)
      val sForm = new Array[String](rows.length)
      val pForm = new Array[String](rows.length)
      val oForm = new Array[String](rows.length)
      val subSet = new java.util.HashSet[String](rows.length * 2)
      val predSet = new java.util.HashSet[String](64)
      val objSet = new java.util.HashSet[String](rows.length * 2)
      // one thread per ROLE: each fills its own form array + set, no
      // shared mutable state (the fork/join barrier publishes the
      // results) — wall cost drops to the single-role pass
      locally {
        val roleTasks: Array[Runnable] = Array(
          () => { var i = 0; while (i < rows.length) {
            sForm(i) = toDictForm(rows(i)._1); subSet.add(sForm(i)); i += 1 } },
          () => { var i = 0; while (i < rows.length) {
            pForm(i) = toDictForm(rows(i)._2); predSet.add(pForm(i)); i += 1 } },
          () => { var i = 0; while (i < rows.length) {
            oForm(i) = toDictForm(rows(i)._3); objSet.add(oForm(i)); i += 1 } })
        java.util.Arrays.stream(roleTasks).parallel().forEach(_.run())
      }
      tmark = tlog("forms+sets", tmark)
      import scala.jdk.CollectionConverters._
      // terms encode to UTF-8 ONCE; the byte-order sort compares arrays
      // in place (a String ordering would re-encode both sides on every
      // one of the O(n log n) comparisons — review-found). parallelSort:
      // the encode is driver-side by format definition, but the SORTS
      // inside it need not be single-threaded.
      val byteOrd: java.util.Comparator[Array[Byte]] =
        java.util.Arrays.compareUnsigned(_, _)
      def sortedBytes(it: Iterator[String]): Array[Array[Byte]] = {
        val arr = it.map(_.getBytes(UTF_8)).toArray
        if (arr.length > (1 << 13)) java.util.Arrays.parallelSort(arr, byteOrd)
        else java.util.Arrays.sort(arr, byteOrd)
        arr
      }
      val preds = sortedBytes(predSet.iterator.asScala)
      val shared = sortedBytes(
        subSet.iterator.asScala.filter(objSet.contains))
      val subOnly = sortedBytes(
        subSet.iterator.asScala.filterNot(objSet.contains))
      val objOnly = sortedBytes(
        objSet.iterator.asScala.filterNot(subSet.contains))

      def idMap(sharedArr: Array[Array[Byte]],
          own: Array[Array[Byte]]): java.util.HashMap[String, Long] = {
        val m = new java.util.HashMap[String, Long](
          (sharedArr.length + own.length) * 2)
        var i = 0L
        sharedArr.foreach { s => i += 1; m.put(new String(s, UTF_8), i) }
        own.foreach { s => i += 1; m.put(new String(s, UTF_8), i) }
        m
      }
      tmark = tlog("dict sorts", tmark)
      val subjIds = idMap(shared, subOnly)
      val objIds = idMap(shared, objOnly)
      val predIds = idMap(Array.empty, preds)

      tmark = tlog("id maps", tmark)
      // SPO sort over PRIMITIVE packed longs: ids are dense 1-based, so
      // (s,p,o) packs into one Long whenever the three bit-widths fit in
      // 63 bits (always at MaxWriteTriples scale: 3×23 bits = 69 only if
      // every section had 5M entries AND predicates did too — the
      // fallback below covers that corner). Packed parallelSort replaced
      // a boxed-comparator Tuple3 sort that dominated the encode.
      val maxS = (shared.length + subOnly.length).toLong
      val maxP = preds.length.toLong
      val maxO = (shared.length + objOnly.length).toLong
      def bitsOf(x: Long): Int =
        math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, x)))
      val (bitsP, bitsO) = (bitsOf(maxP), bitsOf(maxO))
      val packable = bitsOf(maxS) + bitsP + bitsO <= 63
      // after this block: sId/pId/oId are O(1) primitive accessors over
      // the SPO-sorted triple ids
      val (sId, pId, oId): (Int => Long, Int => Long, Int => Long) =
        if (packable) {
          val packed = new Array[Long](rows.length)
          // parallel chunked id lookup (concurrent READS of the finished
          // HashMaps; each chunk writes a disjoint slice)
          val chunk = 65536
          val nChunks = (rows.length + chunk - 1) / chunk
          java.util.stream.IntStream.range(0, nChunks).parallel().forEach { c =>
            var i = c * chunk
            val until = math.min(i + chunk, rows.length)
            while (i < until) {
              packed(i) = (subjIds.get(sForm(i)).longValue << (bitsP + bitsO)) |
                (predIds.get(pForm(i)).longValue << bitsO) |
                objIds.get(oForm(i)).longValue
              i += 1
            }
          }
          java.util.Arrays.parallelSort(packed)
          val maskP = (1L << bitsP) - 1; val maskO = (1L << bitsO) - 1
          ((i: Int) => packed(i) >>> (bitsP + bitsO),
            (i: Int) => (packed(i) >>> bitsO) & maskP,
            (i: Int) => packed(i) & maskO)
        } else {
          val arr = rows.indices.map(i =>
            (subjIds.get(sForm(i)).longValue,
              predIds.get(pForm(i)).longValue,
              objIds.get(oForm(i)).longValue)).toArray
          java.util.Arrays.parallelSort(arr, Ordering.Tuple3[Long, Long, Long])
          ((i: Int) => arr(i)._1, (i: Int) => arr(i)._2, (i: Int) => arr(i)._3)
        }

      tmark = tlog("id sort", tmark)
      val out = new Buf(1 << 20)
      writeControl(out, TypeGlobal, FormatGlobal, "Software=graft;")
      // minimal N-Triples header documenting the dataset shape
      val header =
        (s"<file://$path> <http://rdfs.org/ns/void#triples> " +
          "\"" + n + "\" .\n" +
          s"<file://$path> <http://rdfs.org/ns/void#properties> " +
          "\"" + preds.length + "\" .\n").getBytes(UTF_8)
      writeControl(out, TypeHeader, "ntriples", s"length=${header.length};")
      out.write(header, 0, header.length)
      writeControl(out, TypeDictionary, FormatDictFour,
        s"mapping=1;elements=${shared.length + subOnly.length + objOnly.length + preds.length};")
      writePfc(out, shared)
      writePfc(out, subOnly)
      writePfc(out, preds)
      writePfc(out, objOnly)
      tmark = tlog("pfc sections", tmark)
      val nRows = rows.length
      writeControl(out, TypeTriples, FormatBitmapTriples,
        s"order=1;num=$nRows;")
      // BitmapTriples SPO: subjects implicit 1..Ns; bitY marks the last
      // predicate run entry per subject; bitZ the last object per (s,p).
      // Primitive arrays sized up front (|zs| = nRows exactly, |ys| ≤
      // nRows) — the previous ArrayBuffer[Long]/[Boolean] form boxed
      // every append, millions of allocations at cap scale.
      val ys = new Array[Long](nRows)
      val zs = new Array[Long](nRows)
      val bitY = new Array[Boolean](nRows)
      val bitZ = new Array[Boolean](nRows)
      var nY = 0
      var i = 0
      while (i < nRows) {
        val s = sId(i); val p = pId(i)
        val lastOfP = i + 1 >= nRows || sId(i + 1) != s || pId(i + 1) != p
        val lastOfS = i + 1 >= nRows || sId(i + 1) != s
        if (i == 0 || sId(i - 1) != s || pId(i - 1) != p) {
          ys(nY) = p
          nY += 1 // bitY(nY-1) stays false until the run closes
        }
        zs(i) = oId(i)
        bitZ(i) = lastOfP
        if (lastOfP) bitY(nY - 1) = lastOfS
        i += 1
      }
      writeBitmap(out, java.util.Arrays.copyOf(bitY, nY))
      writeBitmap(out, bitZ)
      writeSeqLog64(out, java.util.Arrays.copyOf(ys, nY))
      writeSeqLog64(out, zs)

      tmark = tlog("bitmap triples", tmark)
      val tmp = Paths.get(path + ".tmp")
      Files.write(tmp, out.toByteArray)
      Files.move(tmp, Paths.get(path),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      tmark = tlog("file write", tmark)
    }
  }

  // ---------------------------------------------------------------- read

  /** The loaded (still packed) shape of an HDT file — compact enough to
    * broadcast: PFC bytes are front-coded, id sequences are bit-packed.
    */
  private[sources] final case class HdtData(
      shared: PfcSection, subjects: PfcSection, predicates: PfcSection,
      objects: PfcSection,
      bitY: Bitmap, bitZ: Bitmap, seqY: SeqLog64, seqZ: SeqLog64)
      extends Serializable {

    def numSubjects: Long = bitY.rank(bitY.n)
    def subjectTerm(id: Long): String = fromDictForm(
      if (id <= shared.n) shared.extract(id)
      else subjects.extract(id - shared.n))
    def objectTerm(id: Long): String = fromDictForm(
      if (id <= shared.n) shared.extract(id)
      else objects.extract(id - shared.n))
    def predicateTerm(id: Long): String = fromDictForm(predicates.extract(id))
  }

  private[graft] def load(path: String): HdtData = {
    val in = new In(Files.readAllBytes(Paths.get(path)), 0)
    val g = readControl(in)
    require(g.tpe == TypeGlobal && g.format == FormatGlobal,
      s"hdt: not an HDT file (global section ${g.format})")
    val h = readControl(in)
    require(h.tpe == TypeHeader, "hdt: missing header section")
    in.pos += h.props.getOrElse("length", "0").toInt // header RDF skipped
    val d = readControl(in)
    require(d.tpe == TypeDictionary && d.format == FormatDictFour,
      s"hdt: unsupported dictionary ${d.format}")
    val shared = readPfc(in)
    val subjects = readPfc(in)
    val predicates = readPfc(in)
    val objects = readPfc(in)
    val t = readControl(in)
    require(t.tpe == TypeTriples && t.format == FormatBitmapTriples,
      s"hdt: unsupported triples ${t.format}")
    require(t.props.getOrElse("order", "1") == "1",
      s"hdt: only SPO order supported (order=${t.props("order")})")
    val bitY = readBitmap(in)
    val bitZ = readBitmap(in)
    val seqY = readSeqLog64(in)
    val seqZ = readSeqLog64(in)
    HdtData(shared, subjects, predicates, objects, bitY, bitZ, seqY, seqZ)
  }

  /** Scan an `.hdt` file into the engine's quad frame (constant default
    * graph). The packed sections ride ONE broadcast; decoding fans out
    * over Y-run ranges — each task walks its slice of the predicate runs,
    * reconstructs subject ids from the bitmap, and extracts terms
    * block-locally from the PFC bytes (a per-task memo caches the current
    * subject and the small predicate set). Zero shuffles end to end.
    */
  def readHdt(spark: SparkSession, path: String,
      defaultGraph: String = "<urn:x-arq:DefaultGraph>"): DataFrame = {
    import spark.implicits._
    val data = load(path)
    val b = spark.sparkContext.broadcast(data)
    val nRuns = data.seqY.n
    if (nRuns == 0)
      return spark.emptyDataset[(String, String, String, String)]
        .toDF("graph", "subj", "pred", "obj")

    // subject id per Y run + Z range per Y run are bitmap prefix sums —
    // computed per task from the broadcast, so the only driver-side work
    // is the range split itself
    val slices = math.max(1, math.min(nRuns,
      spark.sparkContext.defaultParallelism.toLong * 2)).toInt
    spark.range(0, slices.toLong, 1, slices).flatMap { slice =>
      val d = b.value
      val from = slice * nRuns / slices
      val until = (slice + 1) * nRuns / slices
      new Iterator[(String, String, String, String)] {
        // subject id at run `from` = 1 + set bits of bitY before it; the
        // Z cursor starts right after the (from)-th closed run — both are
        // word-popcount rank/select, not per-bit probes
        private var subj = 1L + d.bitY.rank(from)
        private var z = if (from == 0) 0L else d.bitZ.select(from) + 1
        private var run = from
        private var runOpen = false
        private var curSubj: String = null
        private var curSubjId = -1L
        private var pred: String = null
        private val predMemo = new java.util.HashMap[Long, String]()
        def hasNext: Boolean = runOpen || run < until
        def next(): (String, String, String, String) = {
          if (!runOpen) {
            // consecutive runs usually share the subject — extract once
            if (subj != curSubjId) {
              curSubj = d.subjectTerm(subj); curSubjId = subj
            }
            val pid = d.seqY(run)
            pred = predMemo.get(pid)
            if (pred == null) { pred = d.predicateTerm(pid); predMemo.put(pid, pred) }
            runOpen = true
          }
          val row = (defaultGraph, curSubj, pred, d.objectTerm(d.seqZ(z)))
          if (d.bitZ(z)) { // run closes
            runOpen = false
            if (d.bitY(run)) subj += 1
            run += 1
          }
          z += 1
          row
        }
      }
    }.toDF("graph", "subj", "pred", "obj")
  }
}
