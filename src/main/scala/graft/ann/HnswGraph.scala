package graft.ann

import java.io.{DataInputStream, DataOutputStream}
import java.util.PriorityQueue
import scala.collection.mutable.ArrayBuffer

/** Metric ids shared by the graph and the artifact header. */
object Metric {
  val L2Sq = 0
  val Cos = 1
  val Inner = 2

  /** Unit-normalize `q` when `metric == "cos"` (zero-norm vectors pass
    * through), else return it unchanged — the ONE query-side
    * normalization every cos-metric index search path must share:
    * cos-built artifacts store normalized vectors, so a copy of this
    * logic drifting (precision, zero handling) would silently diverge
    * batch vs single-query rankings. */
  def normalizeIfCos(q: Array[Float], metric: String): Array[Float] =
    if (metric != "cos") q
    else {
      var s = 0.0
      q.foreach(x => s += x.toDouble * x)
      val n = math.sqrt(s)
      if (n == 0.0) q else q.map(x => (x / n).toFloat)
    }

  /** Asymmetric distance: f32 query vs i8-coded node, reconstructing
    * each element exactly as [[graft.pq.ScalarQuantizer.dequantizeI8]]
    * would (`(lo + (c+128)·scale).toFloat`) so compact i8 graphs score
    * BIT-IDENTICALLY to the decode-to-f32 path — one extra fma per
    * element, reading a quarter of the memory. */
  def distI8(m: Int, a: Array[Float], codes: Array[Byte],
      lo: Float, scale: Double): Double =
    distDecoded(m, a, i => (lo + (codes(i).toInt + 128) * scale).toFloat)

  /** Asymmetric distance: f32 query vs f16-coded node, decoding each
    * element with [[graft.pq.ScalarQuantizer.fromF16]] — bit-identical
    * to the decode-to-f32 path at half the node memory. */
  def distF16(m: Int, a: Array[Float], codes: Array[Short]): Double =
    distDecoded(m, a, i => graft.pq.ScalarQuantizer.fromF16(codes(i)))

  /** Asymmetric distance: f32 query vs sub-byte packed node codes
    * (1/2/4 bits), reconstructing each element exactly as
    * [[graft.pq.ScalarQuantizer.dequantizePacked]] would — bit-identical
    * to the decode-to-f32 path at 1/32 – 1/8 of the f32 node memory. */
  def distPacked(m: Int, a: Array[Float], codes: Array[Byte], nbits: Int,
      lo: Float, step: Double): Double =
    distDecoded(m, a,
      i => (lo + graft.pq.ScalarQuantizer.packedCode(codes, i, nbits) * step).toFloat)

  /** Shared metric bodies for the compact asymmetric forms — one
    * implementation, so i8 and f16 serving cannot drift from each
    * other (and the per-node spec pin ties both to [[dist]]). The f32
    * path keeps its own monomorphic loops: it is the build-time and
    * default-serving hot path. */
  private def distDecoded(m: Int, a: Array[Float], v: Int => Float): Double =
    m match {
      case L2Sq =>
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i).toDouble - v(i).toDouble; s += d * d; i += 1 }
        s
      case Cos =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          val x = a(i).toDouble; val y = v(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val den = math.sqrt(na) * math.sqrt(nb)
        if (den == 0.0) 1.0 else 1.0 - dot / den
      case Inner =>
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i).toDouble * v(i).toDouble; i += 1 }
        -s
      case Hamming => throw new IllegalStateException(
        "graft: hamming shards are never quant-compact")
    }

  /** Hamming over packed bit vectors (`dist_hamming_ops`,
    * lantern_hnsw/sql/lantern.sql:88-99). The graph stores floats, so
    * bit vectors ride in them as exact 16-bit words: every value is an
    * integer in [0, 65535], which a float represents exactly (24-bit
    * mantissa) — lossless, and the graph/serialization code is shared
    * unchanged with the float metrics. Convert with [[b1ToWords]].
    */
  val Hamming = 3

  def id(name: String): Int = name match {
    case "l2sq" => L2Sq
    case "cos" => Cos
    case "inner" => Inner
    case "hamming" => Hamming
    case other => throw new IllegalArgumentException(
      s"graft: unsupported ANN metric '$other' (expected l2sq|cos|inner|hamming)")
  }
  def name(id: Int): String = id match {
    case L2Sq => "l2sq"; case Cos => "cos"; case Inner => "inner"
    case Hamming => "hamming"
  }

  /** b1-packed ints (32 bits each, MSB-first — ScalarQuantizer
    * .quantizeB1 layout) → exact 16-bit words as floats. */
  def b1ToWords(packed: Array[Int]): Array[Float] = {
    val out = new Array[Float](packed.length * 2)
    var i = 0
    while (i < packed.length) {
      out(2 * i) = ((packed(i) >>> 16) & 0xFFFF).toFloat
      out(2 * i + 1) = (packed(i) & 0xFFFF).toFloat
      i += 1
    }
    out
  }

  /** Distance under metric `m`; all metrics ordered ascending = nearest.
    * Inner product is negated so "smaller is closer" holds uniformly
    * (max inner product == min negative inner product).
    */
  def dist(m: Int, a: Array[Float], b: Array[Float]): Double = m match {
    case L2Sq =>
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    case Cos =>
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 1.0 else 1.0 - dot / den
    case Inner =>
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      -s
    case Hamming =>
      var s = 0; var i = 0
      while (i < a.length) {
        s += Integer.bitCount(a(i).toInt ^ b(i).toInt); i += 1
      }
      s.toDouble
  }
}

/** In-graph scalar storage kinds — the reference's `quant_bits`
  * reloption (lantern_hnsw/src/hnsw/options.c:137-158): vector
  * elements are cast to a narrower scalar INSIDE the index artifact.
  * b1 is not listed here because the hamming metric already IS the
  * 1-bit index (bit vectors ride as exact packed words).
  */
object Quant {
  val F32 = 0
  val F16 = 1 // 2 bytes/elem in the artifact
  val I8 = 2 // 1 byte/elem in the artifact
  val B4 = 3 // 4 bits/elem, packed — quant_bits = 4
  val B2 = 4 // 2 bits/elem, packed — quant_bits = 2
  val B1 = 5 // 1 bit/elem, packed — quant_bits = 1 (level storage for
  // float metrics; the hamming metric is the SIGN-bit 1-bit index)

  def id(name: String): Int = name match {
    case "f32" => F32
    case "f16" => F16
    case "i8" => I8
    case "b4" => B4
    case "b2" => B2
    case "b1" => B1
    case other => throw new IllegalArgumentException(
      s"graft: unsupported quant '$other' (expected f32|f16|i8|b4|b2|b1)")
  }
  def name(id: Int): String = id match {
    case F32 => "f32"; case F16 => "f16"; case I8 => "i8"
    case B4 => "b4"; case B2 => "b2"; case B1 => "b1"
  }

  /** Packed code width in bits; 0 for byte-or-wider kinds. */
  def packedBits(id: Int): Int = id match {
    case B4 => 4; case B2 => 2; case B1 => 1; case _ => 0
  }
}

/** In-memory HNSW graph — one shard of the distributed index.
  *
  * Independent implementation of the published HNSW algorithm
  * (Malkov & Yashunin, "Efficient and robust approximate nearest
  * neighbor search using Hierarchical Navigable Small World graphs",
  * IEEE TPAMI 2018). Parameter semantics follow the reference engine:
  * random level = floor(-ln(U) / ln(M)) (lantern_hnsw/src/hnsw/
  * insert.c:32-46), defaults m=16 / ef_construction=128 / ef=64
  * (lantern_hnsw/src/hnsw/options.h:14-25). Layer-0 degree cap is 2M,
  * upper layers M (standard HNSW).
  *
  * Deletes only mask labels (tombstones), never restructure the graph —
  * same semantics as the reference (delete.c:15-73, scan.c:294-300):
  * masked nodes are still traversed, just never emitted.
  */
final class HnswGraph(
    val dim: Int,
    val m: Int,
    val efConstruction: Int,
    val metric: Int,
    seed: Long,
    val quant: Int = Quant.F32,
    val i8Lo: Float = -1f,
    val i8Hi: Float = 1f) extends Serializable {
  require(quant == Quant.F32 || metric != Metric.Hamming,
    "graft: hamming shards store exact packed words — quant must be f32")

  private val maxM = m
  private val maxM0 = 2 * m
  private val levelMult = 1.0 / math.log(m.toDouble)
  private val rng = new java.util.Random(seed)

  private[ann] val ids = new ArrayBuffer[Long]()
  private[ann] val vecs = new ArrayBuffer[Array[Float]]()
  // COMPACT read-mode storage for quantized artifacts: codes instead
  // of f32 arrays — 1/4 (i8) or 1/2 (f16) of the executor RAM per
  // shard, the part of quant_bits that matters at serving scale.
  // Populated only by HnswGraph.read; build-mode graphs always hold
  // f32 (insert needs full-precision neighbor selection on the
  // snapped values).
  private[ann] var vecsI8: ArrayBuffer[Array[Byte]] = null
  private[ann] var vecsF16: ArrayBuffer[Array[Short]] = null
  // sub-byte packed codes (b4/b2/b1) — 1/8 to 1/32 of the f32 RAM
  private[ann] var vecsPacked: ArrayBuffer[Array[Byte]] = null
  private[ann] def compact: Boolean =
    vecsI8 != null || vecsF16 != null || vecsPacked != null
  private val i8Scale: Double = (i8Hi - i8Lo) / 255.0
  private val packedBits: Int = Quant.packedBits(quant)
  private val packedStep: Double =
    if (packedBits > 0) (i8Hi - i8Lo).toDouble / ((1 << packedBits) - 1) else 0.0
  private[ann] val nodeLevels = new ArrayBuffer[Int]()
  // neighbors(node)(layer) = array of node indices
  private[ann] val neighbors = new ArrayBuffer[Array[ArrayBuffer[Int]]]()
  private[ann] var entryPoint: Int = -1
  private[ann] var maxLevel: Int = -1

  def size: Int = ids.length

  @inline private def d(a: Array[Float], b: Array[Float]): Double =
    Metric.dist(metric, a, b)

  private def randomLevel(): Int =
    math.floor(-math.log(rng.nextDouble() max Double.MinPositiveValue) * levelMult).toInt

  /** Greedy 1-NN descent on one layer (used above the insert level).
    * `nd(n)` = distance from the (implicit) query to node n — pluggable
    * so a PQ shard can traverse with an asymmetric LUT distance.
    */
  private[ann] def greedyClosest(nd: Int => Double, entry: Int, layer: Int): Int = {
    var cur = entry
    var curDist = nd(cur)
    var improved = true
    while (improved) {
      improved = false
      val nbrs = neighbors(cur)(layer)
      var i = 0
      while (i < nbrs.length) {
        val cand = nbrs(i)
        val cd = nd(cand)
        if (cd < curDist) { curDist = cd; cur = cand; improved = true }
        i += 1
      }
    }
    cur
  }

  /** Beam search on one layer: returns up to `ef` (dist, node) pairs. */
  private[ann] def searchLayer(
      nd: Int => Double, entries: Seq[Int], ef: Int, layer: Int): ArrayBuffer[(Double, Int)] = {
    val visited = new java.util.BitSet(size)
    // candidates: min-heap by distance; results: max-heap bounded at ef
    val cand = new PriorityQueue[(Double, Int)](16, (x, y) => java.lang.Double.compare(x._1, y._1))
    val res = new PriorityQueue[(Double, Int)](16, (x, y) => java.lang.Double.compare(y._1, x._1))
    entries.foreach { e =>
      if (!visited.get(e)) {
        visited.set(e)
        val de = nd(e)
        cand.add((de, e)); res.add((de, e))
      }
    }
    while (res.size > ef) res.poll()
    while (!cand.isEmpty) {
      val (cd, c) = cand.poll()
      if (res.size >= ef && cd > res.peek()._1) {
        cand.clear() // every remaining candidate is farther than the worst result
      } else {
        val nbrs = neighbors(c)(layer)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (!visited.get(nb)) {
            visited.set(nb)
            val ndist = nd(nb)
            if (res.size < ef || ndist < res.peek()._1) {
              cand.add((ndist, nb)); res.add((ndist, nb))
              if (res.size > ef) res.poll()
            }
          }
          i += 1
        }
      }
    }
    val out = new ArrayBuffer[(Double, Int)](res.size)
    while (!res.isEmpty) out += res.poll()
    out // farthest-first; callers sort as needed
  }

  /** Neighbor selection heuristic (paper Algorithm 4): keep a candidate
    * only if it is closer to the query than to every already-kept
    * neighbor — yields diverse edges, better recall than plain M-nearest.
    */
  private def selectNeighbors(
      q: Array[Float], candidates: ArrayBuffer[(Double, Int)], count: Int): ArrayBuffer[Int] = {
    val sorted = candidates.sortBy(_._1)
    val out = new ArrayBuffer[Int](count)
    var i = 0
    while (i < sorted.length && out.length < count) {
      val (cd, c) = sorted(i)
      var keep = true
      var j = 0
      while (keep && j < out.length) {
        if (d(vecs(c), vecs(out(j))) < cd) keep = false
        j += 1
      }
      if (keep) out += c
      i += 1
    }
    // backfill with nearest skipped candidates if the heuristic pruned too many
    i = 0
    while (out.length < count && i < sorted.length) {
      val c = sorted(i)._2
      if (!out.contains(c)) out += c
      i += 1
    }
    out
  }

  /** Snap a vector to its stored-scalar representation, so build- and
    * search-time distances see exactly what the artifact will hold
    * (quantized traversal — reference quant_bits semantics). f16/i8
    * decode is exact, so snap-then-encode round-trips losslessly.
    * Delegates to the canonical [[graft.pq.ScalarQuantizer.snap]] —
    * the validator re-derives through the same code. */
  private def snap(v: Array[Float]): Array[Float] =
    graft.pq.ScalarQuantizer.snap(v, Quant.name(quant), i8Lo, i8Hi)

  def insert(id: Long, rawVec: Array[Float]): Unit = {
    require(!compact,
      "graft: compact (read-mode) graphs are immutable — build a delta shard")
    require(rawVec.length == dim,
      s"graft: vector dimension mismatch: ${rawVec.length} vs $dim")
    val vec = snap(rawVec)
    val level = randomLevel()
    val node = size
    ids += id
    vecs += vec
    nodeLevels += level
    neighbors += Array.fill(level + 1)(new ArrayBuffer[Int](maxM0))

    if (entryPoint < 0) { entryPoint = node; maxLevel = level; return }

    val nd = (n: Int) => d(vec, vecs(n))
    var ep = entryPoint
    var lc = maxLevel
    while (lc > level) { ep = greedyClosest(nd, ep, lc); lc -= 1 }

    lc = math.min(level, maxLevel)
    var entries: Seq[Int] = Seq(ep)
    while (lc >= 0) {
      val cands = searchLayer(nd, entries, efConstruction, lc)
      val cap = if (lc == 0) maxM0 else maxM
      val selected = selectNeighbors(vec, cands, math.min(m, cap))
      neighbors(node)(lc) ++= selected
      // bidirectional links + shrink overflowing lists
      selected.foreach { nb =>
        val lst = neighbors(nb)(lc)
        lst += node
        if (lst.length > cap) {
          val pruned = selectNeighbors(
            vecs(nb), lst.map(x => (d(vecs(nb), vecs(x)), x)), cap)
          lst.clear(); lst ++= pruned
        }
      }
      entries = cands.map(_._2).toSeq
      lc -= 1
    }
    if (level > maxLevel) { maxLevel = level; entryPoint = node }
  }

  def label(n: Int): Long = ids(n)
  def vector(n: Int): Array[Float] =
    if (vecsI8 != null) graft.pq.ScalarQuantizer.dequantizeI8(vecsI8(n), i8Lo, i8Hi)
    else if (vecsF16 != null) graft.pq.ScalarQuantizer.dequantizeF16(vecsF16(n))
    else if (vecsPacked != null)
      graft.pq.ScalarQuantizer.dequantizePacked(vecsPacked(n), dim, packedBits, i8Lo, i8Hi)
    else vecs(n)

  /** Query→node distance under this graph's storage: f32 arrays, or
    * the asymmetric i8/f16/packed forms on compact graphs
    * (bit-identical scores — see [[Metric.distI8]]/[[Metric.distF16]]/
    * [[Metric.distPacked]]). */
  private[ann] def queryDist(q: Array[Float])(n: Int): Double =
    if (vecsI8 != null) Metric.distI8(metric, q, vecsI8(n), i8Lo, i8Scale)
    else if (vecsF16 != null) Metric.distF16(metric, q, vecsF16(n))
    else if (vecsPacked != null)
      Metric.distPacked(metric, q, vecsPacked(n), packedBits, i8Lo, packedStep)
    else d(q, vecs(n))

  /** ANN top-k as (node index, dist) nearest-first. `banned` =
    * tombstoned labels: traversed but not emitted (reference
    * scan.c:294-300).
    */
  def searchNodes(q: Array[Float], k: Int, ef: Int, banned: Long => Boolean = _ => false)
      : Array[(Int, Double)] = {
    require(q.length == dim, s"graft: vector dimension mismatch: ${q.length} vs $dim")
    searchNodesWith(queryDist(q), k, ef, banned)
  }

  /** Top-k traversal under an arbitrary query→node distance — the hook
    * for PQ shards (asymmetric LUT distance, reference scan.c:75-88).
    */
  def searchNodesWith(nd: Int => Double, k: Int, ef: Int,
      banned: Long => Boolean = _ => false): Array[(Int, Double)] = {
    if (entryPoint < 0) return Array.empty
    var ep = entryPoint
    var lc = maxLevel
    while (lc > 0) { ep = greedyClosest(nd, ep, lc); lc -= 1 }
    val res = searchLayer(nd, Seq(ep), math.max(ef, k), 0)
    res.sortBy(_._1).iterator
      .filterNot { case (_, n) => banned(ids(n)) }
      .take(k)
      .map { case (dd, n) => (n, dd) }
      .toArray
  }

  /** ANN top-k as (label, dist) nearest-first. */
  def search(q: Array[Float], k: Int, ef: Int, banned: Long => Boolean = _ => false)
      : Array[(Long, Double)] =
    searchNodes(q, k, ef, banned).map { case (n, dd) => (ids(n), dd) }

  /** Structural invariant walk — `validate_index` analog
    * (lantern_hnsw/src/hnsw/validate_index.c:436-528): every neighbor
    * index resolves, no self-loop, level lists present, entry point valid.
    * Returns list of violations (empty = valid).
    */
  def validate(): Seq[String] = {
    val errs = ArrayBuffer[String]()
    if (size > 0 && (entryPoint < 0 || entryPoint >= size)) {
      errs += s"entry point $entryPoint out of range [0,$size)"
      return errs.toSeq // further checks would dereference the bad entry
    }
    if (size > 0 && nodeLevels(entryPoint) != maxLevel)
      errs += s"entry point level ${nodeLevels(entryPoint)} != maxLevel $maxLevel"
    var n = 0
    while (n < size) {
      if (neighbors(n).length != nodeLevels(n) + 1)
        errs += s"node $n: ${neighbors(n).length} layers != level ${nodeLevels(n)} + 1"
      var l = 0
      while (l < neighbors(n).length) {
        neighbors(n)(l).foreach { nb =>
          if (nb < 0 || nb >= size) errs += s"node $n layer $l: neighbor $nb out of range"
          else if (nb == n) errs += s"node $n layer $l: self-loop"
          else if (nodeLevels(nb) < l) errs += s"node $n layer $l: neighbor $nb has lower level ${nodeLevels(nb)}"
        }
        l += 1
      }
      n += 1
    }
    errs.toSeq
  }

  def write(out: DataOutputStream): Unit = {
    out.writeInt(HnswGraph.Magic2)
    out.writeInt(dim); out.writeInt(m); out.writeInt(efConstruction)
    out.writeInt(metric); out.writeInt(quant)
    out.writeFloat(i8Lo); out.writeFloat(i8Hi)
    out.writeInt(size)
    out.writeInt(entryPoint); out.writeInt(maxLevel)
    var n = 0
    while (n < size) {
      out.writeLong(ids(n))
      out.writeInt(nodeLevels(n))
      var i = 0
      quant match {
        case Quant.F32 =>
          val v = vecs(n)
          while (i < dim) { out.writeFloat(v(i)); i += 1 }
        case Quant.F16 =>
          if (compact) {
            val q = vecsF16(n)
            while (i < dim) { out.writeShort(q(i)); i += 1 }
          } else {
            val v = vecs(n)
            while (i < dim) {
              out.writeShort(graft.pq.ScalarQuantizer.toF16(v(i))); i += 1
            }
          }
        case Quant.I8 =>
          // compact graphs hold the codes already; build-mode vecs are
          // snapped, so encoding round-trips bit-exact
          val q =
            if (compact) vecsI8(n)
            else graft.pq.ScalarQuantizer.quantizeI8(vecs(n), i8Lo, i8Hi)
          out.write(q, 0, q.length)
        case _ =>
          val q =
            if (compact) vecsPacked(n)
            else graft.pq.ScalarQuantizer.quantizePacked(
              vecs(n), packedBits, i8Lo, i8Hi)
          out.write(q, 0, q.length)
      }
      var l = 0
      while (l <= nodeLevels(n)) {
        val nbrs = neighbors(n)(l)
        out.writeInt(nbrs.length)
        nbrs.foreach(out.writeInt)
        l += 1
      }
      n += 1
    }
  }

  def toBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(1 << 20)
    val dos = new DataOutputStream(new java.util.zip.GZIPOutputStream(bos, 1 << 16))
    write(dos)
    dos.close()
    bos.toByteArray
  }
}

object HnswGraph {
  val Magic = 0x47484E57 // "GHNW" — pre-quant format (f32 elements)
  val Magic2 = 0x47484E58 // adds (quant, i8Lo, i8Hi) + narrow elements

  def read(in: DataInputStream): HnswGraph = {
    val magic = in.readInt()
    require(magic == Magic || magic == Magic2,
      "graft: not an HNSW graph artifact")
    val dim = in.readInt(); val m = in.readInt(); val efc = in.readInt()
    val metric = in.readInt()
    val (quant, lo, hi) =
      if (magic == Magic2) (in.readInt(), in.readFloat(), in.readFloat())
      else (Quant.F32, -1f, 1f)
    val n = in.readInt()
    val g = new HnswGraph(dim, m, efc, metric, seed = 0L, quant, lo, hi)
    // quantized artifacts deserialize COMPACT: codes stay codes (4x /
    // 2x less RAM per shard); traversal uses the asymmetric distance
    if (quant == Quant.I8) g.vecsI8 = new ArrayBuffer[Array[Byte]](n)
    if (quant == Quant.F16) g.vecsF16 = new ArrayBuffer[Array[Short]](n)
    if (Quant.packedBits(quant) > 0) g.vecsPacked = new ArrayBuffer[Array[Byte]](n)
    g.entryPoint = in.readInt()
    g.maxLevel = in.readInt()
    var i = 0
    while (i < n) {
      g.ids += in.readLong()
      val lvl = in.readInt()
      g.nodeLevels += lvl
      quant match {
        case Quant.F32 =>
          val v = new Array[Float](dim)
          var j = 0
          while (j < dim) { v(j) = in.readFloat(); j += 1 }
          g.vecs += v
        case Quant.F16 =>
          val q = new Array[Short](dim)
          var j = 0
          while (j < dim) { q(j) = in.readShort(); j += 1 }
          g.vecsF16 += q
        case Quant.I8 =>
          val q = new Array[Byte](dim)
          in.readFully(q)
          g.vecsI8 += q
        case _ =>
          val bits = Quant.packedBits(quant)
          val per = 8 / bits
          val q = new Array[Byte]((dim + per - 1) / per)
          in.readFully(q)
          g.vecsPacked += q
      }
      val layers = new Array[ArrayBuffer[Int]](lvl + 1)
      var l = 0
      while (l <= lvl) {
        val cnt = in.readInt()
        val nbrs = new ArrayBuffer[Int](cnt)
        var c = 0
        while (c < cnt) { nbrs += in.readInt(); c += 1 }
        layers(l) = nbrs
        l += 1
      }
      g.neighbors += layers
      i += 1
    }
    g
  }

  def fromBytes(bytes: Array[Byte]): HnswGraph = {
    val in = new DataInputStream(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 1 << 16))
    try read(in) finally in.close()
  }
}
