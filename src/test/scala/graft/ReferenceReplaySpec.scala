package graft

import org.apache.spark.sql.functions._
import graft.ext.{Similarity, TextAnalysis}

/** Randomized reference replays for the session-4 similarity/text
  * operators — independent from-scratch Scala implementations of each
  * contract (cosine fold order, HALF_UP e6 rounding, id tie-breaks,
  * greedy objectives, gram semantics) compared exactly against the
  * engine on random inputs. The oracle differential certifies the
  * fixture path; these certify the CONTRACT on inputs the fixture
  * never exercises (ties, negative cosines, degenerate sizes), the
  * same discipline as the PageRank random-graph replay.
  */
class ReferenceReplaySpec extends SparkSpec {
  import spark.implicits._

  /** The engine's score pipeline, replicated: left-to-right double
    * dot (VectorDot fold order), cosine, Spark `round(x, 6)` =
    * BigDecimal HALF_UP, then `round(x·1e6)` to a long the same way. */
  private def cos6(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    val c = d / (math.sqrt(na) * math.sqrt(nb))
    BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def e6(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def randVec(rnd: scala.util.Random, dim: Int): Seq[Float] =
    Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)

  /** Collapse -0.0 to +0.0 before using a rounded cosine as a sort
    * key: Scala's total Ordering[Double] ranks -0.0 < 0.0 while the
    * engine's sort ties them and falls through to the id tie-break. */
  private def zeroNorm(c: Double): Double = if (c == 0.0) 0.0 else c

  test("mmrTopK equals an independent greedy replay on random corpora") {
    val rnd = new scala.util.Random(77)
    for (trial <- 0 until 5) {
      val n = 8 + rnd.nextInt(20)
      val dim = 4
      val vecs = (0 until n).map(i => (i.toLong, randVec(rnd, dim)))
      val q = randVec(rnd, dim)
      val cands = math.min(n, 6 + rnd.nextInt(10))
      val k = 1 + rnd.nextInt(math.min(5, cands))
      val lam = rnd.nextInt(11)

      // reference: candidate rank, pairwise sims, unrolled greedy
      val rel = vecs.map { case (id, v) => id -> e6(cos6(v, q)) }.toMap
      val order = vecs.map { case (id, v) => (id, cos6(v, q)) }
        .sortBy { case (id, c) => (-zeroNorm(c), id) }
        .take(cands).map(_._1)
      val byId = vecs.toMap
      def sim(a: Long, b: Long): Long = e6(cos6(byId(a), byId(b)))
      var remaining = order.toSet
      val chosen = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
      for (rank <- 1 to math.min(k, order.size)) {
        val scored = remaining.toSeq.map { id =>
          val m =
            if (chosen.isEmpty) rel(id)
            else lam * rel(id) -
              (10L - lam) * chosen.map(c => sim(id, c._2)).max
          (id, m)
        }
        val (bid, bm) = scored.minBy { case (id, m) => (-m, id) }
        chosen += ((rank, bid, rel(bid),
          if (chosen.isEmpty) lam * bm else bm))
        remaining -= bid
      }
      val got = Similarity.mmrTopK(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", q,
        candidates = cands, k = k, lamTenths = lam)
        .orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq === chosen.toSeq,
        s"trial=$trial n=$n cands=$cands k=$k lam=$lam")
      spark.catalog.clearCache()
    }
  }

  test("kCenterCoreset equals an independent greedy FPS replay on " +
    "random corpora") {
    // fully independent replay: test-side md5 hash for the seed, a
    // plain left-fold double for the squared distance, e6 floors
    // BEFORE every min/argmax — the engine's exact contract
    def pmd5(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    def d2e6(a: Seq[Float], b: Seq[Float]): Long = {
      var s = 0.0
      for (i <- a.indices) {
        val d = a(i).toDouble - b(i).toDouble
        s += d * d
      }
      math.floor(s * 1e6).toLong
    }
    val rnd = new scala.util.Random(123)
    for (trial <- 0 until 5) {
      val n = 5 + rnd.nextInt(25)
      val k = 1 + rnd.nextInt(8) // may exceed n -> truncation path
      val vecs = (0 until n).map(i => (i.toLong, randVec(rnd, 4)))
      val byId = vecs.toMap
      val seedId = vecs.map(_._1).minBy(id => (pmd5(id), id))
      var md = vecs.map { case (id, v) => id -> d2e6(v, byId(seedId)) }.toMap
      val want = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)](
        (1L, seedId, 0L))
      for (rank <- 2L to math.min(k.toLong, n.toLong)) {
        val (fid, fmd) = md.toSeq.minBy { case (id, m) => (-m, id) }
        want += ((rank, fid, fmd))
        md = md.map { case (id, m) =>
          id -> math.min(m, d2e6(byId(id), byId(fid)))
        }
      }
      val got = Similarity.kCenterCoreset(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", k)
        .orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq === want.toSeq, s"trial=$trial n=$n k=$k")
      // the coverage-radius curve is non-increasing past the seed
      val radii = got.toSeq.drop(1).map(_._3)
      assert(radii === radii.sorted(Ordering[Long].reverse))

      // the cover: independent nearest-center assignment (integer
      // distances, rank-ascending tiebreak) rolled up per center
      val centers = want.toSeq.map { case (rank, id, _) => (rank, id) }
      val assign = vecs.map { case (id, v) =>
        val ds = centers.map { case (rank, cid) => (d2e6(v, byId(cid)), rank) }
        val m = ds.map(_._1).min
        ds.find(_._1 == m).get._2 -> m
      }
      val wantCover = centers.map { case (rank, cid) =>
        val mine = assign.filter(_._1 == rank).map(_._2)
        (rank, cid, mine.size.toLong,
          if (mine.isEmpty) 0L else mine.max)
      }
      val gotCover = Similarity.kCenterCover(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", k)
        .orderBy("center_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(gotCover.toSeq === wantCover, s"cover trial=$trial n=$n k=$k")
      // every vector is covered exactly once
      assert(gotCover.map(_._3).sum === n.toLong)
      spark.catalog.clearCache()
    }
  }

  test("labelNoiseScreen equals an independent kNN replay on random " +
    "labeled corpora") {
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 5) {
      val n = 6 + rnd.nextInt(20)
      val k = 1 + rnd.nextInt(6)
      val vecs = (0 until n).map(i =>
        (i.toLong, randVec(rnd, 4), rnd.nextInt(3)))
      val byId = vecs.map(v => v._1 -> v._2).toMap
      val lab = vecs.map(v => v._1 -> v._3).toMap
      val ref = vecs.map { case (id, v, l) =>
        val nbrs = vecs.filter(_._1 != id)
          .map { case (cid, cv, _) => (cid, cos6(cv, v)) }
          .sortBy { case (cid, c) => (-zeroNorm(c), cid) }
          .take(k).map(_._1)
        val dis = nbrs.count(c => lab(c) != l)
        id -> ((l.toLong, nbrs.size.toLong, dis.toLong,
          dis.toLong * 10000L / nbrs.size))
      }.toMap
      val got = Similarity.labelNoiseScreen(
        vecs.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", k = k)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(got === ref, s"trial=$trial n=$n k=$k")
      spark.catalog.clearCache()
    }
  }

  test("blocklistHits equals an independent gram scan on random docs") {
    val rnd = new scala.util.Random(55)
    val words = Seq("aa", "bb", "cc", "dd", "ee")
    for (trial <- 0 until 5) {
      val docs = (0 until 10 + rnd.nextInt(20)).map { i =>
        (i.toLong,
          Seq.fill(1 + rnd.nextInt(12))(
            words(rnd.nextInt(words.size))).mkString(" "))
      }
      val phrases = (Seq.fill(2)(words(rnd.nextInt(words.size))) ++
        Seq.fill(2)(s"${words(rnd.nextInt(words.size))} " +
          words(rnd.nextInt(words.size)))).distinct
      // reference: explicit unigram + bigram scan
      val hits = scala.collection.mutable.Map
        .empty[String, (Long, Set[Long])]
      for ((id, text) <- docs) {
        val toks = text.split(" ").toSeq
        val grams = toks ++ toks.sliding(2).filter(_.size == 2)
          .map(_.mkString(" "))
        for (g <- grams if phrases.contains(g)) {
          val (c, ids) = hits.getOrElse(g, (0L, Set.empty[Long]))
          hits(g) = (c + 1, ids + id)
        }
      }
      val ref = hits.map { case (p, (c, ids)) =>
        p -> ((c, ids.size.toLong)) }.toMap
      val got = TextAnalysis.blocklistHits(
        docs.toDF("doc_id", "text"), "doc_id", "text", phrases)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got === ref, s"trial=$trial phrases=$phrases")
      spark.catalog.clearCache()
    }
  }
}
