package graft

import graft.ext.Bpe

/** Distributed BPE training vs a pure-Scala reference implementation,
  * plus encode round-trip properties. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference trainer: same tie-breaks (freq desc, pair lexicographic)
    * and same greedy left-to-right merge application. */
  private def refTrain(
      words: Map[String, Long], numMerges: Int, minFreq: Long)
      : Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] = words
      .groupMapReduce(_._1.map(_.toString).toVector)(_._2)(_ + _)
    val merges = collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (sym, f) =>
        sym.iterator.zip(sym.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some((p @ (a, b), n)) if n >= minFreq =>
          merges += p
          vocab = vocab.groupMapReduce { case (sym, _) =>
            sym.foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == a && x == b)
                acc.init :+ (a + b)
              else acc :+ x
            }
          }(_._2)(_ + _)
        case _ => done = true
      }
    }
    merges.toSeq
  }

  test("distributed training equals the reference trainer") {
    val docs = Seq(
      "low low low low low",
      "lower lower newest newest newest",
      "newest newest newest widest widest",
      "widest low lower").toDF("text").withColumn("doc_id",
      org.apache.spark.sql.functions.monotonically_increasing_id())

    val words = docs.collect().flatMap(_.getString(0).split(" +"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = refTrain(words, numMerges = 10, minFreq = 2)
    val got = Bpe.train(docs, "text", numMerges = 10, minFreq = 2)
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("encode round-trips and compresses under trained merges") {
    val docs = Seq.fill(8)("the theme thesis there").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 6, minFreq = 2)
    val ranks = merges.zipWithIndex.toMap
    for (w <- Seq("the", "theme", "thesis", "there", "unseen")) {
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString === w, s"round-trip broke for $w")
    }
    // 'the' is the dominant prefix — it must compress below char count
    assert(Bpe.encodeWord("the", ranks).length < 3)

    val counts = Bpe.encodeTokens(
      docs.withColumn("doc_id",
        org.apache.spark.sql.functions.monotonically_increasing_id()),
      "doc_id", "text", merges)
      .collect().map(_.getLong(1))
    assert(counts.forall(_ > 0))
    // 4 words/doc, each compressed to fewer tokens than characters
    assert(counts.forall(_ <= 4 * 6))
  }

  test("encodeTokensByRounds equals the rank-greedy memoized encoder " +
    "on the fixture corpus") {
    // round-based merge application (the t27 declarative/oracle path)
    // vs encodeWord's repeated lowest-rank scan: equivalent unless a
    // later merge resurrects an earlier merge's input — pinned here on
    // the real corpus plus the crafted overlap vocab below
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val merges = Bpe.train(docs, "text", numMerges = 12)
    assert(merges.nonEmpty)
    val byRounds = Bpe.encodeTokensByRounds(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val greedy = Bpe.encodeTokens(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byRounds === greedy)
    // overlap stress: "aaaa" under merge list ((a,a), (aa,aa))
    import spark.implicits._
    val tricky = Seq((1L, "aaaa aaa aa a")).toDF("doc_id", "text")
    val trickyMerges = Seq(("a", "a"), ("aa", "aa"))
    val tr = Bpe.encodeTokensByRounds(tricky, "doc_id", "text", trickyMerges)
      .collect().head.getLong(1)
    val tg = Bpe.encodeTokens(tricky, "doc_id", "text", trickyMerges)
      .collect().head.getLong(1)
    // aaaa->[aaaa], aaa->[aa,a], aa->[aa], a->[a] = 5 tokens
    assert(tr === 5L && tg === 5L)
  }
}
