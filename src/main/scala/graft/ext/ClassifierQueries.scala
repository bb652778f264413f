package graft.ext

import org.apache.spark.sql.functions._
import graft.query.{Q, Tables}

/** Query-pack entries for the trainable quality classifier
  * ([[Classifier]]). The DuckDB oracles are FULL REPLAYS of the batch
  * perceptron — every training round unrolls as CTE stages over the
  * identical pmd5-hashed feature frame (the PageRank/k-means unrolled-
  * fixpoint idiom), so the driver's hash compare certifies the whole
  * training loop, not just the final projection. All arithmetic is
  * BIGINT; both engines agree exactly. */
object ClassifierQueries {

  private val B = 64 // hash buckets for the pack queries (model size)
  private val ITERS = 3 // training rounds, unrolled in the oracle
  private val GRAN = 8L // c5 threshold granularity (floor buckets)
  // supervision for the pack: does the document mention 'table'? —
  // content-derived so training has real signal to move weights
  private val LABEL_SQL = "contains(text, 'table')"

  /** Shared oracle prefix: features, labels, dense zero grid, and the
    * unrolled training rounds ending at w`ITERS`. Round 1 exploits
    * w0 = 0 (every margin 0, every doc misclassified); rounds i ≥ 2
    * score with w(i-1), gate on y·margin ≤ 0, and add the per-bucket
    * update. Mirrors [[Classifier.trainPerceptron]] stage for stage. */
  private def trainCtes: String = {
    val head =
      s"""tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS t
         |  FROM documents
         |), feat AS (
         |  SELECT doc_id, ${DedupQueries.pmSql("t")} % $B AS b,
         |    count(*)::BIGINT AS c
         |  FROM tok GROUP BY 1, 2
         |), lab AS (
         |  SELECT doc_id, CASE WHEN $LABEL_SQL THEN 1 ELSE -1 END AS y
         |  FROM documents
         |), grid AS (
         |  SELECT unnest(generate_series(0, ${B - 1}))::BIGINT AS b
         |), w1 AS (
         |  SELECT g.b, coalesce(s.w, 0)::BIGINT AS w FROM grid g LEFT JOIN (
         |    SELECT b, sum(y * c) AS w FROM feat JOIN lab USING (doc_id)
         |    GROUP BY b) s ON g.b = s.b
         |)""".stripMargin
    val rounds = (2 to ITERS).map { i =>
      s""", m$i AS (
         |  SELECT f.doc_id, sum(w.w * f.c) AS m
         |  FROM feat f JOIN w${i - 1} w ON f.b = w.b GROUP BY 1
         |), mis$i AS (
         |  SELECT l.doc_id, l.y FROM lab l LEFT JOIN m$i m
         |    ON l.doc_id = m.doc_id
         |  WHERE l.y * coalesce(m.m, 0) <= 0
         |), w$i AS (
         |  SELECT w.b, (w.w + coalesce(s.dw, 0))::BIGINT AS w
         |  FROM w${i - 1} w LEFT JOIN (
         |    SELECT b, sum(y * c) AS dw FROM feat JOIN mis$i USING (doc_id)
         |    GROUP BY b) s ON w.b = s.b
         |)""".stripMargin
    }.mkString
    head + rounds
  }

  /** OvR oracle: the binary chain with a `cls` key threaded through
    * every stage — K binary problems, same number of CTEs. */
  private def trainCtesOvR: String = {
    val head =
      s"""tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS t
         |  FROM documents
         |), feat AS (
         |  SELECT doc_id, ${DedupQueries.pmSql("t")} % $B AS b,
         |    count(*)::BIGINT AS c
         |  FROM tok GROUP BY 1, 2
         |), cl AS (
         |  SELECT DISTINCT source::VARCHAR AS cls FROM documents
         |  WHERE source IS NOT NULL
         |), lab AS (
         |  SELECT d.doc_id, c.cls,
         |    CASE WHEN d.source = c.cls THEN 1 ELSE -1 END AS y
         |  FROM documents d CROSS JOIN cl c
         |), grid AS (
         |  SELECT c.cls, g.b FROM cl c CROSS JOIN (
         |    SELECT unnest(generate_series(0, ${B - 1}))::BIGINT AS b) g
         |), w1 AS (
         |  SELECT g.cls, g.b, coalesce(s.w, 0)::BIGINT AS w
         |  FROM grid g LEFT JOIN (
         |    SELECT l.cls, f.b, sum(l.y * f.c) AS w
         |    FROM feat f JOIN lab l USING (doc_id) GROUP BY 1, 2) s
         |    ON g.cls = s.cls AND g.b = s.b
         |)""".stripMargin
    val rounds = (2 to ITERS).map { i =>
      s""", m$i AS (
         |  SELECT f.doc_id, w.cls, sum(w.w * f.c) AS m
         |  FROM feat f JOIN w${i - 1} w ON f.b = w.b GROUP BY 1, 2
         |), mis$i AS (
         |  SELECT l.doc_id, l.cls, l.y FROM lab l LEFT JOIN m$i m
         |    ON l.doc_id = m.doc_id AND l.cls = m.cls
         |  WHERE l.y * coalesce(m.m, 0) <= 0
         |), w$i AS (
         |  SELECT w.cls, w.b, (w.w + coalesce(s.dw, 0))::BIGINT AS w
         |  FROM w${i - 1} w LEFT JOIN (
         |    SELECT mis.cls, f.b, sum(mis.y * f.c) AS dw
         |    FROM feat f JOIN mis$i mis USING (doc_id) GROUP BY 1, 2) s
         |    ON w.cls = s.cls AND w.b = s.b
         |)""".stripMargin
    }.mkString
    head + rounds
  }

  def all: Seq[Q] = Seq(

    // Batch-perceptron training: the dense B-row weight frame after
    // ITERS integer rounds. Hash-exact because every quantity is a
    // BIGINT count/sum — no learning rate, no sigmoid.
    Q(
      "c1_perceptron_train",
      s"WITH $trainCtes SELECT b, w FROM w$ITERS") { (s, dir) =>
      Classifier.trainPerceptron(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        col("text").contains("table"), buckets = B, iters = ITERS)
    },

    // Train + apply: per-document margin and keep/drop decision under
    // the trained model — the production filter composition, replayed
    // end-to-end (training rounds AND the scoring pass) in the oracle.
    Q(
      "c2_perceptron_filter",
      s"""WITH $trainCtes, ms AS (
         |  SELECT f.doc_id, sum(w.w * f.c) AS m
         |  FROM feat f JOIN w$ITERS w ON f.b = w.b GROUP BY 1
         |)
         |SELECT d.doc_id, coalesce(m.m, 0)::BIGINT AS margin,
         |  (CASE WHEN coalesce(m.m, 0) > 0 THEN 1 ELSE 0 END)::BIGINT AS pred
         |FROM documents d LEFT JOIN ms m ON d.doc_id = m.doc_id""".stripMargin) {
      (s, dir) =>
        Classifier.perceptronFilter(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          col("text").contains("table"), buckets = B, iters = ITERS)
    },

    // One-vs-rest multiclass training: the dense (cls, b, w) weight
    // frame — K binary perceptrons trained in shared per-round
    // aggregations, every round of every class replayed in the oracle.
    Q(
      "c3_perceptron_ovr_train",
      s"WITH $trainCtesOvR SELECT cls, b, w FROM w$ITERS") { (s, dir) =>
      Classifier.trainPerceptronOvR(
        Tables.load(s, dir, "documents"), "doc_id", "text", "source",
        buckets = B, iters = ITERS)
    },

    // OvR prediction: argmax class margin per document (ties → class
    // name ascending), trained and applied on the same corpus — the
    // domain-annotation stage of a mixture pipeline, end-to-end.
    Q(
      "c4_perceptron_ovr_predict",
      s"""WITH $trainCtesOvR, ms AS (
         |  SELECT f.doc_id, w.cls, sum(w.w * f.c)::BIGINT AS m
         |  FROM feat f JOIN w$ITERS w ON f.b = w.b GROUP BY 1, 2
         |), rk AS (
         |  SELECT doc_id, cls, m, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY m DESC, cls ASC) AS rn
         |  FROM ms
         |)
         |SELECT doc_id, cls AS pred_cls, m AS margin
         |FROM rk WHERE rn = 1""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      // r15: one shared feature frame for train + predict (was two
      // full featurize passes) — same model, same margins
      Classifier.trainPredictOvR(
        docs, "doc_id", "text", "source", buckets = B, iters = ITERS)
    },

    // Precision/recall threshold sweep over the trained binary model's
    // margins — the calibration audit that picks a filter's keep
    // threshold. Oracle replays training, scoring, the granularity-G
    // floor bucketing, and both cumulative sums.
    Q(
      "c5_pr_curve",
      s"""WITH $trainCtes, ms AS (
         |  SELECT f.doc_id, sum(w.w * f.c) AS m
         |  FROM feat f JOIN w$ITERS w ON f.b = w.b GROUP BY 1
         |), sc AS (
         |  SELECT d.doc_id, coalesce(m.m, 0)::BIGINT AS margin,
         |    (CASE WHEN $LABEL_SQL THEN 1 ELSE 0 END)::BIGINT AS y01
         |  FROM documents d LEFT JOIN ms m ON d.doc_id = m.doc_id
         |), per_t AS (
         |  SELECT (margin // $GRAN) * $GRAN AS threshold,
         |    count(*)::BIGINT AS n, sum(y01)::BIGINT AS tp
         |  FROM sc GROUP BY 1
         |), cum AS (
         |  SELECT threshold,
         |    sum(n) OVER (ORDER BY threshold DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         |      AS n_kept,
         |    sum(tp) OVER (ORDER BY threshold DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         |      AS tp
         |  FROM per_t
         |), tot AS (
         |  SELECT coalesce(sum(tp), 0)::BIGINT AS pos_total FROM per_t
         |)
         |SELECT threshold, n_kept, tp,
         |  (tp * 10000 // n_kept)::BIGINT AS prec_e4,
         |  (CASE WHEN pos_total > 0 THEN tp * 10000 // pos_total
         |    ELSE 0 END)::BIGINT AS rec_e4
         |FROM cum CROSS JOIN tot""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      // r15: perceptronFilter IS train+score on one shared feature
      // frame (was trainPerceptron + scoreDocs = two featurize passes);
      // identical model and margins
      val scores = Classifier.perceptronFilter(
        docs, "doc_id", "text", col("text").contains("table"),
        buckets = B, iters = ITERS)
        .select("doc_id", "margin")
      val truth = docs.select(col("doc_id"),
        when(col("text").contains("table"), 1L).otherwise(0L).as("y01"))
      Classifier.prCurve(scores, truth, granularity = GRAN)
    },

    // AVERAGED perceptron (Freund & Schapire): W_avg = Σ_r w_r, the
    // sum of the per-round weight snapshots — the stabilization that
    // makes final weights insensitive to the oscillation of the plain
    // perceptron on non-separable data. The oracle already carries
    // every round's snapshot as a CTE; the average is their join-sum.
    Q(
      "c6_perceptron_avg_train",
      s"""WITH $trainCtes
         |SELECT w1.b, (${(1 to ITERS).map(i => s"w$i.w").mkString(" + ")})
         |  ::BIGINT AS w
         |FROM w1${(2 to ITERS).map(i => s" JOIN w$i USING (b)").mkString}""".stripMargin) {
      (s, dir) =>
        Classifier.trainPerceptronAveraged(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          col("text").contains("table"), buckets = B, iters = ITERS)
    },

    // Averaged one-vs-rest: the same snapshot sum per (cls, b).
    Q(
      "c7_perceptron_ovr_avg_train",
      s"""WITH $trainCtesOvR
         |SELECT w1.cls, w1.b,
         |  (${(1 to ITERS).map(i => s"w$i.w").mkString(" + ")})::BIGINT AS w
         |FROM w1${(2 to ITERS).map(i => s" JOIN w$i USING (cls, b)").mkString}""".stripMargin) {
      (s, dir) =>
        Classifier.trainPerceptronOvRAveraged(
          Tables.load(s, dir, "documents"), "doc_id", "text", "source",
          buckets = B, iters = ITERS)
    }
  )
}
