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
    }
  )
}
