package graft.queries

import graft.functions.{TopKByScore, VecFunctions}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Q24 — similarity search over the `embeddings` table (SURVEY.md §2.11
  * X3/X5): brute-force cosine top-k as the correctness baseline, an
  * IVF-style cluster-pruned variant as the scale path, and an embedding
  * near-duplicate pair scan.
  *
  * Scale design: the query set is always the small side — broadcast — so the
  * corpus streams through a single narrow pass (BroadcastNestedLoopJoin with
  * the codegen'd [[graft.functions.VectorDot]] in the inner loop). Top-k per
  * query uses the bounded [[graft.functions.TopKByScore]] aggregator, whose
  * partial state is ≤k rows per map task — the shuffle carries k·tasks rows,
  * not the N·Q candidate set (a window function would shuffle every
  * candidate to one reducer per query). The IVF variant prunes the corpus to
  * the probed clusters first — at 100 TB, with the corpus partitioned by
  * cluster id, that is partition pruning, not just row filtering.
  */
object SimilarityQueries {

  private val K = 5
  private val NQueries = 10
  private val Probes = 2

  /** Deterministic high-precision mean for centroid computation: exact
    * decimal(38,12) sum (order-independent) divided by count, in double. */
  private def dmean12(c: Column): Column =
    (sum(c.cast(DecimalType(38, 12))).cast("double") / count(c))

  private val sqlDmean12 =
    (e: String) => s"(CAST(SUM(CAST(($e) AS DECIMAL(38,12))) AS DOUBLE) / COUNT($e))"

  /** DuckDB twin of VectorDot: index-ordered double-widened product sum. */
  private def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, least(len($a), len($b))), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  /** Corpus with precomputed norms; vec_dot registered on the session. */
  private def base(s: SparkSession, dir: String): DataFrame = {
    VecFunctions.register(s)
    import VecFunctions.vecDot
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("nrm", sqrt(vecDot(col("embedding"), col("embedding"))))
  }

  private val sqlBaseCte =
    s"""base AS (SELECT vec_id, label, embedding,
       |  sqrt(${sqlDot("embedding", "embedding")}) AS nrm FROM embeddings)""".stripMargin

  /** (qid, cos, vec_id) frame → top-K rows per qid via the bounded
    * aggregator, exploded back to (qid, rank, vec_id, cos). */
  private def topK(pairs: DataFrame): DataFrame = {
    val topk = udaf(new TopKByScore(K))
    pairs
      .groupBy(col("qid"))
      .agg(topk(col("cos"), col("vec_id")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("r", "s")))
      .select(
        col("qid"),
        (col("r") + 1).cast("long").as("rank"),
        col("s").getField("_2").as("vec_id"),
        round(col("s").getField("_1"), 6).as("cos"))
      .orderBy("qid", "rank")
  }

  val defs: Seq[QueryDef] = Seq(
    // X3/Q24 — brute-force cosine top-k: broadcast the query set, stream the
    // corpus once, bounded top-k per query.
    QueryDef(
      "q24_cosine_topk",
      s"""WITH $sqlBaseCte,
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm
         |      FROM base WHERE vec_id < $NQueries),
         |pairs AS (
         |  SELECT q.qid, b.vec_id, ${sqlDot("b.embedding", "q.qemb")} / (b.nrm * q.qnrm) AS cos
         |  FROM base b, q WHERE b.vec_id <> q.qid),
         |ranked AS (
         |  SELECT qid, vec_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
         |  FROM pairs)
         |SELECT qid, rank, vec_id, round(cos, 6) AS cos
         |FROM ranked WHERE rank <= $K ORDER BY qid, rank""".stripMargin) { (s, dir) =>
      import VecFunctions.vecDot
      val corpus = base(s, dir)
      val qs = base(s, dir)
        .filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"), col("nrm").as("qnrm"))
      val pairs = corpus
        .join(broadcast(qs), col("vec_id") =!= col("qid"))
        .select(
          col("qid"), col("vec_id"),
          (vecDot(col("embedding"), col("qemb")) / (col("nrm") * col("qnrm"))).as("cos"))
      topK(pairs)
    },

    // X3/Q24b — IVF-style top-k: centroid per coarse cluster (the `label`
    // column is the cluster assignment), each query probes its nearest
    // `Probes` centroids and searches only those clusters. The recall/cost
    // trade is the point: this is the 100-TB path where the corpus is
    // partitioned by cluster id and unprobed partitions are never read.
    QueryDef(
      "q24b_ivf_topk",
      s"""WITH $sqlBaseCte,
         |dims AS (SELECT unnest(generate_series(1,
         |  (SELECT max(len(embedding)) FROM embeddings))) AS i),
         |cent AS (
         |  SELECT label, list(cval ORDER BY i) AS cvec
         |  FROM (SELECT label, i, ${sqlDmean12("embedding[i]::DOUBLE")} AS cval
         |        FROM base, dims GROUP BY label, i)
         |  GROUP BY label),
         |centf AS (SELECT label, list_transform(cvec, x -> x::FLOAT) AS cvec,
         |  sqrt(${sqlDot("list_transform(cvec, x -> x::FLOAT)",
                          "list_transform(cvec, x -> x::FLOAT)")}) AS cnrm FROM cent),
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm
         |      FROM base WHERE vec_id < $NQueries),
         |probe AS (
         |  SELECT qid, label FROM (
         |    SELECT q.qid, c.label,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
         |        ${sqlDot("c.cvec", "q.qemb")} / (c.cnrm * q.qnrm) DESC, c.label) AS pr
         |    FROM q, centf c) WHERE pr <= $Probes),
         |pairs AS (
         |  SELECT q.qid, b.vec_id, ${sqlDot("b.embedding", "q.qemb")} / (b.nrm * q.qnrm) AS cos
         |  FROM q JOIN probe ON q.qid = probe.qid
         |    JOIN base b ON b.label = probe.label AND b.vec_id <> q.qid),
         |ranked AS (
         |  SELECT qid, vec_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
         |  FROM pairs)
         |SELECT qid, rank, vec_id, round(cos, 6) AS cos
         |FROM ranked WHERE rank <= $K ORDER BY qid, rank""".stripMargin) { (s, dir) =>
      import VecFunctions.vecDot
      val corpus = base(s, dir)
      // Centroids: elementwise mean per cluster via posexplode + exact
      // decimal mean, reassembled in dimension order, then cast to float
      // (matching the oracle's double→float centroid storage).
      val cent = base(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("p", "v")))
        .groupBy(col("label"), (col("p") + 1).as("i"))
        .agg(dmean12(col("v").cast("double")).as("cval"))
        .groupBy(col("label"))
        .agg(transform(
          array_sort(collect_list(struct(col("i"), col("cval")))),
          x => x.getField("cval").cast("float")).as("cvec"))
        .withColumn("cnrm", sqrt(vecDot(col("cvec"), col("cvec"))))
      val qs = base(s, dir)
        .filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"), col("nrm").as("qnrm"))
      import org.apache.spark.sql.expressions.Window
      val probe = broadcast(qs)
        .crossJoin(broadcast(cent))
        .withColumn("csim", vecDot(col("cvec"), col("qemb")) / (col("cnrm") * col("qnrm")))
        .withColumn("pr",
          row_number().over(Window.partitionBy(col("qid"))
            .orderBy(col("csim").desc, col("label"))))
        .filter(col("pr") <= Probes)
        .select(col("qid"), col("label").as("plabel"))
      val pairs = corpus
        .join(broadcast(probe.join(qs, "qid")),
          col("label") === col("plabel") && col("vec_id") =!= col("qid"))
        .select(
          col("qid"), col("vec_id"),
          (vecDot(col("embedding"), col("qemb")) / (col("nrm") * col("qnrm"))).as("cos"))
      topK(pairs)
    },

    // X2+X3/Q24c — embedding near-duplicate pairs: all-pairs cosine ≥ 0.45.
    // Quadratic by construction — correct at test scale; the 100-TB path is
    // the IVF/LSH bucketing above (compare within buckets only).
    QueryDef(
      "q24c_embed_neardup_pairs",
      s"""WITH $sqlBaseCte
         |SELECT a.vec_id AS va, b.vec_id AS vb,
         |  round(${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos
         |FROM base a, base b
         |WHERE a.vec_id < b.vec_id
         |  AND ${sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.45
         |ORDER BY va, vb""".stripMargin) { (s, dir) =>
      import VecFunctions.vecDot
      val a = base(s, dir)
        .select(col("vec_id").as("va"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = base(s, dir)
        .select(col("vec_id").as("vb"), col("embedding").as("eb"), col("nrm").as("nb"))
      a.join(broadcast(b), col("va") < col("vb"))
        .withColumn("cos", vecDot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cos") >= 0.45)
        .select(col("va"), col("vb"), round(col("cos"), 6).as("cos"))
        .orderBy("va", "vb")
    }
  )
}
