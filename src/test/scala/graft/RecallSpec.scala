package graft

import graft.queries.SimilarityQueries

/** Recall contracts of the approximate similarity paths against the exact
  * brute-force top-k — the quality half of the speed/quality trade each
  * scale path makes, pinned so a refactor can't silently degrade it.
  *
  * Numbers are test-data-honest: int8 quantization preserves ranking almost
  * perfectly (measured 0.98 recall@5); IVF recall reflects how much of the
  * corpus the probe visits — the testdata `label` column is a synthetic
  * partition, not learned centroids, so 2-of-N cluster probing bounds
  * recall well below 1.0 (measured ~0.32). On real embeddings with k-means
  * centroids the same plan recalls far higher; the spec pins the floor that
  * proves the candidate pruning isn't broken (and that every query still
  * returns a full k list).
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private def topk(name: String): Map[Long, Set[Long]] =
    SimilarityQueries.defs.find(_.name == name).get
      .df(spark, sf)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def meanRecall(exact: Map[Long, Set[Long]], approx: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, ids) =>
      approx.get(q).fold(0.0)(a => (a & ids).size.toDouble / ids.size)
    }
    per.sum / per.size
  }

  test("int8 quantization keeps near-exact ranking (recall@5 >= 0.9)") {
    val exact = topk("q24_cosine_topk")
    val quant = topk("q24e_quantized_topk")
    assert(quant.keySet === exact.keySet, "every query must return results")
    assert(quant.values.forall(_.size === 5), "full k per query")
    assert(meanRecall(exact, quant) >= 0.9)
  }

  test("PQ + exact re-rank recovers near-exact ranking (recall@5 >= 0.85)") {
    // 16×4-dim codebooks alone recall ~0.38 on this incompressible random
    // corpus; the 50-candidate exact re-rank is what lifts it (measured
    // 0.96) — the spec pins the two-stage contract, not the raw ADC
    val exact = topk("q24_cosine_topk")
    val pq = topk("q24i_pq_topk")
    assert(pq.keySet === exact.keySet, "every query must return results")
    assert(pq.values.forall(_.size === 5), "full k per query")
    assert(meanRecall(exact, pq) >= 0.85)
  }

  test("IVF probe returns full k lists with the expected pruning-bound recall") {
    val exact = topk("q24_cosine_topk")
    val ivf = topk("q24b_ivf_topk")
    assert(ivf.keySet === exact.keySet)
    assert(ivf.values.forall(_.size === 5))
    assert(meanRecall(exact, ivf) >= 0.2)
  }

  test("IVF-PQ composition is bounded by its IVF routing and returns full k lists") {
    // q24l scores only the probed cells' codes, then re-ranks exactly —
    // so against IVF's own exact-within-probed-cells results (q24b, the
    // same candidate universe) the composition's misses are ONLY PQ
    // shortlist misses, and recall vs q24b must be near-perfect even
    // though recall vs the global exact search is probe-bounded
    val ivf = topk("q24b_ivf_topk")
    val ivfpq = topk("q24l_ivfpq_topk")
    assert(ivfpq.keySet === ivf.keySet)
    assert(ivfpq.values.forall(_.size === 5))
    assert(meanRecall(ivf, ivfpq) >= 0.85,
      "PQ shortlist inside the probed cells lost too much of IVF's ranking")
  }

  test("residual IVF-PQ matches raw IVF-PQ's contract (recall vs IVF >= 0.85)") {
    // q24n encodes residuals (x - cell centroid) and scores
    // q·centroid + q·residual_code; same probed-cell candidate universe
    // and exact re-rank as q24l, so the same bound applies — its shortlist
    // differs (residual ADC ranking), its misses must not
    val ivf = topk("q24b_ivf_topk")
    val res = topk("q24n_ivfpq_residual")
    assert(res.keySet === ivf.keySet)
    assert(res.values.forall(_.size === 5))
    assert(meanRecall(ivf, res) >= 0.85,
      "residual ADC shortlist lost too much of IVF's ranking")
  }

  test("filtered search: full k lists, filter honored exactly, recall tracks its IVF routing") {
    // q24o pre-filters the candidate stream (vec_id % 3 == 0) between IVF
    // routing and ADC. Contract: (1) every returned vector satisfies the
    // predicate — the filtered-ANN correctness property post-filtering
    // breaks; (2) every query still returns a FULL k list (the shortlist
    // budget is spent inside the filter, the other classic post-filter
    // failure); (3) recall vs the exact FILTERED top-k is bounded below by
    // the same probed-cell candidate universe as q24l (same probe map), so
    // it must be within noise of the unfiltered pipeline's recall-vs-exact.
    import org.apache.spark.sql.functions._
    val filtered = topk("q24o_filtered_topk")
    assert(filtered.values.forall(_.size === 5), "short k list under the filter")
    assert(filtered.values.flatten.forall(_ % 3 == 0), "filter violated")
    // exact filtered ground truth: brute top-k restricted to the predicate
    val exactFiltered = {
      val base = graft.sources.Tables.embeddings(spark, sf)
      val qs = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      graft.functions.VecFunctions.register(spark)
      import graft.functions.VecFunctions.vecDot
      val nrm = (c: org.apache.spark.sql.Column) => sqrt(vecDot(c, c))
      base.filter(col("vec_id") % 3 === 0)
        .join(broadcast(qs), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (vecDot(col("embedding"), col("qemb")) /
            (nrm(col("embedding")) * nrm(col("qemb")))).as("cos"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
            .orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rk") <= 5)
        .select("qid", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }
    assert(filtered.keySet === exactFiltered.keySet)
    val rFiltered = meanRecall(exactFiltered, filtered)
    val rUnfiltered = meanRecall(topk("q24_cosine_topk"), topk("q24l_ivfpq_topk"))
    assert(rFiltered >= rUnfiltered - 0.15,
      f"filtered recall $rFiltered%.2f fell far below the unfiltered pipeline's $rUnfiltered%.2f")
  }

  test("semantic dedup is sound vs the all-pairs ground truth and finds dups") {
    // q24c is the exhaustive τ-neighbor list; every (dup, canonical) pair
    // q24h reports must appear there (SOUNDNESS — clustering can only lose
    // pairs whose members landed in different clusters, never invent one),
    // and the canonical must be the older (lower-id) member.
    val truth = SimilarityQueries.defs.find(_.name == "q24c_embed_neardup_pairs").get
      .df(spark, sf).select("va", "vb").as[(Long, Long)].collect().toSet
    val dups = SimilarityQueries.defs.find(_.name == "q24h_semantic_dedup").get
      .df(spark, sf)
      .filter("is_dup").select("dup_of", "vec_id").as[(Long, Long)].collect()
    assert(dups.nonEmpty, "test corpus contains near-dups; none flagged")
    dups.foreach { case (canon, dup) =>
      assert(canon < dup, s"canonical $canon must be the lower id (dup $dup)")
      assert(truth.contains((canon, dup)),
        s"($canon,$dup) flagged but not a true τ-pair")
    }
  }

  test("MMR reranking matches an independent in-Scala greedy recomputation") {
    // q24j's geometry, restated here (pool 20, k 5, λ 0.7/0.3): the spec
    // recomputes the ENTIRE greedy selection sequence from raw embeddings
    // with plain Scala loops — same index-order double dot as VectorDot,
    // same (-score, id) tie-breaks — and demands the exact pick order, not
    // just set overlap. Any drift in the shortlist cut, the λ blend, or
    // the selected-set max would reorder some query's sequence.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      val n = math.min(a.length, b.length)
      var s = 0.0; var i = 0
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val nrm = emb.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    def cos(a: Long, b: Long): Double = dot(emb(a), emb(b)) / (nrm(a) * nrm(b))
    val got = SimilarityQueries.defs.find(_.name == "q24j_mmr_topk").get
      .df(spark, sf).select("qid", "mmr_rank", "vec_id")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val qids = emb.keys.filter(_ < 10).toSeq.sorted
    assert(got.keySet === qids.toSet)
    qids.foreach { q =>
      val pool = emb.keys.filter(_ != q).toSeq
        .map(c => c -> cos(c, q))
        .sortBy { case (id, r) => (-r, id) }.take(20)
      val rel = pool.toMap
      var selected = Vector(pool.head._1)
      while (selected.size < 5) {
        val pick = pool.map(_._1).filterNot(selected.contains)
          .map { c =>
            val msim = selected.map(s0 => cos(c, s0)).max
            c -> (0.7 * rel(c) - 0.3 * msim)
          }
          .minBy { case (id, sc) => (-sc, id) }._1
        selected :+= pick
      }
      assert(got(q) === selected,
        s"query $q: engine picked ${got(q)}, reference greedy picked $selected")
    }
  }

  test("NDCG/MRR eval matches an independent in-Scala recomputation") {
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Long)].collect()
    val emb = df.map(r => r._1 -> r._2).toMap
    val lbl = df.map(r => r._1 -> r._3).toMap
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      val n = math.min(a.length, b.length)
      var s = 0.0; var i = 0
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val nrm = emb.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    val disc = Seq(1.0, 0.6309297535714575, 0.5, 0.43067655807339306, 0.38685280723454163)
    val got = SimilarityQueries.defs.find(_.name == "q24k_ndcg_eval").get
      .df(spark, sf).select("qid", "n_rel", "ndcg5", "mrr")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val qids = emb.keys.filter(_ < 10).toSeq.sorted
    assert(got.keySet === qids.toSet)
    qids.foreach { q =>
      val top5 = emb.keys.filter(_ != q).toSeq
        .map(c => c -> dot(emb(c), emb(q)) / (nrm(c) * nrm(q)))
        .sortBy { case (id, r) => (-r, id) }.take(5).map(_._1)
      val rels = top5.map(v => if (lbl(v) == lbl(q)) 1 else 0)
      val nRel = lbl.count { case (id, l) => id != q && l == lbl(q) }
      val dcg = rels.zip(disc).map { case (r, d) => r * d }.sum
      val idcg = disc.take(math.min(nRel, 5)).sum
      val ndcg = if (idcg > 0) dcg / idcg else 0.0
      val mrr = rels.indexOf(1) match { case -1 => 0.0; case i => 1.0 / (i + 1) }
      val (_, gotNRel, gotNdcg, gotMrr) = got(q)
      assert(gotNRel === nRel.toLong, s"query $q n_rel")
      assert(math.abs(gotNdcg - ndcg) < 1e-5, s"query $q ndcg $gotNdcg vs $ndcg")
      assert(math.abs(gotMrr - mrr) < 1e-5, s"query $q mrr $gotMrr vs $mrr")
    }
  }

  test("q55 fixed-point power iteration matches a sequential reference run") {
    // the distributed two-aggregation rounds must walk the EXACT integer
    // sequence a single-threaded mirror of the fixed-point recipe walks —
    // any float path or ordering dependence in the plan breaks this
    val data = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val S = 1000000L
    val d = data.head._2.length
    val n = data.length
    def tdiv(x: Long, dv: Long): Long = if (x < 0) -((-x) / dv) else x / dv
    val xi = data.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * S).toLong).toArray }
    val mu = Array.tabulate(d)(j => tdiv(xi.map(_._2(j)).sum, n))
    val ci = xi.map { case (id, v0) =>
      id -> Array.tabulate(d)(j => v0(j) - mu(j)) }
    var v = Array.fill(d)(S)
    for (_ <- 1 to 3) {
      val dots = ci.map { case (id, c) =>
        id -> tdiv((0 until d).map(j => c(j) * v(j)).sum, 100000000L) }.toMap
      val w = Array.tabulate(d)(j => ci.map { case (id, c) => c(j) * dots(id) }.sum)
      val md = math.max(1L, w.map(math.abs).max / S)
      v = w.map(tdiv(_, md))
    }
    val expected = ci.map { case (id, c) =>
      id -> tdiv((0 until d).map(j => c(j) * v(j)).sum, S) }.toMap
    val got = SimilarityQueries.defs.find(_.name == "q55_pca_projection").get
      .df(spark, sf).select("vec_id", "proj").as[(Long, Long)].collect().toMap
    assert(got === expected)
    // non-degenerate: the dominant direction separates the corpus
    assert(expected.values.toSet.size > 1)
  }

  test("q60 semantic decontamination matches a local brute-force mirror") {
    // local mirror of the whole pipeline: the q25j split hash, the index-
    // ordered double dot (VectorDot's accumulation), the lexicographic
    // (cos, vec_id) argmax — any divergence in split rule, norm handling
    // or tie policy breaks the exact comparison
    val data = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val withNorm = data.map { case (id, e) => (id, e, math.sqrt(dot(e, e))) }
    val (ev, tr) = withNorm.partition { case (id, _, _) => h32(s"split:$id") % 100 >= 90 }
    assert(ev.nonEmpty && tr.nonEmpty, "fixture split degenerate")
    val expected = ev.map { case (qid, qe, qn) =>
      // the packed-argmax contract: ordering at floor(cos·1e8) granularity,
      // ties to the larger vid; max_cos IS the fixed-point value
      val best = tr.map { case (vid, te, tn) =>
        (math.floor(dot(te, qe) / (tn * qn) * 1e8).toLong, vid) }.max
      qid -> (best._1.toDouble / 1e8, best._2, best._1 >= 45000000L,
        if (h32(s"split:$qid") % 100 >= 95) "test" else "val")
    }.toMap
    val got = SimilarityQueries.defs.find(_.name == "q60_semantic_decontamination").get
      .df(spark, sf)
      .select("eval_id", "max_cos", "nn_train_id", "contaminated", "split")
      .as[(Long, Double, Long, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet === expected.keySet, "eval id set")
    got.foreach { case (qid, (cos, nn, cont, split)) =>
      val (ecos, enn, econt, esplit) = expected(qid)
      assert(nn === enn, s"qid $qid: nn $nn != $enn")
      assert(math.abs(cos - ecos) < 1e-9, s"qid $qid: cos $cos != $ecos")
      assert(cont === econt && split === esplit, s"qid $qid: flags")
    }
    // the bar discriminates on the fixture corpus (near-dups exist)
    assert(got.values.exists(_._3) && got.values.exists(!_._3), "tau never fired")
  }

  test("q60b LSH routing is a sound under-approximation of exact decontamination") {
    def rows(name: String): Map[Long, (Double, Boolean)] =
      SimilarityQueries.defs.find(_.name == name).get
        .df(spark, sf)
        .select("eval_id", "max_cos", "contaminated")
        .as[(Long, Double, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = rows("q60_semantic_decontamination")
    val lsh = rows("q60b_lsh_decontamination")
    // candidates are a subset of all pairs: every LSH row exists exactly,
    // its max never exceeds the exact max, and a contaminated verdict is
    // never fabricated
    assert(lsh.keySet.subsetOf(exact.keySet), "LSH fabricated an eval id")
    lsh.foreach { case (qid, (cos, cont)) =>
      assert(cos <= exact(qid)._1 + 1e-12, s"qid $qid: LSH max above exact")
      assert(!cont || exact(qid)._2, s"qid $qid: fabricated contamination")
    }
    // recall of the contaminated set — near-dups collide in some band with
    // high probability; the floor is test-data-honest (q24d's ~55% recall
    // is at ALL pairs ≥ 0.45, this measures only flagged-vs-flagged)
    val exactPos = exact.filter(_._2._2).keySet
    assert(exactPos.nonEmpty, "fixture has no contaminated eval docs")
    val hit = exactPos.count(q => lsh.get(q).exists(_._2))
    val recall = hit.toDouble / exactPos.size
    assert(recall >= 0.5, s"contaminated-set recall $recall below floor")
  }

  test("q24p incremental append is bit-equal to a from-scratch encode and never rewrites standing files") {
    import org.apache.spark.sql.functions._
    // 1. the merged (standing + appended) codes table equals one full
    //    re-encode of history+batch against the SAME frozen codebooks —
    //    the exactness claim the oracle gate rests on, pinned Spark-side
    val merged = SimilarityQueries.q24pMergedCodes(spark, sf)
      .select("vec_id", "m", "cid", "cell")
      .as[(Long, Int, Long, Int)].collect().sorted.toSeq
    val scratch = SimilarityQueries.q24pFromScratchCodes(spark, sf)
      .select("vec_id", "m", "cid", "cell")
      .as[(Long, Int, Long, Int)].collect().sorted.toSeq
    assert(merged === scratch, "incremental codes diverged from full re-encode")
    assert(merged.nonEmpty && merged.exists(_._1 % 7 == 0) &&
      merged.exists(_._1 % 7 != 0), "both standing and batch codes present")
    // 2. the nightly append added NEW files into the cell directories —
    //    no parquet file mixes standing and appended rows, which is only
    //    possible if standing files were left untouched
    val mixed = SimilarityQueries.q24pMergedCodes(spark, sf)
      .select((col("vec_id") % 7 === 0).as("isb"), input_file_name().as("f"))
      .groupBy(col("f")).agg(countDistinct(col("isb")).as("k"))
      .filter(col("k") > 1).count()
    assert(mixed === 0L, "a parquet file mixes standing and appended rows")
  }

  test("q24p retrain trigger reads q67's drift rate at the documented novelty bar") {
    import org.apache.spark.sql.functions._
    val q67 = SimilarityQueries.defs.find(_.name == "q67_embedding_drift").get
      .df(spark, sf)
      .select("source", "neardup_frac").as[(String, Double)].collect().toSeq
    // independent Scala-side recomputation of the documented rule
    val expected = q67
      .filter { case (_, f) => 1.0 - f > SimilarityQueries.RetrainNoveltyBar }
      .map { case (src, f) =>
        (src, BigDecimal(1.0 - f).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) }
      .sortBy(_._1)
    val due = SimilarityQueries.q24pRetrainDue(spark, sf)
      .select("source", "novelty_frac").as[(String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(due === expected, "retrain trigger disagrees with q67's drift frame")
  }
}
