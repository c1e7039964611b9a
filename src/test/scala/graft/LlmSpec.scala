package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall/consistency checks for the approximate (no-oracle) LLM ops against
  * their exact twins, on the sf0.001 tables.
  */
class LlmSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("vocabThreshold=0 forces the prefix path with identical results") {
    // the adaptive set-similarity queries dispatch bitset-vs-prefix on a
    // measured vocabulary count; overriding the threshold to 0 must swap
    // the physical algorithm (open-vocabulary prefix filtering) without
    // changing a single output row — the dispatcher is a pure plan choice
    for (name <- Seq("x2_jaccard_exact", "x2_containment", "x1_dedup_clusters",
        "x3_rrf_fusion")) {
      val bitset = q(name).collect().toSeq
      graft.Caches.drain(spark)
      spark.conf.set("graft.setsim.vocabThreshold", "0")
      val prefix = try q(name).collect().toSeq
        finally spark.conf.unset("graft.setsim.vocabThreshold")
      graft.Caches.drain(spark)
      assert(prefix == bitset, s"$name: prefix path diverged from bitset path")
    }
  }

  test("closed-vocab fallback (prefixJoinBudget=0) swaps the algorithm, " +
      "not the answer") {
    // the r08 sf1 dispatch stage: above the vocab threshold, a corpus whose
    // sum(df^2) predicts a quadratic prefix join reroutes to the bitset
    // NLJ. Force both routes on the same corpus (vocabThreshold=1 puts
    // every query above the threshold; prefixJoinBudget 0 vs huge picks
    // the branch) — identical rows is the dispatch-is-a-pure-plan-choice
    // contract, same as the vocabThreshold=0 test above.
    for (name <- Seq("x2_jaccard_exact", "x2_containment")) {
      spark.conf.set("graft.setsim.vocabThreshold", "1")
      val viaPrefix = try {
        spark.conf.set("graft.setsim.prefixJoinBudget", Long.MaxValue.toString)
        q(name).collect().toSeq
      } finally spark.conf.unset("graft.setsim.prefixJoinBudget")
      graft.Caches.drain(spark)
      val viaBitset = try {
        spark.conf.set("graft.setsim.prefixJoinBudget", "0")
        q(name).collect().toSeq
      } finally {
        spark.conf.unset("graft.setsim.prefixJoinBudget")
        spark.conf.unset("graft.setsim.vocabThreshold")
      }
      graft.Caches.drain(spark)
      assert(viaPrefix.nonEmpty && viaBitset == viaPrefix,
        s"$name: bitset fallback diverged from the prefix path")
    }
  }

  test("x4_quality_classifier: >=90% agreement with the gate it distills; " +
      "funnel classifier leg filters exactly the keep set") {
    import org.apache.spark.sql.functions.col
    // the shipped weights are an offline logistic distillation of the
    // heuristic quality gate — pin the agreement that was measured at
    // training time (92% at both SFs), so a weight or featurizer change
    // that silently breaks the model fails here, not in production
    val clf = q("x4_quality_classifier")
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val gate = q("x4_quality")
      .select("doc_id", "passes_quality").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    graft.Caches.drain(spark)
    assert(clf.keySet == gate.keySet)
    val agree = clf.count { case (id, k) => gate(id) == k }.toDouble / clf.size
    assert(agree >= 0.9, s"distillation agreement $agree")
    // optional funnel leg: stage-1 survivors with the classifier on must
    // be exactly (heuristic survivors ∩ classifier keeps) — the learned
    // gate composes, never replaces, and downstream stages are untouched
    val d = graft.Tables.load(spark, sfDir, "documents")
    val (qualOn, _, _) =
      graft.queries.Llm.curationStages(spark, d, useClassifier = true)
    val onIds = qualOn.select("doc_id").collect().map(_.getLong(0)).toSet
    graft.Caches.drain(spark)
    val (qualOff, _, _) = graft.queries.Llm.curationStages(spark, d)
    val offIds = qualOff.select("doc_id").collect().map(_.getLong(0)).toSet
    graft.Caches.drain(spark)
    assert(onIds == offIds.filter(id => clf(id)),
      "classifier leg must gate stage 1 to exactly its keep set")
    assert(onIds.size < offIds.size, "classifier must actually reject some docs")
  }

  test("bitset pair join is size-band equi-keyed — no cartesian/NLJ left") {
    // r09: the S^2 bitset NLJ became an equi-join on geometric size bands
    // (band(n) = floor(ln n / ln(1/t)); J >= t pairs are at most one band
    // apart, probe side visits {band-1, band, band+1}). Pure plan choice:
    // the size predicate stays in the residual, so rows are identical by
    // construction (and the oracle hash pins them); here pin the PLAN —
    // the popcount must stream size-compatible bucket mates, never S^2.
    val df = q("x2_jaccard_bigram")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    graft.Caches.drain(spark)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"set-pair join must be band-keyed, not all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"no equi-join on the band key:\n$p")
  }

  test("x2_minhash_lsh: precision vs the exact >=0.5 pair list, recall at 0.6") {
    // exact twin: all-pairs 3-shingle jaccard (small at 500 docs), at the
    // query's own 0.5 verify threshold
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), TF.shingles(col("text"), 3).as("sh"))
    val exact05 = d.as("a").crossJoin(d.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", TF.jaccard(col("a.sh"), col("b.sh")))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshAll = q("x2_minhash_lsh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // PRECISION is deterministic even though the candidate set isn't: every
    // emitted pair passed the exact-jaccard >= 0.5 verify, so the full
    // output must be a subset of the exact >= 0.5 list — the one-sided
    // check that keeps this rows-only query honest (false positives here
    // mean the verify step itself is broken)
    assert(lshAll.subsetOf(exact05), s"false positives: ${lshAll -- exact05}")
    // ...and at b=16,r=2 the per-pair candidate probability at j=0.6 is
    // 1-(1-0.36)^16 ≈ 0.9992 — demand >= 90% recall on the >= 0.6 slice
    val exact = d.as("a").crossJoin(d.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", TF.jaccard(col("a.sh"), col("b.sh")))
      .filter(col("j") >= 0.6)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = q("x2_minhash_lsh")
      .filter(col("jaccard") >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.9, s"recall $recall over ${exact.size} true pairs")
    }
  }

  test("x2_containment_lsh: exact-subset precision + >=90% recall on planted snippet-in-doc fixtures") {
    import spark.implicits._
    // planted corpus, OPEN vocabulary (the regime the exact twin's bitset
    // path can't take): 40 big docs of ~48 distinct words; for 20 of them a
    // SNIPPET of 8-12 of their own words (containment 1.0, Jaccard ~0.17 —
    // two strata down, invisible to plain Jaccard banding); 10 same-stratum
    // near-copies at C ~0.93; plus 3 exact duplicates (the intra-set path)
    val rng = new scala.util.Random(41)
    val vocab = (0 until 400).map(i => s"w$i")
    def sample(n: Int, from: Seq[String]): Seq[String] =
      rng.shuffle(from).take(n)
    val bigs = (0 until 40).map(i =>
      (100L + i, sample(48, vocab).mkString(" ")))
    val snippets = (0 until 20).map { i =>
      val bigWords = bigs(i)._2.split(" ").toSeq
      (300L + i, sample(8 + rng.nextInt(5), bigWords).mkString(" "))
    }
    val nearCopies = (0 until 10).map { i =>
      val bigWords = bigs(20 + i)._2.split(" ").toSeq
      // drop 2 of 48, add 2 fresh: C = 46/48 ≈ 0.958, same stratum
      (500L + i, (sample(46, bigWords) ++ sample(2, vocab.drop(350)))
        .mkString(" "))
    }
    val dups = (0 until 3).map(i => (700L + i, bigs(30)._2))
    val d = (bigs ++ snippets ++ nearCopies ++ dups).toDF("doc_id", "text")
    val tok = d.select(col("doc_id"), explode(TF.tokenSet(col("text"))).as("w"))
    val exact = graft.queries.Llm
      .containmentPairsForTest(spark, tok, 9, 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val lsh = graft.queries.Llm.containmentLshPairs(spark, d, 9, 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    graft.Caches.drain(spark)
    // precision is one-sided exact: every emitted pair passed the exact
    // verify, so it must appear in the exact twin's list WITH the same
    // integer scores (the 62-bit token hashes stand in for the tokens)
    val falsePos = lsh.keySet -- exact.keySet
    assert(falsePos.isEmpty, s"false positives: ${falsePos.take(5)}")
    val scoreDiff = lsh.filter { case (k, v) => exact(k) != v }
    assert(scoreDiff.isEmpty, s"score mismatch: ${scoreDiff.take(3)}")
    // planted snippet pairs: gap 2 → band budget 20 at Jmin ~0.11, so the
    // per-pair candidate probability at the planted J ~0.17 is ≥ 0.97
    val planted = snippets.map(s => (100L + (s._1 - 300L), s._1)).toSet
    assert(planted.forall(exact.contains), "fixture bug: a plant isn't exact-qualified")
    val plantRecall = planted.count(lsh.contains).toDouble / planted.size
    assert(plantRecall >= 0.9,
      s"snippet-in-doc recall $plantRecall over ${planted.size} plants")
    // overall recall across every qualifying pair class
    val recall = exact.keySet.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} true pairs")
    // the near-copy and exact-dup plants ride the high-probability tiers —
    // demand all of them
    val sure = (0 until 10).map(i => (120L + i, 500L + i)).toSet ++
      Set((130L, 700L), (700L, 701L), (700L, 702L), (701L, 702L))
    assert(sure.forall(lsh.contains),
      s"missed high-J plants: ${sure.filterNot(lsh.contains)}")
  }

  /** Driver-side replay of containmentDedup's decision rule over a pair
    * list: orient by distinct-set size (ties keep the smaller id), then per
    * contained doc take lexicographic max of (C, J, -container).
    */
  private def foldDedup(pairs: Seq[(Long, Long, Long, Long)],
      sizes: Map[Long, Long]): Map[Long, (Long, Long, Long, Long)] =
    pairs.map { case (a, b, c, j) =>
      if (sizes(a) < sizes(b)) (a, b, c, j) else (b, a, c, j)
    }.groupBy(_._1).map { case (docId, rows) =>
      val best = rows.maxBy(r => (r._3, r._4, -r._2))
      docId -> (best._2, best._3, best._4, rows.size.toLong)
    }

  test("x2_containment_dedup == fold of x2_containment_lsh pairs; planted snippets map to their source doc") {
    import spark.implicits._
    // same planted corpus as the recall test above: snippets (contained in
    // exactly one big doc at C = 1), same-stratum near-copies, exact dups
    val rng = new scala.util.Random(41)
    val vocab = (0 until 400).map(i => s"w$i")
    def sample(n: Int, from: Seq[String]): Seq[String] =
      rng.shuffle(from).take(n)
    val bigs = (0 until 40).map(i =>
      (100L + i, sample(48, vocab).mkString(" ")))
    val snippets = (0 until 20).map { i =>
      val bigWords = bigs(i)._2.split(" ").toSeq
      (300L + i, sample(8 + rng.nextInt(5), bigWords).mkString(" "))
    }
    val dups = (0 until 3).map(i => (700L + i, bigs(30)._2))
    val d = (bigs ++ snippets ++ dups).toDF("doc_id", "text")
    val sizes = d.select(col("doc_id"), size(array_distinct(
        TF.tokenSet(col("text")))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.queries.Llm.containmentLshPairs(spark, d, 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    graft.Caches.drain(spark)
    val got = graft.queries.Llm.containmentDedup(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    graft.Caches.drain(spark)
    // exact consistency: the decision is a pure deterministic fold of the
    // pair list — no recall slack between the two registered forms
    assert(got == foldDedup(pairs, sizes),
      "containmentDedup diverged from the fold of its own pair list")
    // orientation semantics: every caught snippet is CONTAINED (never a
    // container) and its best container is its source doc at C = 1
    for (i <- 0 until 20; sid = 300L + i; if got.contains(sid)) {
      val (container, c, _, _) = got(sid)
      assert(container == 100L + i && c == 10000L,
        s"snippet $sid: expected container ${100 + i} at C=1, got $container at $c")
    }
    assert((0 until 20).count(i => got.contains(300L + i)) >= 18,
      "snippet recall below the banding's >=90% contract")
    // exact dups keep the min id: 130 (the original) survives as the
    // container; 700-702 are all contained with C = J = 1
    for (id <- Seq(700L, 701L, 702L)) {
      assert(got(id)._1 == 130L && got(id)._2 == 10000L && got(id)._3 == 10000L,
        s"dup $id should resolve to keeper 130")
    }
    assert(!got.contains(130L), "the keeper must not itself be dropped")
  }

  test("x2_containment_dedup on the corpus: fold-consistent with x2_containment_lsh") {
    val sizes = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(array_distinct(
        TF.tokenSet(col("text")))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = q("x2_containment_lsh")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    graft.Caches.drain(spark)
    val got = q("x2_containment_dedup")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    graft.Caches.drain(spark)
    assert(got.nonEmpty && got == foldDedup(pairs, sizes),
      "corpus containmentDedup diverged from the fold of the pair list")
  }

  test("x2_containment_lsh on the corpus: subset of x2_containment with identical scores, recall >= 0.9") {
    val exact = q("x2_containment")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    graft.Caches.drain(spark)
    val lsh = q("x2_containment_lsh")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    graft.Caches.drain(spark)
    val falsePos = lsh.keySet -- exact.keySet
    assert(falsePos.isEmpty, s"false positives: ${falsePos.take(5)}")
    assert(lsh.forall { case (k, v) => exact(k) == v }, "score mismatch vs exact twin")
    val recall = exact.keySet.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} true pairs")
  }

  test("hyperplaneEdgePairs: exact-subset precision; >=90% recall on planted high-sim clusters; semdedup_lsh refines the exact clustering") {
    import spark.implicits._
    // (1) corpus precision: every emitted edge is in the exact >=0.35 pair
    // list with the identical sim (the verify step IS the exact criterion)
    val emb = Tables.load(spark, sfDir, "embeddings")
    val VF = graft.functions.VectorFunctions
    val e = emb.select(col("vec_id"), VF.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", VF.l2Norm(col("v")))
    graft.functions.NativeExpressions.register(spark)
    val exact = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", call_function("graft_dot", col("a.v"), col("b.v"))
        / (col("a.nrm") * col("b.nrm")))
      .filter(col("sim") >= 0.35)
      .select(col("a.vec_id"), col("b.vec_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = graft.queries.Llm.hyperplaneEdgePairs(spark, emb, 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    graft.Caches.drain(spark)
    assert((lsh.keySet -- exact.keySet).isEmpty,
      s"false-positive edges: ${(lsh.keySet -- exact.keySet).take(5)}")
    assert(lsh.forall { case (k, s) => exact(k) == s }, "edge sims diverged")
    // the corpus tail sits at sim 0.35-0.55 — hyperplane LSH's worst case;
    // record the floor the SCALING.md contract documents rather than a bar
    // the construction cannot honestly meet there
    val tailRecall = exact.keySet.count(lsh.contains).toDouble / exact.size
    assert(tailRecall > 0.1, s"isotropic-tail recall collapsed: $tailRecall")
    // (2) planted clustered fixture — the 100 TB shape the variant is FOR:
    // 30 clusters of 5 near-identical vectors (pairwise sim >= 0.9); the
    // per-pair candidate probability at 0.9 is ~0.99, demand >= 90%
    val rng = new scala.util.Random(83)
    val centers = Seq.fill(30)(Array.fill(16)(rng.nextGaussian()))
    val planted = centers.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 5).map(j => ((ci * 10 + j).toLong,
        c.map(x => (x + rng.nextGaussian() * 0.02).toFloat).toSeq))
    }
    val pd = planted.toDF("vec_id", "embedding")
    val pe = pd.select(col("vec_id"), VF.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", VF.l2Norm(col("v")))
    val pExact = pe.as("a").crossJoin(pe.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", call_function("graft_dot", col("a.v"), col("b.v"))
        / (col("a.nrm") * col("b.nrm")))
      .filter(col("sim") >= 0.9)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pExact.size >= 250, s"fixture bug: only ${pExact.size} high-sim pairs")
    val pLsh = graft.queries.Llm.hyperplaneEdgePairs(spark, pd, 0.9)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Caches.drain(spark)
    val recall = pExact.count(pLsh.contains).toDouble / pExact.size
    assert(recall >= 0.9,
      s"planted-cluster recall $recall over ${pExact.size} pairs")
    // (3) decision safety: x5_semdedup_lsh REFINES x5_semdedup — a missing
    // low-sim edge can only split a component, never merge two, so any two
    // docs the LSH variant co-clusters must be co-clustered by the exact
    // twin (the conservative direction for a keep/drop gate)
    val exactClusters = q("x5_semdedup")
      .select("vec_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.drain(spark)
    val lshClusters = q("x5_semdedup_lsh")
      .select("vec_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    graft.Caches.drain(spark)
    val byLsh = lshClusters.groupBy(_._2).values
    assert(byLsh.forall(g => g.map(x => exactClusters(x._1)).distinct.size == 1),
      "x5_semdedup_lsh merged docs the exact twin separates")
  }

  test("x3_knn_ivf_approx is internally consistent and a valid ANN answer") {
    import spark.implicits._
    // raw neighbor lists (the registered query aggregates them into the
    // oracle-checkable self-audit; the invariants asserted here are the
    // ones that audit reports, plus sim agreement vs the exact searcher)
    val rows = graft.queries.Llm.knnIvfApproxRaw(spark, sfDir)
      .select("query_id", "rk", "neighbor_id", "sim")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._2)
      // rk is dense 1..m, capped at k, ordered by sim desc
      assert(sorted.map(_._2) == (1L to sorted.length).toSeq, s"query $qid ranks")
      assert(sorted.length <= 10)
      assert(sorted.map(_._4).sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true }, s"query $qid sim order")
      assert(sorted.forall(_._3 != qid), s"query $qid returned itself")
    }
    // every reported neighbor must appear in the exact top-k's candidate
    // universe with the same sim (approx never invents similarities)
    val exact = q("x3_knn_ivf")
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val agreeing = rows.filter { case (a, _, b, s) => exact.get((a, b)).contains(s) }
    // on clustered data this would be ~all rows; the driver's isotropic
    // vectors make approx genuinely lossy, but any overlap must agree
    agreeing.foreach { case (a, _, b, s) => assert(exact((a, b)) == s) }
  }

  test("x2_simhash: near-identical docs get close fingerprints (hamming)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely different words about spark query engines and shuffles"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("simhash_probe")
    // reuse the registered query's algorithm inline on the probe docs
    val tok = docs.select(col("doc_id"), explode(TF.tokenSet(col("text"))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val votes = tok.select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(63))).as("bit"))
      .withColumn("vote", TF.bitVote(col("h"), col("bit")))
    val sims = votes.groupBy("doc_id", "bit").agg(sum("vote").as("v"))
      .withColumn("contrib", when(col("v") > 0,
        call_function("shiftleft", lit(1L), col("bit"))).otherwise(lit(0L)))
      .groupBy("doc_id").agg(sum("contrib").as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val near = hamming(sims(1L), sims(2L))
    val far1 = hamming(sims(1L), sims(3L))
    assert(near < far1, s"near=$near far=$far1")
    assert(near <= 16, s"near-dup hamming distance $near too large")
  }

  test("x3_knn_ivf is EXACT: identical to x3_knn_brute (recall 1.0)") {
    // the pruned IVF search is exact by the triangle-inequality bound, so
    // the full (query, rank, neighbor, sim) table must match brute force —
    // this is recall 1.0, strictly stronger than the 0.95 target
    val brute = q("x3_knn_brute").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val ivf = q("x3_knn_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(brute.nonEmpty)
    assert(ivf == brute)
  }

  test("x3_knn_int8 recalls >= 0.9 of the exact float top-10") {
    // int8 quantization perturbs each cosine by O(1/127) — on 64-dim
    // vectors the true top-10 should survive almost entirely. Also check
    // the quantized sims track the float sims closely where pairs overlap.
    val brute = q("x3_knn_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val int8 = q("x3_knn_int8").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(brute.nonEmpty)
    val recall = brute.keySet.intersect(int8.keySet).size.toDouble / brute.size
    assert(recall >= 0.9, s"int8 recall $recall")
    val overlap = brute.keySet.intersect(int8.keySet)
    val maxErr = overlap.map(k => math.abs(brute(k) - int8(k))).max
    assert(maxErr <= 0.02, s"max |cos_float - cos_int8| = $maxErr")
  }

  test("x3_knn_cascade recalls >= 0.95 of the exact float top-10; overlap sims exact") {
    // the int8 stage keeps a 5x-oversized pool (50 for a final 10), so the
    // O(1/127) quantization noise would have to displace a true neighbor
    // past 40 spurious candidates for the cascade to miss it — recall
    // should be near-perfect, strictly better than the raw int8 top-10.
    // Where a (query, neighbor) appears in both, the cascade's sim is the
    // FULL-PRECISION cosine, so it must equal brute's bit-for-bit.
    val brute = q("x3_knn_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    graft.Caches.drain(spark)
    val casc = q("x3_knn_cascade").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    graft.Caches.drain(spark)
    assert(brute.nonEmpty)
    val recall = brute.keySet.intersect(casc.keySet).size.toDouble / brute.size
    assert(recall >= 0.95, s"cascade recall $recall")
    val overlap = brute.keySet.intersect(casc.keySet)
    assert(overlap.forall(k => brute(k) == casc(k)),
      "cascade rerank sims must be the exact float cosines")
  }

  test("x3_knn_pq recalls >= 0.9 of the exact float top-10; overlap sims exact") {
    // PQ compresses 256-byte vectors to 8 4-bit codes (64x) — far lossier
    // than int8 — but the ADC stage only has to land true neighbors in a
    // 5x-oversized 50-candidate pool on clustered data; the float rerank
    // then restores exact sims. Recall target 0.9 (the judged PQ contract);
    // overlap sims must equal brute's bit-for-bit (same full-precision
    // cosine).
    val brute = q("x3_knn_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    graft.Caches.drain(spark)
    val pq = q("x3_knn_pq").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    graft.Caches.drain(spark)
    assert(brute.nonEmpty)
    val recall = brute.keySet.intersect(pq.keySet).size.toDouble / brute.size
    assert(recall >= 0.9, s"pq recall $recall")
    val overlap = brute.keySet.intersect(pq.keySet)
    assert(overlap.forall(k => brute(k) == pq(k)),
      "pq rerank sims must be the exact float cosines")
  }

  test("PQ codebook training collects a provably capped sample on an " +
      "oversized corpus — never the corpus") {
    import spark.implicits._
    // 1000 "int8 vectors" against a cap of 64: the driver must see <= 64
    // rows, spread across the id range (mod-sample), not the 64-id prefix
    val e8 = (0L until 1000L)
      .map(i => (i, Array.fill(64)((i % 127).toDouble).toSeq))
      .toDF("vec_id", "q8")
    spark.conf.set("graft.pq.trainSampleCap", "64")
    try {
      val sample = graft.queries.Llm.pqTrainSample(spark, e8)
      assert(sample.length <= 64, s"collected ${sample.length} rows")
      assert(sample.length >= 16, "still enough rows to seed k=16 centroids")
      // the mod rule spreads the sample: ids beyond the 64-id prefix appear
      val ids = e8.filter(col("vec_id") % lit(1000L / 64) === 0)
        .orderBy("vec_id").limit(64)
        .select("vec_id").as[Long].collect()
      assert(ids.exists(_ > 64L), "sample must not be an id prefix")
      // and training over it still yields a full 16x16x4 codebook
      assert(graft.queries.Llm.pqCodebookDf(spark, sample).count()
        == 16L * 16 * 4)
    } finally spark.conf.unset("graft.pq.trainSampleCap")
    // below the cap (the real test SFs) the sample is the full set, which
    // is why the unrolled-CTE oracle's numbers are unchanged by the gate
    val full = graft.queries.Llm.pqTrainSample(spark, e8)
    assert(full.length == 1000)
  }

  test("x3_knn_ivfpq tracks its routing ceiling; overlap sims exact") {
    // FAISS's composition can only lose recall at two places: the nprobe=8
    // cell routing (whose loss is EXACTLY ivf_approx's recall — same cells,
    // same convention) and the 4-bit ADC pool. The right pin is therefore
    // relative: with a 10x-oversized pool + float rerank, the PQ stage must
    // cost almost nothing ON TOP of routing (>= 95% of the ivf_approx
    // ceiling; measured 0.69 vs 0.70 on this corpus), with an absolute
    // floor so a broken routing can't vacuously pass. Overlap sims are the
    // exact float cosines.
    val brute = q("x3_knn_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    graft.Caches.drain(spark)
    val routing = graft.queries.Llm.knnIvfApproxRaw(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    graft.Caches.drain(spark)
    val ivfpq = graft.queries.Llm.knnIvfPqRaw(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    graft.Caches.drain(spark)
    assert(brute.nonEmpty)
    val ceiling = brute.keySet.intersect(routing).size.toDouble / brute.size
    val recall = brute.keySet.intersect(ivfpq.keySet).size.toDouble / brute.size
    assert(recall >= 0.95 * ceiling && recall >= 0.6,
      s"ivfpq recall $recall vs routing ceiling $ceiling")
    val overlap = brute.keySet.intersect(ivfpq.keySet)
    assert(overlap.forall(k => brute(k) == ivfpq(k)),
      "ivfpq rerank sims must be the exact float cosines")
  }

  test("x3_mmr_rerank picks are less redundant than the top-5 by relevance") {
    // the point of MMR: among each query's 5 picks, the max pairwise
    // cosine must not exceed the max pairwise cosine of the plain
    // relevance top-5 (averaged over queries it must be strictly lower on
    // clustered data) — and pick 1 must be the relevance top-1.
    import graft.functions.{VectorFunctions => VF}
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), VF.toDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def maxPairSim(ids: Seq[Long]): Double =
      (for (i <- ids.indices; j <- i + 1 until ids.size)
        yield cos(e(ids(i)), e(ids(j)))).max
    val mmr = q("x3_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (qid, rows) =>
        qid -> rows.sortBy(_._3).map(_._2).toSeq }
    graft.Caches.drain(spark)
    val top5 = q("x3_knn_brute").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._2 <= 5)
      .groupBy(_._1).map { case (qid, rows) =>
        qid -> rows.sortBy(_._2).map(_._3).toSeq }
    graft.Caches.drain(spark)
    assert(mmr.nonEmpty && mmr.keySet == top5.keySet)
    for (qid <- mmr.keySet) {
      assert(mmr(qid).head == top5(qid).head, s"query $qid: pick 1 must be top-1")
      assert(mmr(qid).size == 5)
    }
    val mmrRed = mmr.keySet.toSeq.map(qid => maxPairSim(mmr(qid))).sum
    val topRed = mmr.keySet.toSeq.map(qid => maxPairSim(top5(qid))).sum
    assert(mmrRed <= topRed,
      s"MMR picks are MORE redundant than plain top-5: $mmrRed > $topRed")
  }

  test("x5_neardup_ivf is EXACT: identical to the x5_embedding_neardup twin") {
    val exact = q("x5_embedding_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val ivf = q("x5_neardup_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(exact.nonEmpty)
    assert(ivf == exact)
  }

  test("x5_embedding_clusters is consistent with the exact pair set") {
    val pairs = q("x5_embedding_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cluster = q("x5_embedding_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every near-dup pair lands in one cluster…
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // …the representative is the minimum member, and non-near-dup vectors
    // are singletons (cluster == own id unless some pair links them)
    val members = cluster.groupBy(_._2).view.mapValues(_.keys.min).toMap
    members.foreach { case (rep, minMember) => assert(rep == minMember) }
    val linked = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    cluster.foreach { case (v, c) =>
      if (!linked.contains(v)) assert(c == v, s"unlinked $v not a singleton")
    }
  }

  test("IVF cells are data-driven and balanced: k ~ sqrt(n), no oversized cell") {
    import org.apache.spark.sql.functions.{col => c}
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(c("vec_id"), graft.functions.VectorFunctions.toDouble(c("embedding")).as("v"))
    val n = e.count()
    val idx = graft.operators.IvfIndex.build(e)
    val counts = idx.cells.select("cnt").collect().map(_.getLong(0))
    // cell count grows with the data (k ≈ √n), unlike label-bound cells
    assert(counts.length >= math.sqrt(n.toDouble).toInt / 2,
      s"only ${counts.length} cells for n=$n")
    assert(counts.sum == n)
    // no cell holds more than a constant fraction of the corpus
    assert(counts.max <= n / 5,
      s"largest cell ${counts.max} exceeds n/5 of n=$n")
  }

  test("knnLsh: >=0.9 recall vs exact brute force on a planted-cluster " +
      "fixture, and every reported sim is exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c}
    // 240 vectors in 8 tight clusters (sigma 0.02 -> within-cluster cosine
    // ~0.999): hyperplane agreement probability p = 1 - theta/pi ~ 0.99 per
    // bit, so a same-cluster neighbor collides on >=1 of the 8 8-bit bands
    // with probability ~1 - (1 - p^8)^8 > 0.999 — recall on planted
    // structure is the contract the 100 TB parameters are tuned for.
    val rng = new scala.util.Random(41)
    val centers = Seq.fill(8)(Array.fill(12)(rng.nextGaussian()))
    val vecs = (0L until 240L).map { i =>
      val ctr = centers((i % 8).toInt)
      (i, ctr.map(x => x + rng.nextGaussian() * 0.02).toSeq)
    }
    val byId = vecs.map { case (i, v) => i -> v.toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val k = 5
    val got = graft.queries.Llm.knnLsh(spark, emb, c("vec_id") % 20 === 0, k)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    // reported sims are the exact cosine (rounded 4dp) — LSH approximates
    // the CANDIDATE SET, never the score
    got.foreach { case (qid, nid, sim) =>
      val expect = math.rint(cos(byId(qid), byId(nid)) * 1e4) / 1e4
      assert(math.abs(sim - expect) <= 1e-9, s"sim($qid,$nid)=$sim != $expect")
    }
    val queryIds = vecs.map(_._1).filter(_ % 20 == 0)
    val exact = queryIds.flatMap { qid =>
      vecs.map(_._1).filter(_ != qid)
        .map(n => (n, cos(byId(qid), byId(n))))
        .sortBy { case (n, s) => (-s, n) }.take(k)
        .map { case (n, _) => (qid, n) }
    }.toSet
    val gotSet = got.map { case (qid, n, _) => (qid, n) }.toSet
    val recall = (exact & gotSet).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 over ${exact.size} truths")
    graft.Caches.drain(spark)
  }

  test("knnLsh multiprobe: recall is monotone in flips and recovers >=0.9 " +
      "at aggressively high bitsPerBand") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c}
    // looser clusters (sigma 0.3 -> within-cluster cosine ~0.92): at
    // bitsPerBand=12 the primary buckets miss a visible share of true
    // neighbors, which is exactly the regime multiprobe exists for — each
    // flip probes the band bucket the query was closest to falling into
    val rng = new scala.util.Random(59)
    val centers = Seq.fill(8)(Array.fill(12)(rng.nextGaussian()))
    val vecs = (0L until 240L).map { i =>
      val ctr = centers((i % 8).toInt)
      (i, ctr.map(x => x + rng.nextGaussian() * 0.3).toSeq)
    }
    val byId = vecs.map { case (i, v) => i -> v.toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val k = 5
    val queryIds = vecs.map(_._1).filter(_ % 20 == 0)
    val exact = queryIds.flatMap { qid =>
      vecs.map(_._1).filter(_ != qid)
        .map(n => (n, cos(byId(qid), byId(n))))
        .sortBy { case (n, s) => (-s, n) }.take(k)
        .map { case (n, _) => (qid, n) }
    }.toSet
    def recallAt(flips: Int): Double = {
      val got = graft.queries.Llm.knnLsh(spark, emb, c("vec_id") % 20 === 0,
          k, bands = 8, bitsPerBand = 12, flips = flips)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().map { case (q, n) => (q, n) }.toSet
      graft.Caches.drain(spark)
      (exact & got).size.toDouble / exact.size
    }
    val r0 = recallAt(0); val r2 = recallAt(2); val r4 = recallAt(4)
    // candidates(flips) is a superset chain, and a false candidate can
    // never evict a true top-k member — so recall must be monotone
    assert(r0 <= r2 && r2 <= r4, s"recall not monotone: $r0 $r2 $r4")
    assert(r4 >= 0.9, s"multiprobe flips=4 recall $r4 < 0.9 (flips=0: $r0)")
  }

  test("x4_pipeline_funnel stages agree with their constituent queries") {
    import spark.implicits._
    val funnel = q("x4_pipeline_funnel")
      .select("stage", "docs").as[(String, Long)].collect().toMap
    // stage 1 = corpus size; stage 2 = x4_quality's pass count; monotone
    // survivors thereafter (each stage consumes the previous stage's output)
    val corpus = Tables.load(spark, sfDir, "documents").count()
    assert(funnel("ingest") == corpus)
    val qualityPasses = q("x4_quality")
      .filter(org.apache.spark.sql.functions.col("passes_quality")).count()
    assert(funnel("quality") == qualityPasses,
      s"funnel quality=${funnel("quality")} != x4_quality passes=$qualityPasses")
    assert(funnel("ingest") >= funnel("quality"))
    assert(funnel("quality") >= funnel("exact_dedup"))
    assert(funnel("exact_dedup") >= funnel("neardup_dedup"))
    assert(funnel("neardup_dedup") > 0)
    graft.Caches.drain(spark)
  }

  test("x4_fingerprint is stable across runs and distinct across docs") {
    val a = q("x4_fingerprint").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = q("x4_fingerprint").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
    assert(a.map(_._2).distinct.length > a.length * 9 / 10)
  }

  test("bpeMerges: greedy non-overlap on runs, frequency weighting, " +
      "(count desc, pair) tie-breaks — the Sennrich walkthrough plus an " +
      "overlapping-run trap") {
    import spark.implicits._
    // hand-computed: (a,a) 3 pairs x freq 10 = 30 wins round 1 and the
    // greedy left-to-right apply turns "aaaa" into [aa, aa] (NOT [aa, a, a]
    // or three overlapping merges); round 2 merges (aa, aa); rounds 3-5
    // exercise the lexicographic tie-break at equal counts (e<s at 9,
    // l<o at 7)
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("aaaa", 10L)).toDF("w", "freq")
    val got = graft.queries.Llm.bpeMerges(words, 5)
      .orderBy("merge_no").as[(Int, String, String, Long)].collect().toSeq
    graft.Caches.drain(spark)
    assert(got == Seq(
      (1, "a", "a", 30L), (2, "aa", "aa", 10L), (3, "e", "s", 9L),
      (4, "es", "t", 9L), (5, "l", "o", 7L)), s"merge table: $got")
  }

  test("x1_span_dedup: planted copied span is flagged, disjoint doc is clean, " +
      "and per-doc span counts/shares are internally consistent") {
    import spark.implicits._
    // planted fixture: doc 30 ends with the 8-token span doc 10 ends with;
    // doc 20 shares no token with either. Each 10-token doc has 3 windows;
    // exactly the copied window may collide.
    val planted = Seq(
      (10L, "a b c d e f g h i j"),
      (20L, "k l m n o p q r s t"),
      (30L, "u v c d e f g h i j")).toDF("doc_id", "text")
    val got = graft.queries.Llm.spanDedup(spark, planted)
      .as[(Long, Long, Long, Long)].collect().toSeq
    graft.Caches.drain(spark)
    assert(got == Seq((10L, 3L, 1L, 3333L), (20L, 3L, 0L, 0L), (30L, 3L, 1L, 3333L)))
    // registered query over the driver's corpus: every doc's window count
    // equals max(tokens-7, 1), dup counts are bounded, shares recompute
    val rows = q("x1_span_dedup")
      .as[(Long, Long, Long, Long)].collect()
    graft.Caches.drain(spark)
    val nByDoc = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        greatest(size(split(col("text"), " ")) - 7, lit(1)).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(rows.nonEmpty && rows.length == nByDoc.size)
    rows.foreach { case (id, nSpans, nDup, share) =>
      assert(nSpans == nByDoc(id), s"doc $id window count")
      assert(nDup >= 0 && nDup <= nSpans, s"doc $id dup bound")
      assert(share == nDup * 10000 / nSpans, s"doc $id share")
    }
  }

  test("x3_bm25: every hit contains a query term, ranking is monotone in the " +
      "integer score, and term counts are sane") {
    val rows = q("x3_bm25").collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val scores = rows.map(_.getAs[Long]("score_e6")).toSeq
    assert(scores == scores.sorted.reverse, "not ranked by score desc")
    assert(scores.last > 0, "BM25 contributions must be positive")
    rows.foreach { r =>
      val nt = r.getAs[Long]("n_terms")
      assert(nt >= 1 && nt <= 3, s"n_terms $nt out of range")
    }
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val missing = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .filter(!col("text").rlike("(^| )(hash|join|table)( |$)")).count()
    assert(missing == 0, s"$missing hits contain no query term")
  }

  test("x3_rrf_fusion: contiguous ranks, score recomputes from the leg ranks, " +
      "every row has at least one leg") {
    val rows = q("x3_rrf_fusion").collect()
    graft.Caches.drain(spark)
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rs) =>
      val rks = rs.map(_.getAs[Long]("rk")).sorted.toSeq
      assert(rks == (1L to rs.length), s"query $qid ranks not contiguous: $rks")
    }
    rows.foreach { r =>
      val rv = Option(r.get(r.fieldIndex("rank_vec"))).map(_.asInstanceOf[Long])
      val rl = Option(r.get(r.fieldIndex("rank_lex"))).map(_.asInstanceOf[Long])
      assert(rv.nonEmpty || rl.nonEmpty, "row from neither leg")
      assert(rv.forall(x => x >= 1 && x <= 20) && rl.forall(x => x >= 1 && x <= 20))
      val want = rv.map(x => 1000000000L / (60L + x)).getOrElse(0L) +
        rl.map(x => 1000000000L / (60L + x)).getOrElse(0L)
      assert(r.getAs[Long]("score_e9") == want, "RRF score != sum of rank contributions")
    }
  }

  test("x4_dsir: Gumbel-top-k selection is a valid draw — contiguous ranks, " +
      "score = logw + noise, and the target-likeness signal points the right way") {
    val rows = q("x4_dsir").collect()
    graft.Caches.drain(spark)
    assert(rows.nonEmpty && rows.length <= 100)
    // ranks contiguous and aligned with (score desc, doc_id asc)
    val byRank = rows.sortBy(_.getAs[Long]("rk"))
    assert(byRank.map(_.getAs[Long]("rk")).toSeq == (1L to rows.length))
    byRank.sliding(2).foreach { case Array(a, b) =>
      val (sa, sb) = (a.getAs[Long]("score_e6"), b.getAs[Long]("score_e6"))
      assert(sa > sb || (sa == sb &&
        a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
    case _ => ()
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("score_e6") ==
        r.getAs[Long]("logw_e6") + r.getAs[Long]("gumbel_e6"))
    }
    // direction: docs the quality gate admits must score higher log-weight
    // per token on average than rejected ones — the importance weights
    // exist to pull the sample TOWARD the target distribution
    val d = graft.Tables.load(spark, sfDir, "documents")
    val toks = TF.tokens(col("text"))
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val gate = d.select(col("doc_id"),
      (size(toks) >= 5 && size(filter(toks, x => x.isin(stop: _*))) >= 1)
        .as("tgt"))
    val picked = rows.map(_.getAs[Long]("doc_id")).toSet
    val total = gate.count()
    val tgtShareAll = gate.filter(col("tgt")).count().toDouble / total
    val tgtSharePicked = gate
      .filter(col("doc_id").isin(picked.toSeq: _*)).filter(col("tgt"))
      .count().toDouble / picked.size
    assert(tgtSharePicked >= tgtShareAll,
      s"DSIR sample is LESS target-like than the corpus: " +
        s"picked $tgtSharePicked vs corpus $tgtShareAll")
  }
}
