package graft

import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** ANN quality: learned-IVF and multi-probe LSH must beat single-bucket LSH
  * recall against the brute-force ground truth, deterministically. */
class AnnSpec extends SparkSpec {

  private lazy val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
  private lazy val q = e.filter(col("vec_id") < 20)

  private def recall(got: org.apache.spark.sql.DataFrame,
                     truth: org.apache.spark.sql.DataFrame): Double = {
    val hits = got.join(truth, Seq("q_id", "vec_id")).count().toDouble
    hits / truth.count()
  }

  test("PQ codes are in range and ADC search recovers most true neighbours") {
    val small = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // cosine metric → L2-normalize, then ADC's L2 ranking = cosine ranking
    val norm = small.select(col("vec_id"),
      Similarity.l2Normalize(Similarity.asDouble("embedding")).as("nv"))
    val qs = norm.filter(col("vec_id") < 10)
    val cb = Similarity.pqTrain(norm, "nv", m = 16, ksub = 16)
    assert(cb.length == 16 && cb.forall(_.length == 16))

    val codes = Similarity.pqEncode(norm, "vec_id", "nv", cb).cache()
    val bounds = codes.select(
      min(array_min(col("codes"))), max(array_max(col("codes")))).head()
    assert(bounds.getInt(0) >= 0 && bounds.getInt(1) < 16)

    // ADC top-10 vs exact cosine top-10 (cosine is normalization-invariant)
    val truth = Similarity.knnBrute(small,
      small.filter(col("vec_id") < 10), "vec_id", "embedding", 10).cache()
    val got = Similarity.annPq(codes, cb, qs, "vec_id", "nv", 10)
    assert(got.groupBy("q_id").count().collect().forall(_.getLong(1) == 10))
    val rAdc = recall(got, truth)
    assert(rAdc >= 0.3, s"raw ADC recall $rAdc below 0.3")

    // exact re-rank of a 50-deep ADC shortlist: the production recipe —
    // recall must jump well past the raw code scan
    val rr = Similarity.annPqRerank(codes, cb, norm, qs, "vec_id", "nv",
      k = 10, shortlist = 50)
    val rRr = recall(rr, truth)
    assert(rRr >= 0.7, s"PQ+rerank recall $rRr below 0.7")
    assert(rRr >= rAdc, "rerank must not lose recall")
  }

  test("filtered ANN: every hit satisfies the predicate, ranks are dense, " +
       "and recall vs filtered brute-force truth recovers with nProbe") {
    val pred = col("vec_id") % 3 === 0
    // truth = exact top-5 over the predicate-filtered corpus (what a
    // pre-filter brute-force scan would return)
    val truth = Similarity.knnBrute(e.filter(pred), q, "vec_id",
      "embedding", 5).cache()
    def run(nProbe: Int) = Similarity.annIvfFiltered(e, q, "vec_id",
      "embedding", "label", pred, k = 5, nProbe = nProbe).cache()
    val p2 = run(2)
    // invariants: predicate holds on every returned row; per-query ranks
    // are dense 1..k (never post-filtered out of a larger top-k)
    assert(p2.filter(!(col("vec_id") % 3 === 0)).count() == 0)
    val ranks = p2.groupBy("q_id").agg(
      count(lit(1)).as("n"), max("rank").as("mx")).collect()
    assert(ranks.forall(r => r.getLong(1) == r.getInt(2)))
    // recall grows with probe width (filtered cells hold fewer survivors,
    // so filtered search wants MORE probes than unfiltered for the same
    // recall — the adaptive knob the scaladoc documents)
    val r2 = recall(p2, truth)
    val r6 = recall(run(6), truth)
    assert(r6 >= r2, s"recall fell with wider probing ($r2 -> $r6)")
    assert(r6 >= 0.5, s"filtered recall@nProbe=6 $r6 below 0.5")
    // probing every cell = exact filtered brute force (10 labels total)
    val rAll = recall(run(10), truth)
    assert(rAll == 1.0, s"full-probe filtered search must be exact, got $rAll")
  }

  test("annJoin: corpus-wide top-k equals per-query filtered search; " +
       "ranks dense, no self-pairs") {
    val aj = Similarity.annJoin(e, "vec_id", "embedding", "label",
      k = 3, nProbe = 2).cache()
    // every vector is a query and gets a dense 1..n ranking (n ≤ 3)
    assert(aj.filter(col("q_id") === col("vec_id")).count() == 0)
    val perQ = aj.groupBy("q_id").agg(
      count(lit(1)).as("n"), max("rank").as("mx")).collect()
    assert(perQ.length == e.count())
    assert(perQ.forall(r => r.getLong(1) == r.getInt(2) && r.getLong(1) <= 3))
    // the join is the batched form of per-query probed search: restricted
    // to the q<20 query set it must equal annIvfFiltered with a pass-all
    // predicate (same centroids over the full corpus, same routing/ranks)
    val single = Similarity.annIvfFiltered(e, q, "vec_id", "embedding",
      "label", lit(true), k = 3, nProbe = 2)
    val sub = aj.filter(col("q_id") < 20)
    assert(sub.exceptAll(single).isEmpty && single.exceptAll(sub).isEmpty,
      "annJoin(q<20) must equal per-query probed search")
  }

  test("ivfAssign: batch-split assignment equals from-scratch under " +
       "frozen centroids; stored search is split-invariant") {
    val cents = Similarity.ivfCentroids(e, "label", "embedding")
    val full = Similarity.ivfAssign(e, "vec_id", "embedding", cents).cache()
    val split = Similarity
      .ivfAssign(e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
        cents)
      .unionByName(Similarity.ivfAssign(e.filter(col("vec_id") % 3 =!= 0),
        "vec_id", "embedding", cents))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(full) == cells(split),
      "assignment must be independent of batching under frozen centroids")
    val a = Similarity.annIvfStored(full, cents, q, "vec_id", "embedding",
      k = 3, nProbe = 2)
    val b = Similarity.annIvfStored(split, cents, q, "vec_id", "embedding",
      k = 3, nProbe = 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("on-disk IVF index: write + append ≡ from-scratch search (same " +
       "recall, same rows), probe scan carries a cell partition filter, " +
       "drift of an undrifted index is ~0 where members are unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val cents = Similarity.ivfCentroids(e, "label", "embedding")
    Similarity.writeIvfIndex(
      Similarity.ivfAssign(e.filter(col("vec_id") % 4 =!= 0), "vec_id",
        "embedding", cents), cents, dir)
    Similarity.appendIvfBatch(e.filter(col("vec_id") % 4 === 0), "vec_id",
      "embedding", dir)

    // incremental (write + append) ≡ from-scratch: identical result rows
    // → identical recall by construction
    val fromDisk = Similarity.annIvfIndexed(spark, dir, q, "vec_id",
      "embedding", k = 3, nProbe = 2)
    val scratch = Similarity.annIvfStored(
      Similarity.ivfAssign(e, "vec_id", "embedding", cents), cents, q,
      "vec_id", "embedding", k = 3, nProbe = 2)
    assert(fromDisk.count() > 0)
    assert(fromDisk.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(fromDisk).isEmpty,
      "maintained index must search identically to from-scratch")

    // probing is partition pruning: the posting-list scan under an isin
    // cell filter carries PartitionFilters — untouched cells never open
    val (post, _) = Similarity.readIvfIndex(spark, dir)
    val plan = post.filter(col("cell").isInCollection(Seq(0, 1)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)

    // drift semantics on a hand fixture: two orthogonal cells; appending
    // vectors that still route to cell 1 but point elsewhere moves ONLY
    // cell 1's member mean off its frozen centroid
    import spark.implicits._
    def vec(xs: Double*) = xs ++ Seq.fill(8 - xs.length)(0.0)
    val oldRows = Seq(
      (1L, 0, vec(1.0)), (2L, 0, vec(1.0)), (3L, 0, vec(1.0)),
      (4L, 1, vec(0.0, 1.0)), (5L, 1, vec(0.0, 1.0)), (6L, 1, vec(0.0, 1.0)))
      .toDF("vec_id", "label", "embedding")
    val fixedCents = Similarity.ivfCentroids(oldRows, "label", "embedding")
    val drifted = Seq( // cos to c1 = 0.8 > cos to c0 = 0.6: routes to cell 1
      (7L, 1, vec(0.6, 0.8)), (8L, 1, vec(0.6, 0.8)))
      .toDF("vec_id", "label", "embedding")
    val allAssigned = Similarity.ivfAssign(oldRows.unionByName(drifted),
      "vec_id", "embedding", fixedCents)
    val drift = Similarity.ivfCellDrift(allAssigned, fixedCents)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(3)))).toMap
    assert(drift(0) == ((3L, 0.0)), s"cell 0 must not drift: ${drift(0)}")
    // cell 1 mean = (0.24, 0.92, 0, …); cos to (0,1) = 0.92/√0.904
    assert(drift(1)._1 == 5L && math.abs(drift(1)._2 - 0.032383) < 1e-6,
      s"cell 1 drift: ${drift(1)}")

    // a DRAINED cell stays visible (left join from the stored centroids):
    // with cell 0's members gone the report must still emit its row —
    // n_members = 0, NULL cos_sim/drift — not silently drop the one cell
    // state a recluster trigger most needs to see
    val drained = Similarity.ivfCellDrift(
        allAssigned.filter(col("cell") =!= 0), fixedCents)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(drained(0).getLong(1) == 0L && drained(0).isNullAt(2) &&
      drained(0).isNullAt(3), s"drained cell must surface: ${drained(0)}")
    assert(drained(1).getLong(1) == 5L, s"live cell intact: ${drained(1)}")
  }

  test("reclusterIvfIndex: rebuild keeps every vector, refreshes the " +
       "quantizer to the current cell means, and recall does not regress") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfrc").toString
    val cents = Similarity.ivfCentroids(e, "label", "embedding")
    Similarity.writeIvfIndex(
      Similarity.ivfAssign(e.filter(col("vec_id") % 4 =!= 0), "vec_id",
        "embedding", cents), cents, dir)
    Similarity.appendIvfBatch(e.filter(col("vec_id") % 4 === 0), "vec_id",
      "embedding", dir)
    val truth = Similarity.knnBrute(e, q, "vec_id", "embedding", 3)
      .select("q_id", "vec_id").cache()
    val before = recall(Similarity.annIvfIndexed(spark, dir, q, "vec_id",
      "embedding", k = 3, nProbe = 2).select("q_id", "vec_id"), truth)

    Similarity.reclusterIvfIndex(spark, dir)

    // every ingested vector survives the rebuild, exactly once
    val (post, newCents) = Similarity.readIvfIndex(spark, dir)
    assert(post.count() == e.count())
    assert(post.select("vec_id").distinct().count() == e.count())
    // the refreshed quantizer is the current fixed-point cell means: the
    // drift report of the REBUILT index against its own centroids is zero
    // wherever re-assignment didn't move a vector... but globally, every
    // stored centroid must now be a live cell's mean (no stale cells)
    val report = Similarity.ivfCellDrift(post, newCents)
    assert(report.filter(col("n_members") === 0).count() == 0,
      "a rebuilt quantizer must not carry drained cells")
    val after = recall(Similarity.annIvfIndexed(spark, dir, q, "vec_id",
      "embedding", k = 3, nProbe = 2).select("q_id", "vec_id"), truth)
    assert(after >= before,
      s"recall regressed across the rebuild: $before -> $after")
    truth.unpersist()

    // the trigger arms on this layout: an impossible threshold leaves the
    // freshly rebuilt index untouched; a certain one rebuilds again
    val centsBefore = Similarity.readIvfIndex(spark, dir)._2
      .collect().map(_.toString).sorted.toSeq
    assert(!Similarity.reclusterIvfIndexIfDrifted(spark, dir,
      maxDrift = 10.0))
    assert(Similarity.readIvfIndex(spark, dir)._2
      .collect().map(_.toString).sorted.toSeq == centsBefore,
      "below threshold the stored quantizer must not move")
    assert(Similarity.reclusterIvfIndexIfDrifted(spark, dir,
      maxDrift = -1.0))
  }

  test("rankingMetrics: hand recall/MRR/nDCG battery with partial, " +
       "perfect, and missed queries") {
    import spark.implicits._
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (3L, 30L, 1)).toDF("q_id", "vec_id", "rank")
    val res = Seq((1L, 11L, 1), (1L, 99L, 2), (1L, 10L, 3),
      (2L, 20L, 1), (3L, 31L, 1), (3L, 32L, 2)).toDF("q_id", "vec_id", "rank")
    val got = Similarity.rankingMetrics(res, truth, k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    def q6(v: Double) = BigDecimal(v).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // q1: hits {11@1, 10@3} of 3 truths → recall 2/3, mrr 1,
    // dcg = 1 + 1/log2(4), idcg = 1 + 1/log2(3) + 1/log2(4)
    val r1 = got(1L)
    assert(r1.getLong(2) == 2L && r1.getDouble(3) == q6(2.0 / 3))
    assert(r1.getDouble(4) == 1.0)
    val idcg1 = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    assert(math.abs(r1.getDouble(5) - 1.5 / idcg1) < 2e-6)
    // q2: perfect single-item query
    assert(got(2L).getDouble(3) == 1.0 && got(2L).getDouble(4) == 1.0 &&
      got(2L).getDouble(5) == 1.0)
    // q3: answered but fully missed
    assert(got(3L).getLong(2) == 0L && got(3L).getDouble(3) == 0.0 &&
      got(3L).getDouble(4) == 0.0 && got(3L).getDouble(5) == 0.0)
    // macro averages over the 3 queries
    assert(math.abs(got(1L).getDouble(6) - q6((2.0 / 3 + 1 + 0) / 3)) < 2e-6)
    assert(got(1L).getDouble(7) == q6(2.0 / 3))
  }

  test("semDedupPairs: canonical (dup > keep) pairs, threshold respected, " +
       "mutual discovery collapses to one row") {
    val pairs = Similarity.semDedupPairs(e, "vec_id", "embedding", "label",
      k = 5, nProbe = 2, minSim = 0.35).cache()
    val rows = pairs.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) > r.getLong(1)),
      "pairs must be canonicalized dup_id > keep_id")
    assert(rows.forall(_.getDouble(2) >= 0.35))
    // no duplicate unordered pairs survive the distinct
    assert(pairs.groupBy("dup_id", "keep_id").count()
      .filter(col("count") > 1).count() == 0)
    // consistency with the underlying join: every pair appears there with
    // the same sim from at least one direction
    val aj = Similarity.annJoin(e, "vec_id", "embedding", "label",
      k = 5, nProbe = 2).filter(col("sim") >= 0.35)
      .select(greatest(col("q_id"), col("vec_id")).as("dup_id"),
        least(col("q_id"), col("vec_id")).as("keep_id"), col("sim"))
      .distinct()
    assert(pairs.exceptAll(aj).isEmpty && aj.exceptAll(pairs).isEmpty)
  }

  test("filtered ANN: a hyper-selective predicate routes to the brute " +
       "path — exact results even with nProbe = 1") {
    // ~0.1%-selectivity predicate: survivors <= k * nCells, so the
    // operator must drop to knnBrute over the filtered corpus instead of
    // probing cells. With nProbe = 1 the probed path would miss survivors
    // in unprobed cells (recall < 1); the fallback is EXACT regardless.
    val pred = col("vec_id") % 701 === 0
    val nSurv = e.filter(pred).count()
    val nCells = e.select("label").distinct().count()
    assert(nSurv > 0 && nSurv <= 3 * nCells,
      s"fixture drift: $nSurv survivors vs ${3 * nCells} threshold")
    val got = Similarity.annIvfFiltered(e, q, "vec_id", "embedding",
      "label", pred, k = 3, nProbe = 1).cache()
    val brute = Similarity.knnBrute(e.filter(pred), q, "vec_id",
      "embedding", 3).cache()
    assert(got.count() == brute.count())
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
      "fallback results must equal the exact filtered brute force")
    // and the moderately-selective fixture above must NOT have fallen
    // back: with nProbe = 1 its recall is < 1 (cells were really probed)
    val probed = Similarity.annIvfFiltered(e, q, "vec_id", "embedding",
      "label", col("vec_id") % 3 === 0, k = 5, nProbe = 1)
    val truth = Similarity.knnBrute(e.filter(col("vec_id") % 3 === 0), q,
      "vec_id", "embedding", 5).cache()
    assert(recall(probed, truth) < 1.0,
      "1/3-selectivity predicate unexpectedly took the brute path")
  }

  test("graph ANN: beam search beats single-bucket LSH and its own " +
       "entry-point baseline; reruns are identical") {
    // This corpus is structureless by construction (same-label vectors are
    // no more similar than cross-label — near-random 64-dim, the known
    // worst case for navigable graphs), so absolute recall is data-limited
    // for the whole ANN family; the meaningful checks are RELATIVE.
    // Measured here: brute=1.0, graph=0.34, multi-probe=0.30, LSH=0.06.
    val qs = e.filter(col("vec_id") < 10)
    val truth = Similarity.knnBrute(e, qs, "vec_id", "embedding", 5).cache()
    val got = Similarity.annGraph(e, qs, "vec_id", "embedding", dim = 64,
      k = 5).cache()
    // every query comes back fully ranked
    assert(got.groupBy("q_id").count().collect().forall(_.getLong(1) == 5))
    val r = recall(got, truth)
    assert(r >= 0.25, s"graph-ANN recall $r below 0.25")
    val rLsh = recall(
      Similarity.annLsh(e, qs, "vec_id", "embedding", 5, 8, 64), truth)
    assert(r > rLsh, s"graph-ANN $r did not beat single-bucket LSH $rLsh")
    // the search must actually navigate: round-0 entry scoring alone (the
    // same hub entries, no graph expansion) is a much weaker answer
    val entryOnly = Similarity.annGraph(e, qs, "vec_id", "embedding",
      dim = 64, k = 5, rounds = 0)
    assert(recall(entryOnly, truth) < r,
      "beam rounds added nothing over the raw entry points")
    // determinism: a rerun reproduces the identical ranked rows
    val again = Similarity.annGraph(e, qs, "vec_id", "embedding", dim = 64,
      k = 5)
    assert(got.orderBy("q_id", "rank").collect().toSeq ==
      again.orderBy("q_id", "rank").collect().toSeq)
  }

  test("PQ encode is deterministic and reruns reproduce identical codes") {
    val small = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = Similarity.pqTrain(small, "embedding", m = 4, ksub = 8)
    val cb2 = Similarity.pqTrain(small, "embedding", m = 4, ksub = 8)
    assert(cb.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq)
    val a = Similarity.pqEncode(small, "vec_id", "embedding", cb)
      .orderBy("vec_id").collect().map(_.getSeq[Int](1))
    val b = Similarity.pqEncode(small, "vec_id", "embedding", cb)
      .orderBy("vec_id").collect().map(_.getSeq[Int](1))
    assert(a.length == b.length && a.zip(b).forall { case (x, y) => x == y })
  }

  test("pqTrain bound: no-op when n ≤ maxTrain; a real bound is " +
       "deterministic and keeps rerank recall") {
    val small = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val norm = small.select(col("vec_id"),
      Similarity.l2Normalize(Similarity.asDouble("embedding")).as("nv"))
    val n = norm.count().toInt
    // the limit must be a pure no-op when the corpus fits under the bound:
    // default bound (≫ n) and exact-n bound learn bit-identical codebooks
    val cbAll = Similarity.pqTrain(norm, "nv", m = 8, ksub = 16, maxIter = 5)
    val cbExact = Similarity.pqTrain(norm, "nv", m = 8, ksub = 16,
      maxIter = 5, maxTrain = n)
    assert(cbAll.flatten.flatten.toSeq == cbExact.flatten.flatten.toSeq)
    // a genuinely binding sample (n/2) is still deterministic across reruns
    val cbHalf = Similarity.pqTrain(norm, "nv", m = 8, ksub = 16,
      maxIter = 5, maxTrain = n / 2)
    val cbHalf2 = Similarity.pqTrain(norm, "nv", m = 8, ksub = 16,
      maxIter = 5, maxTrain = n / 2)
    assert(cbHalf.flatten.flatten.toSeq == cbHalf2.flatten.flatten.toSeq)
    // ...and codebooks trained on the half-sample still search well: exact
    // rerank of an ADC shortlist recovers most true neighbours
    val qs = norm.filter(col("vec_id") < 10)
    val truth = Similarity.knnBrute(small,
      small.filter(col("vec_id") < 10), "vec_id", "embedding", 10).cache()
    val codes = Similarity.pqEncode(norm, "vec_id", "nv", cbHalf)
    val rr = Similarity.annPqRerank(codes, cbHalf, norm, qs, "vec_id", "nv",
      k = 10, shortlist = 50)
    val r = recall(rr, truth)
    assert(r >= 0.6, s"bounded-train PQ+rerank recall $r below 0.6")
  }

  test("multi-probe LSH recall ≥ single-bucket LSH recall") {
    val truth = Similarity.knnBrute(e, q, "vec_id", "embedding", 5).cache()
    val single = Similarity.annLsh(e, q, "vec_id", "embedding", 5, 8, 64)
    val multi = Similarity.annLshMultiProbe(e, q, "vec_id", "embedding", 5, 8, 64)
    val rs = recall(single, truth); val rm = recall(multi, truth)
    assert(rm >= rs, s"multi-probe $rm < single $rs")
    assert(rm > 0.2, s"multi-probe recall too low: $rm")
  }

  test("learned IVF with multi-cell probing finds most true neighbours") {
    val truth = Similarity.knnBrute(e, q, "vec_id", "embedding", 5).cache()
    val (assigned, centroids) = Similarity.ivfLearned(e, "vec_id", "embedding", nCells = 8)
    assert(assigned.select("cell").distinct().count() == 8)
    val got = Similarity.annIvfLearned(assigned, centroids, q, "vec_id", "embedding",
      k = 5, nProbe = 3)
    val r = recall(got, truth)
    assert(r > 0.4, s"IVF nProbe=3 recall too low: $r")
    // determinism under fixed seed: same cells on re-fit
    val (assigned2, _) = Similarity.ivfLearned(e, "vec_id", "embedding", nCells = 8)
    val diff = assigned.select("vec_id", "cell").except(assigned2.select("vec_id", "cell"))
    assert(diff.count() == 0)
  }

  test("int8 quantization: bounded dequant error, cosine preserved") {
    val qz = Similarity.quantizeInt8(e, "vec_id", "embedding")
      .join(e.select(col("vec_id"), Similarity.asDouble("embedding").as("v")), "vec_id")
      .withColumn("dq", expr("transform(codes, c -> c * mx / 127.0)"))
    // |x - dequant(x)| ≤ mx/254 (half a quantization step), codes in [-127,127]
    val bad = qz.filter(expr(
      "exists(zip_with(v, dq, (x, y) -> abs(x - y) > mx / 254.0 + 1e-12), b -> b)") ||
      expr("exists(codes, c -> abs(c) > 127)"))
    assert(bad.count() == 0)
    // cosine between original and dequantized stays near 1 for every vector
    val minCos = qz
      .withColumn("cos", Similarity.cosineNative(spark, "v", "dq"))
      .agg(min("cos")).head().getDouble(0)
    assert(minCos > 0.995, s"dequantized cosine degraded: $minCos")
  }

  test("semDedupLearned: learned coarse cells hold or improve drop recall " +
       "against brute-force near-dup truth") {
    // truth: every doc with a smaller-id near-dup ANYWHERE in the corpus.
    // Both variants only drop witnessed docs (precision 1 by construction),
    // so drop recall isolates the coarse-clustering quality.
    val base = e.select(col("vec_id"), Similarity.asDouble("embedding").as("v"))
    val truthDocs = base.as("a").join(base.as("b"),
        col("b.vec_id") < col("a.vec_id"))
      .filter(round(Similarity.cosineNative(spark, "a.v", "b.v"), 6) >= 0.35)
      .select(col("a.vec_id")).distinct().cache()
    val nTruth = truthDocs.count().toDouble
    assert(nTruth > 0)
    def dropRecall(r: org.apache.spark.sql.DataFrame): Double =
      r.filter(col("keep") === 0).join(truthDocs, "vec_id").count() / nTruth
    val rFirstN = dropRecall(Similarity.semDedup(e, "vec_id", "embedding", 8, 0.35))
    val rLearned = dropRecall(Similarity.semDedupLearned(e, "vec_id", "embedding", 8, 0.35))
    assert(rLearned >= rFirstN, s"learned $rLearned < first-n $rFirstN")
    assert(rLearned > 0.4, s"learned drop recall too low: $rLearned")
  }

  test("semDedup: planted near-dups pruned, keep rule is exactly min-id-wins") {
    import spark.implicits._
    // 3 orthogonal base directions + planted near-copies of doc 0 and 20
    def vec(weights: (Int, Double)*): Seq[Float] = {
      val m = weights.toMap
      (0 until 64).map(d => m.getOrElse(d, 0.0).toFloat)
    }
    val rows = Seq(
      (0L, vec(0 -> 1.0)), (20L, vec(1 -> 1.0)), (40L, vec(2 -> 1.0)),
      (41L, vec(0 -> 1.0, 5 -> 0.05)), (42L, vec(0 -> 1.0, 6 -> 0.1)), // near-dups of 0
      (43L, vec(1 -> 1.0, 7 -> 0.05)),                                 // near-dup of 20
      (44L, vec(2 -> 1.0, 3 -> 1.0)))  // cluster 40's cell, cos √½ < 0.9 → kept
    val df = rows.toDF("vec_id", "embedding")
    val r = Similarity.semDedup(df, "vec_id", "embedding", 3, 0.9)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getInt(2))).toMap
    // centroids = 3 lowest ids (0, 20, 40); copies land in their base cluster
    assert(r(41L)._1 == 0L && r(42L)._1 == 0L && r(43L)._1 == 20L && r(44L)._1 == 40L)
    // min-id survivors keep, later near-dups drop, distant cluster-mate keeps
    assert(Seq(0L, 20L, 40L, 44L).forall(r(_)._2 == 1))
    assert(Seq(41L, 42L, 43L).forall(r(_)._2 == 0))
    // invariant on real data: every dropped doc has a smaller-id same-cluster
    // neighbour at ≥ minSim; every kept doc has none
    val real = Similarity.semDedup(e, "vec_id", "embedding", 8, 0.35)
    val base = e.select(col("vec_id"), Similarity.asDouble("embedding").as("v"))
    val withV = real.join(base, "vec_id")
    val witness = withV.as("a").join(withV.as("b"),
        col("a.cluster") === col("b.cluster") && col("b.vec_id") < col("a.vec_id"))
      .filter(round(Similarity.cosineNative(spark, "a.v", "b.v"), 6) >= 0.35)
      .select(col("a.vec_id")).distinct().withColumn("has_witness", lit(1))
    val joined = real.join(witness, Seq("vec_id"), "left_outer")
    assert(joined.filter(col("keep") === 1 && col("has_witness") === 1).count() == 0)
    assert(joined.filter(col("keep") === 0 && col("has_witness").isNull).count() == 0)
  }

  test("jlProject: exact hand projection at k=1; JL norm concentration " +
    "at k=16") {
    import spark.implicits._
    // k=1: plane_0 signs from the closed form ((0·131 + d·37) % 7) % 2
    val signs = Similarity.hyperplanes(1, 4).head
    val df = Seq((0L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    val got = Similarity.jlProject(df, "vec_id", "embedding", dim = 4, k = 1)
      .collect().head.getDouble(2)
    val exp = signs.zip(Seq(1.0, 2.0, 3.0, 4.0)).map { case (s, x) => s * x }
      .sum / math.sqrt(1.0)
    assert(got == math.floor(exp * 1e6 + 0.5) / 1e6)
    // JL property: projected squared norms concentrate near the originals
    val e01 = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val proj = Similarity.jlProject(e01, "vec_id", "embedding",
      dim = 64, k = 16)
    val ratios = proj.groupBy("vec_id")
      .agg(sum(col("value") * col("value")).as("pn"))
      .join(e01.select(col("vec_id"),
        expr("aggregate(embedding, cast(0 as double), " +
          "(a, x) -> a + cast(x as double) * cast(x as double))").as("on")),
        Seq("vec_id"))
      .select((col("pn") / col("on")).as("r"))
      .agg(avg(col("r")), min(col("r")), max(col("r"))).head()
    assert(math.abs(ratios.getDouble(0) - 1.0) < 0.15,
      s"mean ratio ${ratios.getDouble(0)}")
    // per-vector tails are chi²₁₆-wide — only the mean concentrates hard
    assert(ratios.getDouble(1) > 0.01 && ratios.getDouble(2) < 10.0,
      s"ratio range [${ratios.getDouble(1)}, ${ratios.getDouble(2)}]")
  }

  test("silhouette: separated clusters score near 1, one mixed blob near 0") {
    import spark.implicits._
    // two tight, well-separated 2-D clusters
    val sep = Seq(
      (0L, Seq(0.0f, 0.0f), 0), (1L, Seq(0.1f, 0.0f), 0),
      (2L, Seq(10.0f, 0.0f), 1), (3L, Seq(10.1f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val s1 = Similarity.silhouette(sep, "vec_id", "embedding", "label",
        dim = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(s1(0) > 0.9 && s1(1) > 0.9)
    // identical distributions under two labels → silhouette ≈ 0 or worse
    val mixed = Seq(
      (0L, Seq(0.0f, 0.0f), 0), (1L, Seq(1.0f, 0.0f), 1),
      (2L, Seq(0.0f, 1.0f), 0), (3L, Seq(1.0f, 1.0f), 1),
      (4L, Seq(0.5f, 0.5f), 0), (5L, Seq(0.5f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val s2 = Similarity.silhouette(mixed, "vec_id", "embedding", "label",
        dim = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(s2(0) < 0.5 && s2(1) < 0.5)
  }

  test("mmrRerank: the redundant near-duplicate of pick 1 is deferred " +
       "behind the diverse candidate; picks are dense 1..k per query") {
    import spark.implicits._
    // query 0 = e1; candidate 1 (a) most similar; 2 (b) nearly collinear
    // with a — heavily penalized after a is picked; 3 (c) moderately
    // similar but diverse: MMR order must be a, c, b
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.8f, 0.6f, 0.0f, 0.0f)),   // sim .8, unit norm
      (2L, Seq(0.79f, 0.61f, 0.0f, 0.0f)), // sim .7915, ~collinear with 1
      (3L, Seq(0.79f, 0.0f, 0.6f, 0.0f)))  // sim .7964, diverse
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(rows, rows.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 3, topN = 3)
      .orderBy("pick").collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 1L), (2, 3L), (3, 2L)), got)
  }

  test("embeddingDrift: identical halves show zero drift, a rotated " +
       "half shows positive drift; cells missing a half are dropped") {
    import spark.implicits._
    val rows = Seq(
      // label "same": both halves centered on e1
      (0L, Seq(1.0f, 0.0f), "same"), (1L, Seq(1.0f, 0.0f), "same"),
      (2L, Seq(1.0f, 0.0f), "same"), (3L, Seq(1.0f, 0.0f), "same"),
      // label "moved": old half on e1, new half on e1+e2
      (10L, Seq(1.0f, 0.0f), "moved"), (12L, Seq(1.0f, 0.0f), "moved"),
      (11L, Seq(1.0f, 1.0f), "moved"), (13L, Seq(1.0f, 1.0f), "moved"),
      // label "halfonly": only even ids → no output row
      (20L, Seq(0.0f, 1.0f), "halfonly"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.embeddingDrift(rows, "label", "embedding",
        col("vec_id") % 2 === 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == Set("same", "moved"), got)
    assert(got("same") == ((2L, 2L, 1.0, 0.0)), got("same"))
    val m = got("moved")
    assert(m._1 == 2L && m._2 == 2L && m._4 > 0.29 && m._4 < 0.3, m)
  }

  test("rrfFuse: consensus docs outrank single-list docs; scores match " +
       "the 1/(k0+rank) closed form; missing entries contribute zero") {
    import spark.implicits._
    val ra = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("q_id", "vec_id", "rank")
    val rb = Seq((0L, 10L, 2), (0L, 12L, 1))
      .toDF("q_id", "vec_id", "rank")
    val got = Similarity.rrfFuse(Seq(ra, rb), k0 = 60, topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    def s(rs: Int*) = BigDecimal(rs.map(r =>
        BigDecimal(1.0 / (60 + r)).setScale(12,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 10: ranks 1+2 → top; 12: ranks 3+1; 11: rank 2 alone → last
    assert(got == Seq((10L, s(1, 2), 1), (12L, s(3, 1), 2),
      (11L, s(2), 3)), got)
  }

  test("annEvalStored: recall degrades under frozen centroids and " +
       "RECOVERS after reclusterIvfIndex (the drift loop's payoff)") {
    import spark.implicits._
    // 2-D fixture: old corpus = a big cluster on e1 (cell 0) plus a tiny
    // seed on e2 (cell 1). The new batch straddles the frozen boundary —
    // half at (.8,.6) assigns to cell 0, half at (.6,.8) to cell 1 — so a
    // query at (.8,.6) with nProbe=1 sees only ONE half of its true
    // neighborhood. One Lloyd refresh pulls the whole batch into one
    // cell (the means shift toward it), and recall recovers.
    val old = ((0L to 19L).map(i => (i, Seq(1.0f, 0.0f), 0)) ++
      Seq((20L, Seq(0.0f, 1.0f), 1), (21L, Seq(0.0f, 1.0f), 1)))
      .toDF("vec_id", "embedding", "label")
    val fresh = ((30L to 35L).map(i => (i, Seq(0.8f, 0.6f))) ++
      (40L to 45L).map(i => (i, Seq(0.6f, 0.8f))))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    val cents = Similarity.ivfCentroids(old, "label", "embedding")
    Similarity.writeIvfIndex(
      Similarity.ivfAssign(old, "vec_id", "embedding", cents), cents,
      s"$dir/idx")
    Similarity.appendIvfBatch(fresh, "vec_id", "embedding", s"$dir/idx")
    val q = Seq((100L, Seq(0.8f, 0.6f))).toDF("vec_id", "embedding")
    def recall(): Double =
      Similarity.annEvalStored(spark, s"$dir/idx", q, "vec_id",
          "embedding", k = 10, nProbe = 1)
        .select("recall").head().getDouble(0)
    // truth top-10 = 6 at (.8,.6) sim 1.0 + 4 at (.6,.8) sim .96; frozen
    // routing reaches cell 0 only (the (.8,.6) half + e1 filler) → 6/10
    val frozen = recall()
    assert(frozen == 0.6, s"frozen recall was $frozen")
    Similarity.reclusterIvfIndex(spark, s"$dir/idx")
    val recovered = recall()
    assert(recovered == 1.0, s"post-recluster recall was $recovered")
  }

  test("quantRecall: quantization-faithful rankings score recall 1 even " +
       "across a large norm spread (per-vector scales)") {
    import spark.implicits._
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.1f, 0.05f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.quantRecall(rows,
        rows.filter(col("vec_id") === 0), "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0L, 2L, 1.0)), got.toSeq)
  }

  test("annIvfIndexedFiltered: the predicate is PUSHED to the stored scan " +
       "and composes with the cell partition filter; results equal the " +
       "in-memory filtered search on the same layout") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.ivfCentroids(e, "label", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivff").toString
    Similarity.writeIvfIndex(
      Similarity.ivfAssign(e, "vec_id", "embedding", cents), cents, dir)
    val q = e.filter(col("vec_id") < 10)
    val pred = col("vec_id") % 3 === 0

    // plan: data filter pushed (PushedFilters on the vec_id predicate is
    // residual-only for %, so assert the Filter sits ON the scan) + cell
    // partition pruning intact on the same scan
    val (post, _) = Similarity.readIvfIndex(spark, dir)
    val plan = post.filter(pred)
      .filter(col("cell").isInCollection(Seq(0, 1)))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters: [cell"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)

    // value: stored filtered search ≡ in-memory filtered ranking over the
    // identical frozen assignment
    val stored = Similarity.annIvfIndexedFiltered(spark, dir, q, "vec_id",
      "embedding", pred, k = 3, nProbe = 2).collect().toSet
    val mem = Similarity.annIvfStored(
      Similarity.ivfAssign(e, "vec_id", "embedding", cents).filter(pred)
        .select(col("vec_id"), col("cell"), col("v")),
      cents, q, "vec_id", "embedding", k = 3, nProbe = 2).collect().toSet
    assert(stored === mem)
    assert(stored.nonEmpty)
  }

  test("annJoinIndexed: the corpus-wide join off the stored index equals " +
       "the in-memory annJoin over the same cells, and excludes " +
       "tombstoned vectors") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_annj").toString
    Similarity.writeIvfIndex(
      e.select(col("vec_id"), Similarity.asDouble("embedding").as("v"),
        col("label").as("cell")),
      Similarity.ivfCentroids(e, "label", "embedding"), dir)
    val mem = Similarity.annJoin(e, "vec_id", "embedding", "label",
      k = 3, nProbe = 2).collect().toSet
    assert(Similarity.annJoinIndexed(spark, dir, k = 3, nProbe = 2)
      .collect().toSet === mem)

    Similarity.deleteFromIvfIndex(
      e.filter(col("vec_id") % 7 === 3).select("vec_id"), dir, 0L)
    val del = e.filter(col("vec_id") % 7 === 3).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val afterDel = Similarity.annJoinIndexed(spark, dir, k = 3, nProbe = 2)
      .collect()
    // deleted vectors appear on NEITHER side of the join
    assert(afterDel.nonEmpty && !afterDel.exists(r =>
      del.contains(r.getLong(0)) || del.contains(r.getLong(1))))
  }

  test("q113 learned-PQ golden: the full train→encode→rerank pipeline is " +
    "value-pinned at sf0.001 (the path the DuckDB oracle cannot replay — " +
    "per-subspace KMeans isn't portable across engines; q113b covers the " +
    "search math with a fixed codebook, this golden covers the learned one)") {
    val small = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val norm = small.select(col("vec_id"),
      Similarity.l2Normalize(Similarity.asDouble("embedding")).as("nv"))
    val cb = Similarity.pqTrain(norm, "nv", m = 8, ksub = 16, maxIter = 5)
    val got = Similarity.annPqRerank(
        Similarity.pqEncode(norm, "vec_id", "nv", cb), cb, norm,
        norm.filter(col("vec_id") < 10), "vec_id", "nv",
        k = 10, shortlist = 50)
      .select(col("q_id"), col("vec_id"), col("rank"),
        format_number(col("sim"), 6).as("s"))
      .collect()
      .map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.get(2)}|${r.getString(3)}")
      .sorted.mkString(";")
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(got.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(digest == GOLDEN_Q113,
      s"learned-PQ pipeline drifted: sha256=$digest (rows=${got.take(120)}…)")
  }
  private val GOLDEN_Q113 =
    "935e062105dfdf3288aa668e463f5e0b88b9222c02144e4e1f9724d05037182c"
}
