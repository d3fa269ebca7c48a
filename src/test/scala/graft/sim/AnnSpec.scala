package graft.sim

import graft.SparkSuite

class AnnSpec extends SparkSuite {

  // sign-safe floor division (BigInt.mod is non-negative) — the
  // driver-side twin of the operators' pmod half-up divide
  private def fdiv(a: BigInt, n: BigInt): BigInt = (a - a.mod(n)) / n

  test("LSH top-k achieves reasonable recall against brute force") {
    val brute = SimilarityOps.annBruteTopK(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = SimilarityOps.annLshTopK(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(brute.nonEmpty)
    info(s"LSH recall = ${(brute & lsh).size}/${brute.size}")
    // PINNED golden: hyperplanes, corpus, and tie-breaks are all seeded
    // and deterministic, so observed recall is exactly 73/100 at the
    // round-7 default config (8 bits x 8 tables x 2-bit probes — the
    // sweep's Pareto point at recall >= 0.7; was 43/100 at 8x4x1).
    // Pinned as integers, not a double ratio, so a fixture-size change
    // fails with a readable count instead of a float-equality mystery.
    // A drop means the index regressed (a >=-chance floor would hide
    // that); re-pin deliberately if fixture or algorithm changes.
    assert(brute.size == 100, s"brute set ${brute.size} != 100")
    assert((brute & lsh).size == 73,
      s"LSH recall ${(brute & lsh).size}/100 != pinned 73/100")
  }

  test("range search agrees with brute-force top-k where they overlap") {
    // every brute top-5 hit whose cosine clears the 0.3 range threshold
    // must appear in the range result (both are exact; range has no k
    // bound, so it is a superset on the thresholded region)
    val bruteHits = SimilarityOps.annBruteTopK(spark, sf0001)
      .filter("cos >= 0.3").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val range = SimilarityOps.annRangeSearch(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bruteHits.nonEmpty, "threshold fixture produced no brute hits")
    val missing = bruteHits -- range
    assert(missing.isEmpty, s"range search missed exact hits: $missing")
    // and everything in the range result actually clears the threshold
    val below = SimilarityOps.annRangeSearch(spark, sf0001)
      .filter("cos < 0.3").count()
    assert(below == 0, s"$below results below the cosine threshold")
  }

  test("MIPS ranks by inner product, not cosine") {
    val mips = SimilarityOps.embMipsTopK(spark, sf0001).collect()
    assert(mips.length == 100, s"${mips.length} rows != 20 queries x 5")
    // per query: ip non-increasing with rank (tiebreak by nid asc)
    mips.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_.getInt(2))
      assert(byRank.map(_.getInt(2)).toSeq == (1 to 5),
        s"q$qid ranks ${byRank.map(_.getInt(2)).toSeq}")
      val ips = byRank.map(_.getDouble(3)).toSeq
      assert(ips == ips.sorted.reverse, s"q$qid ip not sorted: $ips")
    }
    // value differential: recompute the inner products driver-side from
    // the raw vectors. (The fixture's embeddings are exactly unit-norm,
    // so MIPS ordering coincides with cosine here — asserting the IP
    // VALUES is the check that actually distinguishes the op.)
    val vecs = graft.core.Tables.embeddings(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    mips.foreach { r =>
      val want = vecs(r.getLong(0)).zip(vecs(r.getLong(1)))
        .foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
      assert(math.abs(r.getDouble(3) - math.round(want * 1e4) / 1e4) < 1e-9,
        s"ip mismatch for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("IVF top-k achieves reasonable recall against brute force") {
    val brute = SimilarityOps.annBruteTopK(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val ivf = SimilarityOps.annIvfTopK(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    info(s"IVF recall = ${(brute & ivf).size}/${brute.size}")
    // PINNED golden (see LSH note): 4/16 cells probed gives exactly
    // 62/100 on the seeded fixture; a drop is an index regression.
    assert(brute.size == 100, s"brute set ${brute.size} != 100")
    assert((brute & ivf).size == 62,
      s"IVF recall ${(brute & ivf).size}/100 != pinned 62/100")
    assert(ivf.forall { case (q, n) => q != n })
  }

  test("PQ top-k achieves reasonable recall against brute force") {
    val brute = SimilarityOps.annBruteTopK(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val pq = SimilarityOps.annPqTopK(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    info(s"PQ recall = ${(brute & pq).size}/${brute.size}")
    // PINNED golden (see LSH note): 50 ADC candidates rescored exactly
    // give exactly 77/100 on the seeded fixture; a drop means the
    // codebook/ADC regressed.
    assert(brute.size == 100, s"brute set ${brute.size} != 100")
    assert((brute & pq).size == 77,
      s"PQ recall ${(brute & pq).size}/100 != pinned 77/100")
    assert(pq.forall { case (q, n) => q != n })
  }

  test("LSH candidate fraction is pinned — the cost of the recall knob") {
    // recall and candidate fraction move together on the uniform
    // fixture (no cluster structure to exploit), so the fraction the
    // 73/100 recall BUYS is pinned right next to it: k=corpus makes
    // the rank filter a no-op, so the result set IS the candidate set.
    // If an index change silently probes more of the corpus, this
    // count moves even when recall doesn't — the "brute force wearing
    // an index" regression the round-6 design note warned about.
    val n = 500
    val cands = SimilarityOps.annLshTopK(spark, sf0001, k = n).count()
    val fracE4 = cands * 10000 / (20L * n)
    info(s"LSH candidates = $cands / ${20 * n} (${fracE4} bp)")
    assert(cands == 4671, s"candidate count $cands != pinned 4671")
  }

  test("low-cost LSH config: pinned recall and cheaper candidates") {
    // the named frugal alternative (8x4x1): recall drops to 43/100 but
    // the candidate fraction — the per-query cost at 100 TB — is ~2.4x
    // lower than the 73/100 headline config (19% vs 47%). Both sides pinned so the
    // recall/cost tradeoff stays an explicit, tested design choice.
    val brute = SimilarityOps.annBruteTopK(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps.annLshTopKLowCost(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    info(s"low-cost LSH recall = ${(brute & lsh).size}/${brute.size}")
    assert((brute & lsh).size == 43,
      s"low-cost LSH recall ${(brute & lsh).size}/100 != pinned 43/100")
    val n = 500
    val cands = SimilarityOps.annLshTopKLowCost(spark, sf0001, k = n).count()
    info(s"low-cost LSH candidates = $cands / ${20 * n}")
    assert(cands == 1917, s"low-cost candidates $cands != pinned 1917")
  }

  test("LSH results are a subset of valid neighbors (no self matches)") {
    val lsh = SimilarityOps.annLshTopK(spark, sf0001).collect()
    assert(lsh.forall(r => r.getLong(0) != r.getLong(1)))
    assert(lsh.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 5))
  }

  test("IVF-PQ top-k beats the coarse-stage recall against brute force") {
    val brute = SimilarityOps.annBruteTopK(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val ipq = SimilarityOps.annIvfPqTopK(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    info(s"IVF-PQ recall = ${(brute & ipq).size}/${brute.size}")
    // PINNED golden (see LSH note): 8/16 probes over 8-byte codes give
    // exactly 82/100 on the seeded fixture — ABOVE the 4-probe flat
    // IVF's 62/100, because the compression's memory savings are spent
    // on probe depth (the faiss argument: 8 probes of PQ codes still
    // scan ~16× fewer bytes than 4 probes of raw vectors; the
    // per-probe cost is pinned in the candidate-fraction test below).
    // A drop means the residual codebook/ADC or coarse stage regressed.
    assert(brute.size == 100, s"brute set ${brute.size} != 100")
    assert((brute & ipq).size == 82,
      s"IVF-PQ recall ${(brute & ipq).size}/100 != pinned 82/100")
    assert(ipq.forall { case (q, n) => q != n })
  }

  test("IVF-PQ candidate bytes stay below flat IVF's — the PQ bargain") {
    // the deeper probe budget is only honest if the BYTES scanned stay
    // lower: candidates(ivfpq, 8 probes) x 8-byte codes must undercut
    // candidates(ivf, 4 probes) x 512-byte raw vectors by an order of
    // magnitude. Candidate counts are deterministic (seeded corpus,
    // deterministic Lloyd), so both sides are pinned integers: k=corpus
    // turns the rank filter into a no-op and the result set IS the
    // candidate set (same trick as the LSH fraction pin).
    val n = 500
    val ivfpqCands = SimilarityOps.annIvfPqTopK(spark, sf0001,
      cand = 20 * n, k = n).count()
    val ivfCands = SimilarityOps.annIvfTopK(spark, sf0001, k = n).count()
    info(s"IVF-PQ candidates = $ivfpqCands, IVF candidates = $ivfCands")
    assert(ivfpqCands == 5006, s"IVF-PQ candidates $ivfpqCands != pinned 5006")
    assert(ivfCands == 2467, s"IVF candidates $ivfCands != pinned 2467")
    // bytes: 8B codes vs 64 doubles = 512B per scanned entry
    assert(ivfpqCands * 8 < ivfCands * 512 / 10,
      "PQ probe-depth bargain violated: scanned bytes not ~10x lower")
  }

  test("Matryoshka top-k achieves the pinned prefix-stage recall") {
    val brute = SimilarityOps.annBruteTopK(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mat = SimilarityOps.annMatryoshkaTopK(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    info(s"Matryoshka recall = ${(brute & mat).size}/${brute.size}")
    // PINNED golden (see LSH note): a 32-of-64-dim prefix pass keeping
    // 50 candidates recalls exactly 80/100 on the uniform fixture —
    // the prefix carries exactly half the signal here; MRL-trained
    // embeddings front-load information and recall higher at the same
    // config. A drop means the two-stage pipeline regressed.
    assert(brute.size == 100, s"brute set ${brute.size} != 100")
    assert((brute & mat).size == 80,
      s"Matryoshka recall ${(brute & mat).size}/100 != pinned 80/100")
    assert(mat.forall { case (q, n) => q != n })
  }

  test("Matryoshka rescore set and prefix bytes stay pinned") {
    // every other ANN variant carries a recall + cost pair; this is
    // Matryoshka's cost side (round-8 advisory): config drift must not
    // silently turn the two-stage search into full-width brute force
    // twice. k=cand turns the final rank filter into a no-op, so the
    // result IS the stage-2 rescore set (the IVF-PQ pin's trick).
    val corpus = graft.core.Tables.embeddings(spark, sf0001).count()
    val pairs = 20L * (corpus - 1) // brute-force comparison count
    val cands = SimilarityOps.annMatryoshkaTopK(spark, sf0001, k = 50).count()
    info(s"Matryoshka rescore set = $cands / $pairs pairs")
    assert(cands == 1000L, s"rescore set $cands != pinned 20 queries × 50")
    // bytes: stage 1 reads the 32-of-64-dim prefix over every pair
    // (256 B of 512 B), stage 2 rescores only the survivors full-width
    // — together well under one brute pass (a prefixDim drift to full
    // width is caught separately: the recall pin would jump 80 → 92+)
    val matBytes = pairs * 32 * 8 + cands * 64 * 8
    val bruteBytes = pairs * 64 * 8
    assert(matBytes * 10 < bruteBytes * 7,
      s"two-stage bytes $matBytes not under 0.7× brute $bruteBytes")
  }

  test("decontamination report matches a driver brute-force recompute") {
    // independent recompute: plain Scala cosines over the collected
    // vectors, no Spark expressions shared with the operator
    val vecs = graft.core.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double))")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val (evalV, trainV) = vecs.partition(_._1 < 50)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e4 + 0.5) / 1e4
    }
    val expected = trainV.flatMap { case (tid, tv) =>
      val hits = evalV.map { case (eid, ev) => (eid, cos(tv, ev)) }
        .filter(_._2 >= 0.3)
      if (hits.isEmpty) None
      else Some(tid -> hits.minBy { case (eid, c) => (-c, eid) })
    }.toMap
    val got = SimilarityOps.embDecontaminate(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected,
      s"${got.size} flagged vs ${expected.size} expected")
    // the fixture must actually exercise the report
    assert(got.nonEmpty, "no contaminated train vectors in fixture")
    assert(got.keySet.forall(_ >= 50))
  }

  test("label centroids match a BigInt driver recompute, order-free") {
    val rows = graft.core.Tables.embeddings(spark, sf0001)
      .selectExpr("label", "transform(embedding, x -> cast(x as double))")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    // independent recompute: snap, sum as BigInt in ARBITRARY order
    // (reverse of collected), floor-divide half-up via shared fdiv
    val expected = rows.groupBy(_._1).flatMap { case (label, g) =>
      val vs = g.map(_._2).reverse
      (0 until 64).map { d =>
        val s = vs.map(v => BigInt(math.floor(v(d) * 1e4 + 0.5).toLong)).sum
        val n = BigInt(vs.length)
        (label, d) -> ((vs.length.toLong, fdiv(s + n / 2, n).toLong))
      }
    }
    val got = SimilarityOps.embLabelCentroid(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"centroid $k: got ${got(k)}, want $v")
    }
    // centroids of a mean-zero-ish corpus still carry signal: not all 0
    assert(got.values.exists(_._2 != 0L), "all centroid components zero")
  }

  test("streaming centroids equal the batch centroids at every trigger") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // replay the real embeddings in 3 micro-batches; after EACH batch
    // the live centroid must equal a batch recompute over the prefix —
    // the exactness float means cannot give under incremental ingest
    val rows = graft.core.Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding").collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    val src = MemoryStream[(Long, Int, Array[Float])]
    val streamed = SimilarityOps.embLabelCentroidStream(
      src.toDF.toDF("vec_id", "label", "embedding"))
    // UPDATE mode — the advertised deployment path: the sink receives
    // only changed (label, dim) rows per trigger; n_vecs is monotone
    // per cell, so "row with max n_vecs" is the live value
    val q = streamed.writeStream.format("memory")
      .queryName("centroid_stream").outputMode("update").start()
    val batches = rows.grouped(rows.length / 3 + 1).toSeq
    var seen = Array.empty[(Long, Int, Array[Float])]
    batches.foreach { b =>
      src.addData(b.toIndexedSeq)
      q.processAllAvailable()
      seen = seen ++ b
      val live = spark.sql(
        """select label, dim, n_vecs, centroid_e4 from (
          |  select *, max(n_vecs) over (partition by label, dim) as mx
          |  from centroid_stream)
          |where n_vecs = mx""".stripMargin)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      // batch recompute over exactly the prefix seen so far
      val want = seen.groupBy(_._2).flatMap { case (label, g) =>
        val n = BigInt(g.length)
        (0 until 64).map { d =>
          val s = g.map(r =>
            BigInt(math.floor(r._3(d) * 1e4 + 0.5).toLong)).sum
          (label, d) -> ((g.length.toLong, fdiv(s + n / 2, n).toLong))
        }
      }
      assert(live == want,
        s"live centroids diverged from prefix batch at ${seen.length} rows")
    }
    q.stop()
  }

  test("centroid assignment census matches a BigInt driver recompute") {
    val rows = graft.core.Tables.embeddings(spark, sf0001)
      .selectExpr("label", "transform(embedding, x -> cast(x as double))")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    def snap(v: Array[Double]): Array[Long] =
      v.map(x => math.floor(x * 1e4 + 0.5).toLong)
    // centroids via the same sign-safe floor half-up divide
    val cents = rows.groupBy(_._1).map { case (label, g) =>
      val n = BigInt(g.length)
      label -> (0 until 64).map { d =>
        val s = g.map(r => BigInt(snap(r._2)(d))).sum
        fdiv(s + n / 2, n).toLong
      }.toArray
    }
    val expected = rows.map { case (label, v) =>
      val q = snap(v)
      val (alabel, dist) = cents.toSeq.sortBy(_._1).map { case (l, c) =>
        (l, (0 until 64).map(d => BigInt(q(d) - c(d)) * BigInt(q(d) - c(d))).sum)
      }.minBy { case (l, dd) => (dd, l) }
      ((label, alabel), dist)
    }.groupBy(_._1).map { case (k, g) =>
      k -> ((g.length.toLong, g.map(_._2).sum))
    }
    val got = SimilarityOps.embCentroidAssign(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), BigInt(r.getLong(3))))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"census cell $k: got ${got(k)}, want $v")
    }
    // coherence: the synthetic labels are weakly clustered, so the
    // diagonal is far above the 10%-chance floor (50/500) without
    // being dominant — pinned at the measured 183/500 (deterministic
    // fixture; see the LSH pin note)
    val diag = got.collect { case ((l, a), (n, _)) if l == a => n }.sum
    val total = got.values.map(_._1).sum
    assert(total == 500, s"unexpected corpus size $total")
    assert(diag == 183, s"own-label diagonal $diag/500 != pinned 183")
  }

  test("streaming ingest decontamination matches the batch report") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.core.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val evalDf = graft.core.Tables.embeddings(spark, sf0001)
      .filter("vec_id < 50").select("vec_id", "embedding")
    val src = MemoryStream[(Long, Array[Float])]
    val q = SimilarityOps.embDecontaminateStream(
        src.toDF.toDF("vec_id", "embedding"), evalDf)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").start()
    // the WHOLE feed arrives in micro-batches — including the eval
    // vectors themselves (ids < 50): the operator's broadcast
    // anti-join must screen them out, with no caller pre-filtering
    // (the round-8 advisory: parity must not depend on the feed
    // being pre-cleaned)
    all.grouped(200).foreach { b =>
      src.addData(b.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    // no eval-id row may leak into the hit stream as a "train" doc
    val leaked = spark.sql(
      "select count(*) from decon_stream where train_id < 50")
      .collect()(0).getLong(0)
    assert(leaked == 0L, s"$leaked eval-id rows leaked past the anti-join")
    // best hit per train doc over the appended hits == the batch
    // top-1 report (same cos-desc, eval-asc tiebreak)
    val got = spark.sql(
      "select train_id, eval_id, cos from decon_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (t, hits) =>
        val best = hits.minBy(h => (-h._3, h._2))
        t -> ((best._2, best._3))
      }
    val want = SimilarityOps.embDecontaminate(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want,
      s"stream flagged ${got.size} train docs, batch ${want.size}")
    assert(got.nonEmpty)
  }

  test("near-dup pairs are invariant to the label-block split bound") {
    // the block-pair tiling only relocates pairwise work across tasks;
    // the pair set must be identical at any bound — including 1 (every
    // member its own block) and one larger than any label group
    def run(bs: Int): Seq[(Long, Long, String, Double)] =
      SimilarityOps.embeddingNearDup(spark, sf0001, blockSize = bs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString,
          r.getDouble(3)))
        .toSeq
    val unsplit = run(1 << 20)
    assert(unsplit.nonEmpty, "fixture produced no near-dup pairs")
    for (bs <- Seq(1, 7, 64)) {
      assert(run(bs) == unsplit, s"blockSize=$bs diverged from un-split")
    }
  }

  test("quantizer training collects respect the declared driver budget") {
    // r13 verdict #5: the IVF training sample is the largest driver
    // materialization in the codebase. Pin (a) the shipped ceiling —
    // the 256 K-row sample cap at the engine's 64-dim vectors stays
    // under TrainingCollectBudgetBytes — and (b) the failure mode: an
    // over-budget request dies at the require, BEFORE any collect.
    val maxSample = SimilarityOps.ivfSampleSize(Int.MaxValue / 32)
    assert(maxSample == 262144, "sample cap drifted — revisit the budget")
    assert(maxSample.toLong * SimilarityOps.VecDims * 8 <=
      SimilarityOps.TrainingCollectBudgetBytes)
    val e = graft.core.Tables.load(spark, sf0001, "embeddings")
    val ex = intercept[IllegalArgumentException] {
      SimilarityOps.trainTwoLevel(e, l1Cells = 4, l2Per = 4,
        sampN = 600 * 1000 * 1000, l1SampN = 1024)
    }
    assert(ex.getMessage.contains("driver budget"))
  }

  test("brute-force ranks are dense and cosines descend per query") {
    val rows = SimilarityOps.annBruteTopK(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.size).toSeq)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      })
    }
  }
}
