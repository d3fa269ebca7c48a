package graft

/** Catalog-wide physical-plan audit: every SparkEntry query is planned
  * at sf0.001 and screened for shapes that do not survive scale.
  * Queries evolve; this keeps the plan invariants from regressing
  * silently (a reviewer checks one explain once — this checks all of
  * them every build).
  */
class PlanAuditSpec extends SparkSuite {

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf0001).queryExecution.executedPlan.toString
    }

  test("no query plans a CartesianProduct") {
    val offenders = plans.filter(_._2.contains("CartesianProduct")).keys
    assert(offenders.isEmpty,
      s"cartesian product in: ${offenders.mkString(", ")}")
  }

  test("no unpartitioned window without a group-limit bound") {
    // A Window over Exchange(SinglePartition) funnels the whole input
    // through one task — fatal at scale unless Catalyst bounded it
    // with WindowGroupLimit (rank <= k rewrites). Today NO catalog
    // query plans one (verified empty); this keeps it that way.
    val offenders = plans.filter { case (name, p) =>
      p.contains("Window") && p.contains("SinglePartition") &&
        !p.contains("WindowGroupLimit")
    }.keys
    assert(offenders.isEmpty,
      s"unbounded global window in: ${offenders.mkString(", ")}")
  }

  test("kmeans assignment plans a single Exchange (the final sort)") {
    // the argmin is a driver-inlined-literal projection: the ONLY
    // shuffle allowed is the rangepartitioning for the presentation
    // ORDER BY — a second Exchange means the K×corpus crossJoin+window
    // shape crept back in
    val plan = plans("emb_kmeans_assign")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 Exchange, got $exchanges:\n$plan")
  }

  test("single-pass operators plan exactly one base-table scan") {
    // round-6 executed-plan audit, frozen as a regression guard: each
    // of these claims a one-pass shape in its docstring (funnel's
    // chained windows; the localCheckpoint'ed shared stages in
    // curation/retention/sharded-packing make later branches read the
    // materialized RDD, so their FileScan count is 0 or 1). A higher
    // count means a branch went back to re-reading and re-processing
    // the corpus — the 7-scan funnel / 6-scan curation shapes this
    // audit originally caught.
    val onePass = Seq("ev_funnel", "pipe_e2e_curation", "ev_retention",
      "pipe_pack_nextfit_sharded", "pipe_domain_mix", "text_dup_spans")
    val offenders = onePass.flatMap { name =>
      val scans = "FileScan".r.findAllIn(plans(name)).size
      if (scans > 1) Some(s"$name ($scans scans)") else None
    }
    assert(offenders.isEmpty,
      s"multi-scan plans: ${offenders.mkString(", ")}")
  }

  test("every parquet scan prunes columns (no full-width lineitem read)") {
    // lineitem is 16 columns; no catalog query needs more than 8 of
    // them, so a ReadSchema carrying 14+ fields means pruning broke
    val schemaRe = "ReadSchema: struct<([^>]*)>".r
    val offenders = plans.flatMap { case (name, plan) =>
      schemaRe.findAllMatchIn(plan)
        .map(_.group(1).count(_ == ',') + 1)
        .filter(_ >= 14)
        .map(n => s"$name ($n cols)")
    }
    assert(offenders.isEmpty,
      s"unpruned scans: ${offenders.mkString(", ")}")
  }
}
