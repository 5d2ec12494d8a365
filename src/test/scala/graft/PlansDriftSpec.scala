package graft

import org.scalatest.funsuite.AnyFunSuite

/** PLANS.md ⇄ Plans.Show drift gate (round-15; the CoverageDriftSpec
  * pattern applied to the plan document).
  *
  * PLANS.md is the document of plan record — "these are the physical
  * plans a 100 TB run gets". Round 14 proved how dangerous silent rot
  * is there: the file still displayed dd2/dd6 ObjectHashAggregate
  * pipelines two rounds after the shipped code replaced them because
  * their sort-based fallback was THE measured scale-killer (18+ GB
  * spill / OOM at gen-sf10, see SCALE.md). This spec fails the build
  * the moment (a) the generated file and the generator's query list
  * disagree in either direction, (b) a heading names an unregistered
  * query, or (c) any dd-family section shows an ObjectHashAggregate
  * again.
  */
class PlansDriftSpec extends AnyFunSuite {

  private lazy val plans: String = {
    val src = scala.io.Source.fromFile("PLANS.md", "UTF-8")
    try src.mkString finally src.close()
  }

  /** (query name, section body) per `## name` heading. */
  private lazy val sections: Seq[(String, String)] = {
    val parts = plans.split("\n## ").toSeq.drop(1)
    parts.map { p =>
      // a heading as the file's last line has no trailing newline —
      // substring(0, -1) would throw instead of reporting the drift
      val nl = p.indexOf('\n')
      if (nl < 0) (p.trim, "")
      else (p.substring(0, nl).trim, p.substring(nl + 1))
    }
  }

  test("PLANS.md headings == Plans.Show, both directions") {
    val headings = sections.map(_._1).toSet
    val show = Plans.Show.toSet
    val stale = headings -- show
    val unrendered = show -- headings
    assert(stale.isEmpty,
      s"PLANS.md has sections Plans.Show no longer lists (regenerate): ${stale.toSeq.sorted.mkString(", ")}")
    assert(unrendered.isEmpty,
      s"Plans.Show lists queries PLANS.md lacks (regenerate): ${unrendered.toSeq.sorted.mkString(", ")}")
  }

  test("every PLANS.md heading is a registered query") {
    val unknown = sections.map(_._1).filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty,
      s"PLANS.md documents unregistered queries: ${unknown.sorted.mkString(", ")}")
  }

  test("the flagship dedup re-plan is documented") {
    assert(Plans.Show.contains("dd14_minhash_production"),
      "dd14 is the round-14 flagship re-plan; PLANS.md must carry it")
  }

  test("no dd-family section shows ObjectHashAggregate (the measured scale-killer)") {
    val offenders = sections.collect {
      case (name, body) if name.startsWith("dd") &&
        body.contains("ObjectHashAggregate") => name
    }
    assert(offenders.isEmpty,
      s"dd plans regressed to ObjectHashAggregate (sort-fallback spill path): ${offenders.mkString(", ")}")
  }

  /** ObjectHashAggregate is only dangerous when its buffers grow with the
    * CORPUS (a collect_list over per-row inputs — the dd14 killer whose
    * sort-based fallback spilled 18+ GB). These two queries legitimately
    * show it today because their collect_list inputs are bounded BEFORE
    * the aggregate by a prior reduction: pp3 collects label×dim average
    * rows (|labels|·|dims|, corpus-independent) and nn15 collects centroid
    * rows (|lists|·|dims|). nn13 (round 16) collects the PQ codebook
    * into per-subspace arrays for the PqArgmin expression — 64 input
    * rows into 4 groups, corpus-independent by construction (the
    * codebook is the 16 lowest-vec_id anchors' slices). tx19 (round 16)
    * is the TopKStrByHash bounded-heap UDAF: a typed Aggregator always
    * plans as ObjectHashAggregate, but its BUFFER is capped at CapK=16
    * elements by construction — bounded per group, which is the
    * property this gate actually protects (dd14's killer was per-group
    * buffers that grow with the corpus) — and it measured zero spill at
    * gen-sf100 (records/QMETRICS_tx19_sf30sf100_96g_r16.jsonl). Any
    * OTHER section growing one must be re-justified here or re-planned.
    */
  private val boundedObjHashAllowlist =
    Set("pp3_embed_pipeline", "nn15_partitioned_ivf_probe", "nn13_pq_adc",
      "tx19_capped_cooccurrence")

  test("ObjectHashAggregate appears only in the bounded-input allowlist") {
    val offenders = sections.collect {
      case (name, body) if !name.startsWith("dd") &&
        !boundedObjHashAllowlist.contains(name) &&
        body.contains("ObjectHashAggregate") => name
    }
    assert(offenders.isEmpty,
      "new ObjectHashAggregate outside the bounded-input allowlist — " +
        "either the collect_list input is corpus-sized (re-plan it: " +
        "reduce first, the dd14 lesson) or it is provably bounded " +
        s"(add it to the allowlist with the argument): ${offenders.mkString(", ")}")
  }

  test("the allowlisted sections still exist and still need the exemption") {
    for (name <- boundedObjHashAllowlist) {
      val body = sections.collectFirst { case (`name`, b) => b }
      assert(body.isDefined, s"allowlisted section $name vanished from PLANS.md")
      assert(body.get.contains("ObjectHashAggregate"),
        s"$name no longer shows ObjectHashAggregate — drop it from the allowlist")
    }
  }
}
