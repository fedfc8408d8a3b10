package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanically ties SCALING.md's measured scaling ratios to the
  * registry's `scaleLimited` annotations: no query may be measured
  * super-linear without carrying the annotation, and every annotation
  * must name a registered (oracle-checked) scale-path alternative.
  *
  * Budget: a perfectly linear operator at 10× data shows ratio ≈ 10 ÷
  * parallel slack; everything measured linear in SCALING.md sits ≤ ~5,
  * so 6.0 is the 10× budget. Rows tagged `@30x` (the extended sweep)
  * get 3× that budget, and `@100x` rows (round 11's deep sweep over the
  * most expensive families) get 10× — the same slack argument scaled to
  * the data factor (linear ≈ ≤60 at 100×).
  */
class ScaleAnnotationSpec extends AnyFunSuite {

  private val scalingMd = new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("SCALING.md")), "UTF-8")

  /** (query name, scale tag, measured ratio) for every markdown table row
    * whose first cell names a registered query. The ratio is the LAST
    * cell that is a pure number (optionally **bold**) — rows whose
    * trailing cells are prose keep their ratio column; "n/a" rows drop
    * out.
    */
  private def parsedRows: Seq[(String, String, Double)] =
    scalingMd.linesIterator.toSeq
      .filter(l => l.trim.startsWith("| q"))
      .flatMap { line =>
        val cells = line.split("\\|").map(_.trim).filter(_.nonEmpty)
        val nameCell = cells.head
        val name = nameCell.split("[\\s(]")(0)
        val tag = if (nameCell.contains("@100x")) "@100x"
          else if (nameCell.contains("@30x")) "@30x" else "@10x"
        val nums = cells.tail.flatMap { c =>
          val bare = c.replace("*", "").trim
          if (bare.matches("-?\\d+(\\.\\d+)?")) Some(bare.toDouble) else None
        }
        nums.lastOption.map(r => (name, tag, r))
      }

  test("SCALING.md parses into measured rows (format guard)") {
    val rows = parsedRows
    assert(rows.size >= 15, s"only ${rows.size} rows parsed — table format drifted?")
    assert(rows.exists(_._1 == "q177_pair_corr"))
    assert(rows.exists(_._1 == "q101_flagship_lsh"))
  }

  test("every query named in SCALING.md is a registered query") {
    val registered = Queries.all.map(_.name).toSet
    val unknown = parsedRows.map(_._1).filterNot(registered).distinct
    assert(unknown.isEmpty, s"SCALING.md names unregistered queries: $unknown")
  }

  test("no unannotated query is measured super-linear") {
    val annotated = Queries.all.filter(_.scaleLimited.isDefined).map(_.name).toSet
    val budgets = Map("@10x" -> 6.0, "@30x" -> 18.0, "@100x" -> 60.0)
    val offenders = parsedRows.collect {
      case (name, tag, ratio)
          if ratio > budgets(tag) && !annotated(name) =>
        s"$name $tag ratio=$ratio"
    }
    assert(offenders.isEmpty,
      s"super-linear without a scaleLimited annotation: $offenders")
  }

  test("segment-slope: a 30×→100× bend above 2× the data ratio requires an annotation") {
    // Round-11's proven blind spot: q49 read 48.45 at 100× — UNDER the
    // absolute budget (60) — while bending exactly N² (×11.2 wall for
    // ×3.33 data from its 30× point). A structural bend that's under
    // the budget at the measured scale is precisely what a 100 TB
    // design review exists to catch, so the octave-to-octave SLOPE is
    // now checked too: for any query measured at both 30× and 100×,
    // wall(100×)/wall(30×) may not exceed 2× the data ratio (3.33)
    // without a scaleLimited annotation. Two guards keep the rule
    // honest: (a) the 30× denominator is clamped at 1.0 — a sub-1
    // ratio means the query was still fixed-cost-dominated at 30×
    // (more data cannot make a plan faster; q250 measured 0.92 there),
    // and a noise-deflated denominator would inflate the slope; (b)
    // the bend must be MACROSCOPIC — r100 ≥ 20 (⅓ of the absolute
    // budget) — because below that the "slope" is fixed-cost
    // amortization arithmetic, not measured work growth (every
    // structurally-linear query sits ≤ ~18 at 100×; the N² family
    // reads ≥ 43). A true bend with a tiny base cost crosses the floor
    // at the next octave and flags then.
    val annotated = Queries.all.filter(_.scaleLimited.isDefined).map(_.name).toSet
    val best: Map[(String, String), Double] = parsedRows
      .groupBy(r => (r._1, r._2))
      .view.mapValues(_.map(_._3).min).toMap
    val dataRatio = 100.0 / 30.0
    val offenders = best.collect {
      case ((name, "@100x"), r100)
          if best.contains((name, "@30x")) && r100 >= 20.0 &&
            r100 / math.max(best((name, "@30x")), 1.0) > 2.0 * dataRatio &&
            !annotated(name) =>
        val slope = r100 / math.max(best((name, "@30x")), 1.0)
        f"$name slope=$slope%.1f (r30=${best((name, "@30x"))}%.2f, r100=$r100%.2f)"
    }
    assert(offenders.isEmpty,
      s"super-linear 30×→100× bend without a scaleLimited annotation: $offenders")
  }

  test("q177 is annotated and its scale path is a registered oracle-checked query") {
    val q177 = Queries.all.find(_.name == "q177_pair_corr").get
    assert(q177.scaleLimited.contains("q207_pair_corr_lsh"))
    val byName = Queries.all.map(q => q.name -> q).toMap
    Queries.all.flatMap(q => q.scaleLimited.map(q.name -> _)).foreach {
      case (from, to) =>
        assert(byName.contains(to), s"$from names unregistered scale path $to")
        assert(byName(to).oracle.isDefined || byName(to).oracleDyn.isDefined,
          s"$from's scale path $to has no oracle")
        assert(byName(to).scaleLimited.isEmpty,
          s"$from's scale path $to is itself scale-limited")
    }
  }
}
