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
