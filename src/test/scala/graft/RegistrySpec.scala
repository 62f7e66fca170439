package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps SURVEY.md §2 and the SparkEntry registry in lockstep — the
  * inventory is the external contract, so drift is a test failure.
  */
class RegistrySpec extends AnyFunSuite {

  private val surveyNames: Seq[(String, String)] = {
    val lines = scala.io.Source.fromFile("SURVEY.md", "UTF-8").getLines().toSeq
    val entry = """- \[x\] `([a-z0-9_]+)` \[(SQL|rows)\].*""".r
    lines.collect { case entry(name, mode) => (name, mode) }
  }

  test("every SURVEY §2 line has a registered query") {
    val registered = SparkEntry.queries.keySet
    val missing = surveyNames.map(_._1).filterNot(registered.contains)
    assert(missing.isEmpty, s"in SURVEY but not registered: $missing")
  }

  test("every registered query has a SURVEY §2 line") {
    val inSurvey = surveyNames.map(_._1).toSet
    val missing = SparkEntry.queries.keySet.filterNot(inSurvey.contains)
    assert(missing.isEmpty, s"registered but not in SURVEY: $missing")
  }

  test("SURVEY oracle modes match the registry") {
    val withOracle = SparkEntry.oracleSql.keySet
    surveyNames.foreach { case (name, mode) =>
      val expectSql = mode == "SQL"
      assert(withOracle.contains(name) == expectSql,
        s"$name: SURVEY says [$mode] but oracle present=${withOracle.contains(name)}")
    }
  }

  test("no duplicate query names across modules") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate names: $dups")
  }

  test("oracle SQL only references tables that exist") {
    val known = Tables.names.toSet
    val fromRe = """(?i)(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)""".r
    val cteRe = """(?i)([a-z_][a-z0-9_]*)\s+AS\s*(?:NOT\s+)?(?:MATERIALIZED\s+)?\(""".r
    SparkEntry.oracleSql.foreach { case (name, raw) =>
      // EXTRACT(unit FROM col) is not a table reference
      val sql = raw.replaceAll("(?i)EXTRACT\\s*\\(\\s*\\w+\\s+FROM", "EXTRACT(")
      val ctes = cteRe.findAllMatchIn(sql).map(_.group(1)).toSet
      val refs = fromRe.findAllMatchIn(sql).map(_.group(1)).toSet
      val unknown = refs -- known -- ctes --
        Set("generate_series", "glob", "unnest", "read_parquet")
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
