package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SchemaReconciler._

class SchemaReconcilerSpec extends AnyFunSuite {

  test("normSpace reproduces Upload.py:137-145 semantics") {
    assert(normSpace("  Project__Name \r\n") == "project name")
    assert(normSpace("OB Main ID") == "ob main id")
    assert(normSpace("Total (%)") == "total")
    assert(normSpace("A B") == "a b") // NBSP
  }

  test("normSnake reproduces Compare.py:34-39 semantics") {
    assert(normSnake("  OB Main-ID? ") == "ob_main_id")
    assert(normSnake("__x__") == "x")
  }

  test("letter/ordinal bijection (Compare.py:50-53)") {
    assert(letterToOrdinal("A") == 1)
    assert(letterToOrdinal("Z") == 26)
    assert(letterToOrdinal("AA") == 27)
    assert(letterToOrdinal("BC") == 55)
    for (n <- 1 to 1000) assert(letterToOrdinal(ordinalToLetter(n)) == n)
  }

  test("matchColumns: normalized intersection, overrides first, order kept") {
    val src = Seq("Project Name", "OB_MAIN_ID", "Unmatched", "Total")
    val tgt = Seq("project name", "OB Main ID", "TOTAL", "Extra Target")
    assert(matchColumns(src, tgt) == Seq(
      "Project Name" -> "project name",
      "OB_MAIN_ID" -> "OB Main ID",
      "Total" -> "TOTAL"))
    // manual override wins over normalization (Upload.py:174)
    assert(matchColumns(Seq("X"), tgt, Map("X" -> "Extra Target")) ==
      Seq("X" -> "Extra Target"))
  }

  test("duplicate target headers: last occurrence wins (dict overwrite)") {
    // reference builds {norm -> position} by scanning L->R and overwriting
    assert(matchColumns(Seq("a"), Seq("A", "a ")) == Seq("a" -> "a "))
  }
}
