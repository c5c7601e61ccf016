package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Xlsx

class XlsxSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("write → read round-trip: sheet order, headers, values, escaping") {
    val path = Files.createTempDirectory("graft_xlsx")
      .resolve("t.xlsx").toString
    val a = Seq(("T1", 10.5, 3L), ("T<2>&\"", 11.0, 4L))
      .toDF("id", "amount", "n")
    val b = Seq(("x", "y")).toDF("c1", "c2")
    Xlsx.write(path, Seq("SheetA" -> a, "SheetB" -> b))

    val sheets = Xlsx.read(path)
    assert(sheets.map(_._1) === Seq("SheetA", "SheetB"))
    val rowsA = sheets.head._2
    assert(rowsA(0) === Vector("id", "amount", "n"))
    assert(rowsA(1) === Vector("T1", "10.5", "3"))
    assert(rowsA(2)(0) === "T<2>&\"")   // XML escaping survives
    assert(sheets(1)._2 === Vector(Vector("c1", "c2"), Vector("x", "y")))
  }

  test("readSheets: _row_idx + string columns, nulls for missing cells") {
    val path = Files.createTempDirectory("graft_xlsx2")
      .resolve("t.xlsx").toString
    val df = Seq(("a", "b"), ("c", null)).toDF("h1", "h2")
    Xlsx.write(path, Seq("S" -> df))
    val got = Xlsx.readSheets(spark, path)("S")
    assert(got.columns.toSeq === Seq("_row_idx", "_c0", "_c1"))
    val rows = got.orderBy("_row_idx").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    assert(rows(2).getString(1) === "c")
    assert(rows(2).isNullAt(2))
  }

  test("reads the reference sample workbook shape") {
    val sample = "/root/reference/uploads/Txn_Details.xlsx"
    assume(Files.exists(java.nio.file.Paths.get(sample)))
    val sheets = Xlsx.read(sample).toMap
    assert(sheets.keySet === Set("Transactions", "Customers", "Products"))
    assert(sheets("Transactions").length === 1001)  // header + 1000
    assert(sheets("Customers").length === 105)      // header + 104
    assert(sheets("Products").length === 9)         // header + 8
    // packed record format in the customers sheet
    assert(sheets("Customers")(1)(0).startsWith("{"))
  }
}
