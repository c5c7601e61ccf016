package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAggregator

class TopKAggregatorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bounded-heap top-k equals the window row_number formulation") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map { i =>
      (s"g${rnd.nextInt(20)}", rnd.nextInt(10000) / 10.0, s"p$i")
    }.toDF("grp", "score", "payload")

    val viaAgg = TopKAggregator.topKPerGroup(rows, "grp", "score", "payload", 3)
      .orderBy("grp", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))

    val w = Window.partitionBy("grp").orderBy(desc("score"), asc("payload"))
    val viaWindow = rows
      .withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= 3)
      .select("grp", "rk", "score", "payload")
      .orderBy("grp", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))

    assert(viaAgg.toSeq === viaWindow.toSeq)
  }

  test("groups smaller than k return all their rows, in order") {
    val rows = Seq(("a", 1.0, "x"), ("a", 5.0, "y"), ("b", 2.0, "z"))
      .toDF("grp", "score", "payload")
    val out = TopKAggregator.topKPerGroup(rows, "grp", "score", "payload", 10)
      .orderBy("grp", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(3)))
    assert(out.toSeq === Seq(("a", 1L, "y"), ("a", 2L, "x"), ("b", 1L, "z")))
  }
}
