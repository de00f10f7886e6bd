package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bag(d: org.apache.spark.sql.DataFrame): Map[String, Int] =
    d.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of the left rides one hot key — the salting target.
    val left = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, i)).toDF("k", "v")
      .repartition(8)
    val right = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (3L, "c"))
      .toDF("rk", "name")
    val plain = left.join(right, col("k") === col("rk"))
    val salted = Skew.saltedJoin(left, right, col("k"), col("rk"), 8)
    assert(bag(salted) == bag(plain))
    assert(salted.columns.toSeq == plain.columns.toSeq) // salt never leaks
  }

  test("saltedJoin preserves left rows under left-outer semantics") {
    import spark.implicits._
    val left = Seq((42L, 1), (42L, 2), (99L, 3)).toDF("k", "v")
    val right = Seq((42L, "hot")).toDF("rk", "name")
    val out = Skew.saltedJoin(left, right, col("k"), col("rk"), 4, "left")
    assert(out.count() == 3) // unmatched key survives exactly once
    assert(out.filter(col("name").isNull).count() == 1)
  }
}
