package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}

/** Session registration for Spark's OWN Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the machinery
  * behind AQE's injected runtime filters — see q20c). Spark keeps them
  * out of the public FunctionRegistry because the optimizer normally
  * plants them itself; registering the same classes under `graft_`
  * names lets an operator build an EXPLICIT semi-join prefilter — the
  * sketch-then-verify decontamination pass ([[graft.Engine.decontaminateBloom]])
  * — with zero custom sketch code and full codegen.
  *
  * `might_contain` type-checks its bloom side as a CONSTANT (literal or
  * scalar subquery): callers embed the serialized sketch as a binary
  * literal, exactly how Spark's own runtime-filter rewrite ships it to
  * the probe side.
  */
object BloomFunctions {
  val aggName = "graft_bloom_agg"
  val mightContainName = "graft_might_contain"

  private val aggBuilder: Seq[Expression] => Expression = {
    case Seq(v, items, bits) =>
      new BloomFilterAggregate(v, items, bits).toAggregateExpression()
    case exprs => throw new IllegalArgumentException(
      s"$aggName expects (value, estimatedItems, numBits), got ${exprs.length} args")
  }

  private val mcBuilder: Seq[Expression] => Expression = {
    case Seq(bf, v) => BloomFilterMightContain(bf, v)
    case exprs => throw new IllegalArgumentException(
      s"$mightContainName expects (bloom, value), got ${exprs.length} args")
  }

  /** Idempotent (see [[SortedIntersectCount.register]]): re-registering
    * per query floods the bench log with `replaced` warnings. */
  def register(spark: SparkSession): Unit = {
    def put(n: String, b: Seq[Expression] => Expression): Unit =
      if (!spark.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(n)))
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          n, b, "built-in")
    put(aggName, aggBuilder)
    put(mightContainName, mcBuilder)
  }
}
