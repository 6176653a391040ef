package graft

import org.apache.spark.sql.{Column, Encoders, SparkSession}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.functions.{lit, udaf}

/** Column-level API for the engine's custom functions, mirroring
  * `org.apache.spark.sql.functions`. All are native Catalyst expressions
  * (codegen'd) or typed aggregators — no Scala-closure UDFs in hot paths.
  */
package object functions {

  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    Bridge.column(e)
  private def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    Bridge.expression(c)

  /** Seeded murmur3_x86_32 of a string/binary column (signed Int). */
  def mmh3(key: Column, seed: Column): Column = col(Mmh3(expr(key), expr(seed)))
  def mmh3(key: Column, seed: Int): Column = mmh3(key, lit(seed))

  /** Bloom membership probe against a packed filter column. */
  def bloom_might_contain(bits: Column, m: Column, k: Column, key: Column): Column =
    col(BloomMightContain(expr(bits), expr(m), expr(k), expr(key)))

  /** Per-group Bloom build aggregate: `bloom_build(key, m, k)` → BINARY. */
  val bloom_build: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(BloomBuildAggregator, Encoders.product[BloomInput])

  /** Register the SQL surface (`SELECT mmh3(c, 3)`, `bloom_build(...)`,
    * `bloom_might_contain(...)`) on a session. */
  def registerAll(spark: SparkSession): Unit = {
    def arity(name: String, n: Int)(
        build: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
          org.apache.spark.sql.catalyst.expressions.Expression) =
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        exprs => {
          if (exprs.length != n) {
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> name, "expectedNum" -> n.toString,
                "actualNum" -> exprs.length.toString, "legacyNum" -> n.toString))
          }
          build(exprs)
        },
        "built-in")
    arity("mmh3", 2)(exprs => Mmh3(exprs(0), exprs(1)))
    arity("bloom_might_contain", 4)(exprs =>
      BloomMightContain(exprs(0), exprs(1), exprs(2), exprs(3)))
    spark.udf.register("bloom_build", bloom_build)
  }
}
