package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NativeFunctionsSpec extends AnyFunSuite with SparkSpec {

  test("native cosine_sim bit-matches the HOF formulation (codegen + interpreted)") {
    GraftFunctions.register(spark)
    val e = graft.common.Tables.load(spark, Sf, "embeddings").limit(100)
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"))
    val pairs = a.join(b, col("v1") < col("v2"))
    val hof = graft.queries.Similarity.cosine(col("e1"), col("e2"))
    val native = GraftFunctions.cosineSim(col("e1"), col("e2"))
    val diff = pairs.select((hof - native).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0, s"max |hof - native| = $diff")
  }

  test("cosine_sim is callable from SQL text") {
    GraftFunctions.register(spark)
    graft.common.Tables.load(spark, Sf, "embeddings").limit(5)
      .createOrReplaceTempView("emb_tmp")
    val r = spark.sql(
      """SELECT a.vec_id, b.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_tmp a JOIN emb_tmp b ON a.vec_id < b.vec_id""".stripMargin)
      .collect()
    assert(r.nonEmpty && r.forall(row => math.abs(row.getDouble(2)) <= 1.0 + 1e-12))
  }

  test("cosine_sim returns null on null input") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .collect()(0)
    assert(r.isNullAt(0))
  }
}
