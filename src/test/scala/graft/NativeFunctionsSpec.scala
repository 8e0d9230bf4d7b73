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

  test("bloom_might_contain: no false negatives, bounded false positives, null in → null out") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val keys = (1L to 1000L).map(_ * 3)
    val bf = keys.toDF("k").stat.bloomFilter("k", keys.size.toLong, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val filterLit = lit(bos.toByteArray)
    // every inserted key must hit (bloom guarantees no false negatives)
    val hits = keys.toDF("k")
      .filter(GraftFunctions.bloomMightContain(filterLit, col("k")))
      .count()
    assert(hits == keys.size)
    // non-members: fpp well under 10x the configured 1%
    val nonMembers = (1L to 10000L).filter(_ % 3 != 0)
    val fp = nonMembers.toDF("k")
      .filter(GraftFunctions.bloomMightContain(filterLit, col("k")))
      .count()
    assert(fp.toDouble / nonMembers.size < 0.1, s"fp rate ${fp}/${nonMembers.size}")
    // null probe → null (filtered out), and interpreted eval agrees with codegen
    val withNull = Seq(Some(3L), None).toDF("k")
      .filter(GraftFunctions.bloomMightContain(filterLit, col("k")))
      .collect()
    assert(withNull.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("char_entropy: closed-form values, determinism, null handling") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val cases = Seq(
      "aaaa" -> 0.0, // one symbol: zero bits
      "ab" -> 1.0, // two equiprobable symbols: exactly 1 bit
      "aabb" -> 1.0,
      "abcd" -> 2.0,
      "" -> 0.0)
    val got = cases.map(_._1).toDF("s")
      .select(GraftFunctions.charEntropy(col("s")).as("h"))
      .collect().map(_.getDouble(0)).toSeq
    cases.map(_._2).zip(got).foreach { case (want, have) =>
      assert(math.abs(want - have) < 1e-12, s"want $want got $have")
    }
    // SQL-callable and null-safe
    val r = spark.sql("SELECT char_entropy(CAST(NULL AS STRING))").collect()(0)
    assert(r.isNullAt(0))
    // matches a direct recomputation on real corpus text (codegen path ==
    // helper run directly)
    val docs = graft.common.Tables.load(spark, Sf, "documents").limit(50)
    val viaExpr = docs.select(col("doc_id"),
      GraftFunctions.charEntropy(col("text")).as("h"))
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    val direct = docs.select("doc_id", "text").collect().map { r0 =>
      r0.getLong(0) -> graft.functions.CharEntropy.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(r0.getString(1)))
    }.toMap
    assert(viaExpr == direct)
  }

  test("jaro_winkler: textbook values (= DuckDB builtin), SQL + nulls, codegen parity") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // pinned against DuckDB's jaro_winkler_similarity outputs
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("a", "b", 0.0),
      // jaro ≤ 0.7 → prefix bonus must NOT apply (DuckDB boost threshold)
      ("cfc", "cd", 0.611111111111111),
      ("cefc", "cffa", 0.6666666666666666))
    val got = cases.map(t => (t._1, t._2)).toDF("a", "b")
      .select(GraftFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    cases.map(_._3).zip(got).foreach { case (want, have) =>
      assert(want == have, s"want $want got $have")
    }
    // SQL-callable, symmetric, null-safe
    val r = spark.sql(
      "SELECT jaro_winkler('cold widget', 'old widget'), " +
        "jaro_winkler('old widget', 'cold widget'), " +
        "jaro_winkler(CAST(NULL AS STRING), 'x')").collect()(0)
    assert(r.getDouble(0) == 0.9696969696969697)
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.isNullAt(2))
    // codegen path == helper run directly on real corpus names
    val names = graft.common.Tables.load(spark, Sf, "part")
      .select("p_name").distinct().limit(40).collect().map(_.getString(0))
    val pairs = for (a <- names; b <- names if a < b) yield (a, b)
    val viaExpr = pairs.toSeq.toDF("a", "b")
      .select(col("a"), col("b"),
        GraftFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2))
      .toMap
    pairs.foreach { case (a, b) =>
      val direct = graft.functions.JaroWinklerAlgo.similarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(viaExpr((a, b)) == direct)
    }
  }
}
