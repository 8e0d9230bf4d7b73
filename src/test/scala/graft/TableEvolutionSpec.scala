package graft

import graft.tables.ParquetTable
import org.scalatest.funsuite.AnyFunSuite

/** Additive schema evolution for the versioned table layer (round-15) —
  * Delta's `mergeSchema` contract: a batch may ADD columns; old files
  * ride by reference and read null for them; every version's manifest
  * records its own column list (`#cols` header), so time travel keeps
  * each version's own schema and append's compatibility check never
  * opens a data file.
  */
class TableEvolutionSpec extends AnyFunSuite with SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-evo").toString + "/t"

  test("append(mergeSchema) adds a column: old rows null, old versions keep old schema") {
    import spark.implicits._
    val t = ParquetTable(spark, tmp())
    val v1 = t.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    // additive batch: every existing column plus a new one
    val v2 = t.append(Seq((3, "c", 30L)).toDF("k", "v", "score"),
      mergeSchema = true)
    assert(t.read.columns.toSeq == Seq("k", "v", "score"),
      "evolved schema = existing columns then new, in order")
    val byK = t.read.collect().map(r => r.getInt(0) ->
      (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(byK == Map(1 -> None, 2 -> None, 3 -> Some(30L)),
      "pre-evolution rows read null for the new column")
    // time travel: the old version's schema is its OWN, not the union
    assert(t.readVersion(v1).columns.toSeq == Seq("k", "v"))
    assert(t.readVersion(v2).columns.toSeq == Seq("k", "v", "score"))
    // post-evolution appends must carry the full evolved column set
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((4, "d")).toDF("k", "v"))
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("append without mergeSchema still rejects a new column (strict contract)") {
    import spark.implicits._
    val t = ParquetTable(spark, tmp())
    t.overwrite(Seq((1, "a")).toDF("k", "v"))
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((2, "b", 1L)).toDF("k", "v", "extra"))
    }
    assert(e.getMessage.contains("schema mismatch"))
    // and mergeSchema is additive ONLY: dropping a column is refused
    val e2 = intercept[IllegalArgumentException] {
      t.append(Seq(Tuple1(3)).toDF("k"), mergeSchema = true)
    }
    assert(e2.getMessage.contains("additive"))
  }

  test("merge(mergeSchema) upserts a wider source; untouched rows read null") {
    import spark.implicits._
    val t = ParquetTable(spark, tmp(), statsColumns = Seq("k"))
    val v1 = t.overwrite(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
      .repartition(3))
    // wider source updates key 2 and inserts key 4
    t.merge(Seq((2, "B", 20L), (4, "d", 40L)).toDF("k", "v", "score"),
      keys = Seq("k"), mergeSchema = true)
    val got = t.read.collect().map(r => r.getInt(0) ->
      ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got == Map(1 -> (("a", -1L)), 2 -> (("B", 20L)),
      3 -> (("c", -1L)), 4 -> (("d", 40L))),
      "merged rows carry the new column; untouched/surviving rows read null")
    assert(t.read.columns.toSeq == Seq("k", "v", "score"))
    // time travel below the evolution point keeps the narrow schema
    assert(t.readVersion(v1).columns.toSeq == Seq("k", "v"))
    // a second, non-evolving merge over the evolved table still works
    t.merge(Seq((1, "A", 10L)).toDF("k", "v", "score"), keys = Seq("k"))
    assert(t.read.count() == 4)
  }

  test("merge without mergeSchema refuses a wider source (no silent evolution)") {
    import spark.implicits._
    val t = ParquetTable(spark, tmp())
    t.overwrite(Seq((1, "a")).toDF("k", "v"))
    intercept[Exception] {
      t.merge(Seq((1, "A", 9L)).toDF("k", "v", "extra"), keys = Seq("k"))
    }
    assert(t.read.columns.toSeq == Seq("k", "v"), "table unchanged")
  }

  // ---- round-16: type widening + column rename ------------------------

  test("append with a WIDENED column type evolves the recorded type (int->long)") {
    import spark.implicits._
    val t = ParquetTable(spark, tmp())
    val v1 = t.overwrite(Seq((1, 10), (2, 20)).toDF("k", "n"))
    // a long batch widens n: old int files stay, read casts up
    val v2 = t.append(Seq((3, 3000000000L)).toDF("k", "n")
      .select(org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col("n")), mergeSchema = true)
    assert(t.read.schema("n").dataType ==
      org.apache.spark.sql.types.LongType,
      "the table's recorded type must be the widened one")
    val byK = t.read.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byK == Map(1 -> 10L, 2 -> 20L, 3 -> 3000000000L),
      "old narrow rows cast up; the wide row is exact")
    // time travel: the pre-widening version keeps ITS OWN narrow type
    assert(t.readVersion(v1).schema("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(t.readVersion(v2).schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    // a NARROW batch into the widened column upcasts silently (Delta's
    // implicit up-cast) — no mergeSchema needed
    t.append(Seq((4, 40)).toDF("k", "n"))
    assert(t.read.filter(org.apache.spark.sql.functions.col("k") === 4)
      .collect()(0).getLong(1) == 40L)
    // merge keyed on k still prunes + upserts across the mixed files
    t.merge(Seq((2, 2200000000L)).toDF("k", "n"), keys = Seq("k"),
      mergeSchema = true)
    val after = t.read.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after == Map(1 -> 10L, 2 -> 2200000000L, 3 -> 3000000000L,
      4 -> 40L))
  }

  test("widening without mergeSchema refuses; incompatible changes always refuse") {
    import spark.implicits._
    val t = ParquetTable(spark, tmp())
    t.overwrite(Seq((1, 10)).toDF("k", "n"))
    val e1 = intercept[IllegalArgumentException] {
      t.append(Seq((2, 20L)).toDF("k", "n"))
    }
    assert(e1.getMessage.contains("widen"))
    val e2 = intercept[IllegalArgumentException] {
      t.append(Seq((2, "oops")).toDF("k", "n"), mergeSchema = true)
    }
    assert(e2.getMessage.contains("incompatible"))
  }

  test("renameColumn: metadata-only, appends/merges under the new name, old versions time-travel under old names") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = ParquetTable(spark, tmp())
    val v1 = t.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    def dataNodes(): Long = {
      val w = java.nio.file.Files.walk(
        java.nio.file.Paths.get(t.rootPath, "d"))
      try w.count() finally w.close()
    }
    val before = dataNodes()
    t.renameColumn("v", "name")
    assert(dataNodes() == before, "rename must write zero data")
    assert(t.read.columns.toSeq == Seq("k", "name"))
    assert(t.read.collect().map(r => r.getInt(0) -> r.getString(1)).toMap ==
      Map(1 -> "a", 2 -> "b"))
    // history: the rename is an audited commit; time travel keeps the
    // OLD name on the pre-rename version
    assert(t.history.head.op == "rename(v->name)")
    assert(t.readVersion(v1).columns.toSeq == Seq("k", "v"))
    // appends and merges address the NEW logical name
    t.append(Seq((3, "c")).toDF("k", "name"))
    t.merge(Seq((2, "B"), (4, "d")).toDF("k", "name"), keys = Seq("k"))
    assert(t.read.collect().map(r => r.getInt(0) -> r.getString(1)).toMap ==
      Map(1 -> "a", 2 -> "B", 3 -> "c", 4 -> "d"))
    // delete by the new name; predicates on the old name must fail
    t.delete(col("name") === "a")
    assert(t.read.count() == 3)
    intercept[Exception] { t.append(Seq((9, "x")).toDF("k", "v")) }
    // compaction heals the physical layout (files rewritten under the
    // logical name) and everything still reads identically
    t.compact(1)
    assert(t.read.columns.toSeq == Seq("k", "name"))
    assert(t.read.collect().map(r => r.getInt(0) -> r.getString(1)).toMap ==
      Map(2 -> "B", 3 -> "c", 4 -> "d"))
    // restore across the rename boundary resurrects the OLD schema
    val nv = t.restore(v1)
    assert(t.read.columns.toSeq == Seq("k", "v") && nv > 0)
  }

  test("rename composes with widening and added columns in one lineage") {
    import spark.implicits._
    val t = ParquetTable(spark, tmp())
    t.overwrite(Seq((1, 10)).toDF("k", "n"))
    t.renameColumn("n", "qty")
    // widen the RENAMED column and add a new one in the same append
    t.append(Seq((2, 5000000000L, "x")).toDF("k", "qty", "tag"),
      mergeSchema = true)
    assert(t.read.schema("qty").dataType ==
      org.apache.spark.sql.types.LongType)
    val rows = t.read.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))).toMap
    assert(rows == Map(1 -> ((10L, null)), 2 -> ((5000000000L, "x"))))
    // the stats-pruned merge path works through the phys mapping
    t.merge(Seq((1, 11L, "y")).toDF("k", "qty", "tag"), keys = Seq("k"))
    assert(t.read.filter(org.apache.spark.sql.functions.col("k") === 1)
      .collect()(0).getLong(1) == 11L)
  }

  test("evolution composes with delete, compaction and the stats-pruned paths") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = ParquetTable(spark, tmp(), statsColumns = Seq("k"))
    t.overwrite((1 to 8).map(i => (i, s"v$i")).toDF("k", "v").repartition(4))
    t.append((9 to 12).map(i => (i, s"v$i", i * 10L)).toDF("k", "v", "score"),
      mergeSchema = true)
    // delete over the evolved union (predicate on an OLD column)
    t.delete(col("k") === 3)
    // and a predicate on the NEW column: null rows (old files) are kept
    t.delete(col("score") === 90L)
    assert(t.read.count() == 10)
    // compaction rewrites the union and keeps the evolved schema
    t.compact(2)
    assert(t.read.columns.toSeq == Seq("k", "v", "score"))
    assert(t.read.count() == 10)
    val scores = t.read.collect()
      .map(r => r.getInt(0) -> !r.isNullAt(2)).toMap
    assert((1 to 8).filter(_ != 3).forall(i => !scores(i)))
    assert(Seq(10, 11, 12).forall(i => scores(i)))
  }
}
