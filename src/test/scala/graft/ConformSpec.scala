package graft

import graft.engine.meta.{ColumnMeta, TableMeta, TypeMap}
import graft.engine.ops.Conform
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Metadata / type-dialect / conformance behavior (SURVEY §1, §2.2).
  * Property checks are hand-rolled over ScalaCheck Gens (the
  * scalatest↔scalacheck bridge artifact isn't in the offline cache). */
class ConformSpec extends AnyFunSuite with SparkFixture {

  private def forAllSampled[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (1 to n).foreach(i => gen.sample.foreach(f))

  private val leafTypes: Seq[DataType] = Seq(StringType, IntegerType,
    LongType, ShortType, ByteType, FloatType, DoubleType, BooleanType,
    DateType, TimestampType, BinaryType, DecimalType(12, 2),
    DecimalType(38, 18))

  private val genType: Gen[DataType] = {
    val leaf = Gen.oneOf(leafTypes)
    def nested(depth: Int): Gen[DataType] =
      if (depth == 0) leaf
      else Gen.frequency(
        4 -> leaf,
        1 -> nested(depth - 1).map(ArrayType(_)),
        1 -> Gen.zip(leaf, nested(depth - 1)).map { case (k, v) => MapType(k, v) },
        1 -> Gen.listOfN(2, nested(depth - 1)).map(ts =>
          StructType(ts.zipWithIndex.map { case (t, i) =>
            StructField(s"f$i", t) })))
    nested(2)
  }

  test("TypeMap round-trips every representable Spark type") {
    forAllSampled(genType) { dt =>
      assert(TypeMap.toSpark(TypeMap.fromSpark(dt)) === dt)
    }
  }

  test("TypeMap maps the reference's agnostic names") {
    assert(TypeMap.toSpark("character") === StringType)
    assert(TypeMap.toSpark("datetime") === TimestampType)
    assert(TypeMap.toSpark("decimal(12,2)") === DecimalType(12, 2))
    assert(TypeMap.toSpark("array<float>") === ArrayType(FloatType))
    assert(TypeMap.toSpark("map<character,long>") ===
      MapType(StringType, LongType))
    assert(TypeMap.toSpark("struct<a:int,b:array<double>>") ===
      StructType(Seq(StructField("a", IntegerType),
        StructField("b", ArrayType(DoubleType)))))
    assertThrows[IllegalArgumentException](TypeMap.toSpark("wibble"))
  }

  test("TableMeta JSON round-trips") {
    val meta = TableMeta("t", Seq(
      ColumnMeta("a", "long", Some("key")),
      ColumnMeta("b", "character"),
      ColumnMeta("c", "array<float>")),
      location = Some("file:///tmp/t"), partitions = Seq("a"))
    assert(TableMeta.fromJson(meta.toJson) === meta)
    assertThrows[IllegalArgumentException](TableMeta.fromJson("{}"))
  }

  test("conform imposes order, types, and drops surplus columns") {
    val df = Tables.lineitem(spark, sf)
    val conformed = Conform.conform(df, Projections.lineitemSlim)
    assert(conformed.columns.toSeq ===
      Projections.lineitemSlim.columns.map(_.name))
    assert(conformed.schema("l_linenumber").dataType === LongType)
    assert(conformed.schema("l_quantity").dataType === DecimalType(12, 2))
    assert(conformed.schema("l_shipdate").dataType === DateType)
    assert(conformed.count() === df.count())
    assert(Conform.violations(conformed, Projections.lineitemSlim).isEmpty)
  }

  test("conform is idempotent") {
    val df = Tables.lineitem(spark, sf)
    val once = Conform.conform(df, Projections.lineitemSlim)
    val twice = Conform.conform(once, Projections.lineitemSlim)
    assert(once.schema === twice.schema)
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("conform fails loudly on missing columns; lenient fills nulls") {
    val df = Tables.lineitem(spark, sf).drop("l_quantity")
    assertThrows[IllegalArgumentException](
      Conform.conform(df, Projections.lineitemSlim))
    val lenient = Conform.conformLenient(df, Projections.lineitemSlim)
    assert(lenient.schema("l_quantity").dataType === DecimalType(12, 2))
    assert(lenient.filter("l_quantity IS NOT NULL").count() === 0)
  }

  test("conformSafe quarantines bad values as nulls (ANSI-safe ingest)") {
    import org.apache.spark.sql.functions._
    import graft.engine.meta.{ColumnMeta, TableMeta}
    val spark2 = spark
    import spark2.implicits._
    val dirty = Seq(("1", "12.50"), ("2", "oops"), ("3", "7"))
      .toDF("id", "amount")
    val meta = TableMeta("t", Seq(
      ColumnMeta("id", "long"), ColumnMeta("amount", "decimal(10,2)")))
    // plain conform THROWS under ANSI on the bad value
    assertThrows[Exception](
      Conform.conform(dirty, meta).collect())
    val safe = Conform.conformSafe(dirty, meta).orderBy("id").collect()
    assert(safe.map(_.get(1) == null).toSeq === Seq(false, true, false))
    assert(safe(0).getDecimal(1).toPlainString === "12.50")
  }

  test("corrupt CSV rows are quarantined, not fatal (PERMISSIVE mode)") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_test/csv_${System.nanoTime()}"
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.csv"),
      "id,amount\n1,10.5\nnot-a-number-row-with,too,many,cols\n3,30.25\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("amount",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType)))
    val df = spark.read.schema(schema).option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    assert(df.filter("_corrupt_record IS NOT NULL").count() === 1)
    assert(df.filter("_corrupt_record IS NULL").count() === 2)
  }

  test("violations reports mistyped/surplus/missing/misordered") {
    val df = Tables.lineitem(spark, sf)
    val v = Conform.violations(df, Projections.lineitemSlim)
    assert(v.exists(_.contains("surplus")))
    assert(v.exists(_.contains("expected")))
    val empty = TableMeta("e", Seq(ColumnMeta("nope", "int")))
    assert(Conform.violations(df, empty).exists(_.contains("missing")))
  }

  private object Projections {
    val lineitemSlim: TableMeta = graft.queries.Projections.lineitemSlim
  }
}
