package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.SimilarityOps

/** The native DotFold expression must be BIT-identical to its HOF twin —
  * that equivalence is what lets the cosine operators keep their DuckDB
  * oracle rows after switching to the codegen'd path. Compared via raw
  * doubleToLongBits, not tolerance. */
class DotFoldSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def randVec(n: Int): Array[Float] =
    Array.fill(n)((rnd.nextFloat() - 0.5f) * math.pow(10, rnd.nextInt(7) - 3).toFloat)

  test("bit parity with the HOF twin on random float vectors") {
    val rows = Seq.tabulate(200)(i => (i.toLong, randVec(64), randVec(64)))
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      SimilarityOps.dot(col("a"), col("b")).as("native"),
      SimilarityOps.dotHof(col("a"), col("b")).as("hof"),
      SimilarityOps.cosine(col("a"), col("b")).as("ncos"),
      (SimilarityOps.dotHof(col("a"), col("b")) /
        (sqrt(SimilarityOps.dotHof(col("a"), col("a"))) *
         sqrt(SimilarityOps.dotHof(col("b"), col("b"))))).as("hcos"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"dot bits differ: $r")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), s"cosine bits differ: $r")
    }
  }

  test("null semantics match the HOF twin: null array, null element, length mismatch, empty") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("b", ArrayType(FloatType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(null, Array(1.0f, 2.0f)),                       // null array
      Row(Array(1.0f, 2.0f), null),
      Row(Seq(1.0f, null, 3.0f), Seq(1.0f, 1.0f, 1.0f)),  // null element
      Row(Array(1.0f, 2.0f), Array(1.0f)),                // length mismatch
      Row(Array.empty[Float], Array.empty[Float]),        // empty -> 0.0
      Row(Array(2.0f), Array(3.0f)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map {
        case Row(a: Array[Float], b: Array[Float]) => Row(a.toSeq, b.toSeq)
        case Row(a: Array[Float], null) => Row(a.toSeq, null)
        case Row(null, b: Array[Float]) => Row(null, b.toSeq)
        case r => r
      }), schema)
    val got = df.select(
      SimilarityOps.dot(col("a"), col("b")).as("native"),
      SimilarityOps.dotHof(col("a"), col("b")).as("hof")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"value mismatch: $r")
    }
    assert(got(0).isNullAt(0) && got(2).isNullAt(0) && got(3).isNullAt(0))
    assert(!got(4).isNullAt(0) && got(4).getDouble(0) == 0.0)
    assert(got(5).getDouble(0) == 6.0)
  }

  test("double-array side (LSH plane weights) matches the mixed cast form") {
    val df = Seq((Array(1.5f, -2.0f, 3.25f), Array(1.0, -1.0, 1.0))).toDF("e", "w")
    val twin = aggregate(zip_with(col("e"), col("w"),
      (x, wi) => x.cast("double") * wi), lit(0.0), (acc, x) => acc + x)
    val r = df.select(SimilarityOps.dot(col("e"), col("w")).as("n"), twin.as("h")).head()
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  test("interpreted (non-codegen) eval path agrees with codegen") {
    val df = Seq((Array(1.1f, 2.2f, 3.3f), Array(4.4f, 5.5f, 6.6f))).toDF("a", "b")
    val withCg = df.select(SimilarityOps.dot(col("a"), col("b"))).head().getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val noCg = df.select(SimilarityOps.dot(col("a"), col("b"))).head().getDouble(0)
      assert(java.lang.Double.doubleToLongBits(withCg) ==
        java.lang.Double.doubleToLongBits(noCg))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
