package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CdcChunking

/** Round-15 fifth wave: the Gear-hash content-defined chunker. */
class CdcChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def boundsOf(t: String): Seq[Int] =
    Seq(t).toDF("nt").select(CdcChunking.boundsFromNt.as("bs"))
      .collect().head.getSeq[Int](0)

  test("spark window boundaries match the python ground truth") {
    assert(boundsOf("small ring red widget blue bolt") == Seq(24, 31))
  }

  test("chunks reassemble to the original text") {
    val docs = graft.util.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    val nt = docs.select(CdcChunking.cdcText(col("text")).as("nt"))
      .where(length(col("nt")) > 0)
    val bad = nt
      .withColumn("cks", CdcChunking.chunksFromNt)
      .where(concat_ws("", col("cks")) =!= col("nt"))
      .count()
    assert(bad == 0, "every document must equal its chunk concatenation")
  }

  test("compiled kernel == declarative SQL spelling on real docs") {
    val docs = graft.util.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    val nt = docs.select(CdcChunking.cdcText(col("text")).as("nt"))
      .where(length(col("nt")) > 0)
    val diff = nt
      .withColumn("k", CdcChunking.chunksFromNt)
      .withColumn("s", CdcChunking.chunksFromNtSql)
      .where(col("k") =!= col("s"))
      .count()
    assert(diff == 0, "kernel must match the oracle-mirrored spelling")
  }

  test("CDC is shift-resistant where fixed-size chunking is not") {
    val shared = CdcChunking.Boiler * 2 // long enough to span chunks
    val docs = Seq(
      (0L, "tiny prefix" + shared),
      (1L, "a much much much longer prefix than the first document has " +
        shared)).toDF("doc_id", "text")
    def hashes(chunks: org.apache.spark.sql.Column) = docs
      .select(col("doc_id"), CdcChunking.cdcText(col("text")).as("nt"))
      .select(col("doc_id"), explode(chunks).as("ck"))
      .select(col("doc_id"), md5(col("ck")).as("h"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    val cdc = hashes(CdcChunking.chunksFromNt)
    val fixed = hashes(CdcChunking.fixedChunksExpr(64))
    val cdcShared = (cdc(0L) & cdc(1L)).size
    val fixedShared = (fixed(0L) & fixed(1L)).size
    assert(cdcShared >= 2,
      s"CDC must re-find the shared passage's chunks, got $cdcShared")
    assert(fixedShared == 0,
      s"fixed-size chunks cannot align across shifted prefixes, " +
        s"got $fixedShared")
    assert(cdcShared > fixedShared)
  }

  test("corpus audit: CDC duplicate fraction beats fixed-size on planted boilerplate") {
    val docs = graft.util.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    val out = CdcChunking.audit(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("cdc") > out("fixed"),
      s"cdc=${out("cdc")} fixed=${out("fixed")}")
  }
}
