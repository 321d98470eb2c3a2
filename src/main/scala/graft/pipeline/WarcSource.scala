package graft.pipeline

import java.sql.Timestamp

import graft.kernel.Warc
import graft.model.Page
import org.apache.spark.sql.{Dataset, SparkSession}

/** Page-table source over WARC files (the on-disk format of Common-Crawl-
  * style corpora): `response` records become Page rows (url = the
  * WARC-Target-URI, warc_ts = WARC-Date, html = the HTTP entity bytes).
  *
  * Scale notes: `binaryFile` yields one task per WARC file — Common Crawl
  * ships ~1 GB files in the tens of thousands per crawl, so file-level
  * parallelism saturates a cluster without splitting; per-record-gzip
  * members are NOT offset-splittable anyway (the standard layout), which
  * is why real pipelines parallelize by file or by a megawarc index. The
  * record parse is streaming (one record in memory at a time inside the
  * iterator), and malformed/truncated tails yield the records they have
  * instead of failing the task. */
object WarcSource {

  def pages(spark: SparkSession, pathPattern: String): Dataset[Page] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathPattern)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        Warc.records(bytes)
          .filter(r => r.warcType.equalsIgnoreCase("response") && r.targetUri.nonEmpty)
          .map { r =>
            Page(
              url = r.targetUri,
              warc_ts = new Timestamp(r.dateMillis),
              html = r.httpPayload,
              text = "",
              lang = "")
          }
      }
  }
}
