package graft.pipeline

import java.net.URI

import graft.kernel.Warc
import graft.model.DocResult
import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset

/** WET-style sink: write extracted text back out as WARC `conversion`
  * records (the format Common Crawl publishes extracted text in), one
  * per-record-gzip `.warc.wet.gz` file per partition.
  *
  * Files are written through the Hadoop FileSystem API so the sink works
  * against HDFS/object stores as well as local paths. Each task writes to
  * a temporary file and RENAMES it into place on success — a retried or
  * speculated task re-creates the same final name, so the output stays
  * one complete file per partition (rename-on-commit, the same idempotency
  * device FileOutputCommitter uses). */
object WarcSink {

  def writeWet(docs: Dataset[DocResult], dir: String): Unit = {
    val dirStr = dir
    docs.foreachPartition { (it: Iterator[DocResult]) =>
      val part = TaskContext.getPartitionId()
      val attempt = TaskContext.get().taskAttemptId()
      val conf = new org.apache.hadoop.conf.Configuration()
      val fs = org.apache.hadoop.fs.FileSystem.get(URI.create(dirStr), conf)
      val finalPath = new org.apache.hadoop.fs.Path(
        dirStr, f"part-$part%05d.warc.wet.gz")
      val tmpPath = new org.apache.hadoop.fs.Path(
        dirStr, f".part-$part%05d.warc.wet.gz.$attempt%d.tmp")
      val out = fs.create(tmpPath, true)
      try {
        it.foreach { d =>
          val text = if (d.extracted_text == null) "" else d.extracted_text
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val headers = Map(
            "WARC-Type" -> "conversion",
            "WARC-Target-URI" -> d.url,
            "WARC-Date" -> java.time.Instant
              .ofEpochMilli(d.warc_ts.getTime).toString,
            "Content-Type" -> "text/plain")
          out.write(Warc.write(Seq((headers, body)), gzipPerRecord = true))
        }
      } finally out.close()
      fs.delete(finalPath, false) // replace any earlier attempt's output
      fs.rename(tmpPath, finalPath)
      ()
    }
  }
}
