package graft.pipeline

import java.nio.file.Files

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY.md §4.2/§4.3): filters are pushed into
  * the parquet scan, reporting queries never read the heavy columns, the
  * relational prologue sits before the opaque typed kernel node, and the
  * operators broadcast/shuffle where intended. These lock the 100 TB plan
  * shape at test time, not just the row values. */
class PlanSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-plan-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val corpus: String = {
    val dir = Files.createTempDirectory("graft_plan_corpus_").toString
    SynthSource.writeCorpus(spark, 500L, 42L, dir)
    dir
  }

  private lazy val outDir: String = {
    val dir = Files.createTempDirectory("graft_plan_out_").toString
    ExtractJob.run(spark, spark.read.parquet(corpus), dir, JobConfig(buckets = 8))
    dir
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("lang filter and url non-null are pushed into the parquet scan") {
    val df = ExtractJob.transform(spark, spark.read.parquet(corpus),
      JobConfig(langFilter = Some("en")))
    val p = plan(df.toDF())
    assert(p.contains("PushedFilters"), p.take(800))
    assert(p.contains("IsNotNull(url)"), "url non-null not pushed:\n" + p.take(1200))
    assert(p.contains("EqualTo(lang,en)"), "lang filter not pushed:\n" + p.take(1200))
  }

  test("extraction hot path is narrow: no shuffle before the kernel") {
    val df = ExtractJob.transform(spark, spark.read.parquet(corpus), JobConfig())
    val p = plan(df.toDF())
    val exchangeIdx = p.indexOf("Exchange")
    val kernelIdx = p.indexOf("MapPartitions")
    assert(kernelIdx >= 0, "kernel node missing")
    // either no exchange at all, or only above (after) the kernel in the tree
    assert(exchangeIdx < 0, s"unexpected shuffle in transform plan:\n${p.take(1500)}")
  }

  test("resume bucket pruning happens before the typed kernel boundary") {
    val df = ExtractJob.transform(spark, spark.read.parquet(corpus), JobConfig(),
      doneBucketList = Seq(1, 2, 3))
    val p = plan(df.toDF())
    val filterIdx = p.indexOf(" IN (1,2,3)")
    val kernelIdx = p.indexOf("MapPartitions")
    assert(filterIdx >= 0, "resume NOT-IN filter missing:\n" + p.takeRight(1500))
    // plan prints top-down: the kernel (later stage) appears BEFORE the
    // filter (earlier stage) in the string, so filter index > kernel index
    assert(filterIdx > kernelIdx,
      "resume filter is not below the kernel in the plan:\n" + p.take(1500))
  }

  test("reporting queries read only the cheap columns (column pruning)") {
    val ps = ExtractJob.pageStats(spark, outDir)
    val p = plan(Summary.corpusSummary(ps))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("extracted_text"),
      s"summary scan reads extracted_text: $readSchema")
    assert(!readSchema.contains("spans"), s"summary scan reads spans: $readSchema")
    assert(readSchema.contains("page_stats"), readSchema)
  }

  test("bucket partition pruning on the output table") {
    val docs = ExtractJob.readDocs(spark, outDir).filter(col("bucket") === 3)
    val p = plan(docs)
    // partition filters appear as PartitionFilters in the scan
    assert(p.contains("PartitionFilters") &&
      p.replaceAll("\\s+", " ").contains("(bucket"), p.take(1200))
    assert(docs.count() > 0)
  }

  test("small dimension side of ANN brute-force is broadcast") {
    val e = spark.read.parquet(s"/root/testdata/sf0.001/embeddings.parquet")
    val top = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), "vec_id",
      "embedding", 3)
    assert(plan(top).contains("BroadcastNestedLoopJoin") ||
      plan(top).contains("BroadcastHashJoin"), plan(top).take(1200))
  }

  test("exact dedup aggregates with a partial (map-side) phase") {
    val ev = spark.read.parquet(s"/root/testdata/sf0.001/events.parquet")
    val p = plan(Dedup.exactGroups(ev, "event_id", "props"))
    // partial_min/partial_count markers indicate map-side combine
    assert(p.contains("partial_"), p.take(1200))
  }

  test("minhash candidate join shuffles on the band bucket key") {
    val docs = spark.read.parquet(s"/root/testdata/sf0.001/documents.parquet")
    val p = plan(Dedup.minhashNearDups(docs, "doc_id", "text"))
    // join keys must be the LSH band buckets (the whole point of the
    // candidate-generation design); strategy may be broadcast at tiny scale
    // or sort-merge at real scale — both acceptable, keys are not.
    val joinLine = p.linesIterator.find(_.contains("Join [band#")).getOrElse("")
    assert(joinLine.nonEmpty, "no join keyed on band buckets:\n" +
      p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(joinLine.contains("bucket#"), joinLine)
  }

  test("whole-stage codegen covers the relational operators") {
    // codegen'd stages print with the "*(n)" marker in executedPlan
    val fq = graft.SparkEntry.queries("q01_classify_needs_ocr")(
      spark, "/root/testdata/sf0.001")
    assert(plan(fq).startsWith("*("), plan(fq).take(400))
  }

  test("stratified sampling is a row-local codegen'd filter on the scan " +
    "(no Exchange, no typed boundary, Mix64Expr inside codegen)") {
    val docs = spark.read.parquet(s"/root/testdata/sf0.001/documents.parquet")
    val p = plan(graft.ops.ScalePatterns.stratifiedSample(
      docs, "doc_id", "lang", Map("en" -> 150), defaultPerMille = 300))
    assert(!p.contains("Exchange"), p.take(800))
    assert(!p.contains("DeserializeToObject"), p.take(800))
    assert(p.contains("graft_mix64"), p.take(800))
    assert(p.startsWith("*("), "sampling filter must be codegen'd:\n" + p.take(400))
  }

  test("url canonicalization is row-local (no Exchange, no typed boundary)") {
    val docs = spark.read.parquet(s"/root/testdata/sf0.001/documents.parquet")
    val p = plan(docs.select(
      graft.ops.WebOps.canonicalizeUrl(concat(lit("https://h.example/"),
        col("doc_id").cast("string"))).as("u")))
    assert(!p.contains("Exchange") && !p.contains("DeserializeToObject"),
      p.take(800))
  }

  test("repetition signals are row-local: no Exchange, no typed boundary, " +
    "one codegen'd projection") {
    val docs = spark.read.parquet(s"/root/testdata/sf0.001/documents.parquet")
    val p = plan(graft.ops.TextOps.repetitionSignals(docs, "text"))
    assert(!p.contains("Exchange"), p.take(800))
    assert(!p.contains("DeserializeToObject"), p.take(800))
  }

  test("latest-capture dedup: exactly one shuffle, on the canonical key, " +
    "with a partial (map-side) max_by/count phase") {
    val p = plan(graft.SparkEntry.queries("q49_latest_capture")(
      spark, "/root/testdata/sf0.001"))
    assert("Exchange".r.findAllIn(p).size == 1,
      "expected exactly one shuffle:\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(p.contains("hashpartitioning(canonical_url"),
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(p.contains("partial_max_by") || p.contains("partial_max"),
      p.linesIterator.filter(_.contains("Aggregate")).mkString("\n"))
  }

  test("connected-components star rounds: per-vertex min agg has a partial " +
    "(map-side) phase, shuffles keyed on the vertex, no cartesian product") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val edges = pairs.select(
      greatest(col("id_a"), col("id_b")).as("src"),
      least(col("id_a"), col("id_b")).as("dst"))
    for (round <- Seq(Dedup.largeStar(edges), Dedup.smallStar(edges))) {
      val p = plan(round)
      assert(p.contains("partial_min"), // map-side combine on the min agg
        p.linesIterator.filter(_.contains("Aggregate")).mkString("\n"))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), p.take(800))
      val keys = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
      assert(keys.forall(_.contains("src")), keys.mkString("\n"))
    }
  }

  test("line-level dedup: corpus-scale Exchanges keyed on xxhash64(line) " +
    "or the doc id (never the raw string alone), membership join keyed on " +
    "the hash, ban-list count aggregates with a partial phase, no product") {
    import spark.implicits._
    val df = Seq((1L, "a\nb"), (2L, "a\nc"), (3L, "a")).toDF("id", "text")
    val p = plan(graft.ops.TextOps.dropDuplicatedLines(df, "id", "text", 2))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(800))
    // every shuffle key includes the long hash (line_h) or the doc id —
    // a raw-string-only key would put corpus text volume on the wire
    val keys = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(keys.nonEmpty && keys.forall(l =>
      l.contains("line_h") || l.contains("id")), keys.mkString("\n"))
    // the membership (left outer) join keys on the hash alone; the
    // string-equality residual is an array_contains AFTER the join
    val joins = p.linesIterator.filter(_.contains("LeftOuter")).toSeq
    assert(joins.nonEmpty && joins.forall(_.contains("line_h")),
      joins.mkString("\n"))
    assert(p.contains("partial_count") || p.contains("partial"),
      p.linesIterator.filter(_.contains("Aggregate")).mkString("\n"))
  }

  test("salted per-group top-k: phase-1 window keyed on (group, salt) so " +
    "no single task holds a whole hot group; final window keyed on group") {
    import spark.implicits._
    val df = Seq((1L, "h", 10L), (2L, "h", 20L)).toDF("id", "grp", "score")
    val p = plan(graft.ops.ScalePatterns.saltedTopKPerGroup(
      df, "grp", 2, Seq(col("score").desc, col("id").asc), 4))
    val keys = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(keys.exists(l => l.contains("grp") && l.contains("_salt")),
      "phase-1 (group, salt) exchange missing:\n" + keys.mkString("\n"))
    assert(keys.exists(l => l.contains("grp") && !l.contains("_salt")),
      "final group exchange missing:\n" + keys.mkString("\n"))
  }

  test("dup-gram profile: every Exchange keyed on gram or doc_id, both " +
    "aggregates have partial (map-side) phases, no cartesian product") {
    val p = plan(graft.SparkEntry.queries("q51_dup_ngrams")(
      spark, "/root/testdata/sf0.001"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(800))
    val keys = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(keys.nonEmpty && keys.forall(l =>
      l.contains("gram") || l.contains("doc_id")), keys.mkString("\n"))
    assert(p.contains("partial_count") || p.contains("partial"),
      p.linesIterator.filter(_.contains("Aggregate")).mkString("\n"))
  }

  test("benchmark contamination: the bench gram set is broadcast — the " +
    "corpus membership test has no shuffle on the corpus side") {
    val p = plan(graft.SparkEntry.queries("q52_contamination")(
      spark, "/root/testdata/sf0.001"))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    // the only hash exchanges are the per-doc aggregate (and none keyed
    // on the gram for the corpus side of the join)
    val joins = p.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(joins.isEmpty, s"membership test must not sort-merge: $joins")
  }

  test("quality classifier: the trained weight table is broadcast — the " +
    "exploded corpus never shuffles on the token key at scoring time") {
    val p = plan(graft.SparkEntry.queries("q63_quality_classifier")(
      spark, "/root/testdata/sf0.001"))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    val joins = p.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(joins.isEmpty, s"weight lookup must not sort-merge: $joins")
    // training's token-keyed count and scoring's doc-keyed sum both
    // map-side combine (partial_sum before their Exchanges)
    assert(p.contains("partial_sum") || p.contains("Partial"), p.take(1200))
  }

  test("duplicated-span removal: every join is a keyed equi-join (gram " +
    "fingerprint / doc id) — no product, no nested loop; gram counting " +
    "map-side combines (asserted on the segment pipeline, which the r7 " +
    "materialize-once checkpoint hides from the final plan)") {
    val p = plan(graft.SparkEntry.queries("q64_dup_span_removal")(
      spark, "/root/testdata/sf0.001"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(800))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val seg = plan(Dedup.duplicatedSpanSegments(docs, 8, 12, 2L,
      keepFirst = false))
    assert(!seg.contains("CartesianProduct") &&
      !seg.contains("BroadcastNestedLoop"), seg.take(800))
    assert(seg.contains("partial_count") || seg.contains("Partial"),
      seg.take(1200))
  }

  test("keepFirst span removal: the canonical occurrence is a min-struct " +
    "COMBINER in the gram aggregate — no window/rank over gram " +
    "occurrences (a hot gram must never force a per-key sort), no product " +
    "(asserted on the segment pipeline, which the r7 materialize-once " +
    "checkpoint hides from the final plan)") {
    val p = plan(graft.SparkEntry.queries("q65_dup_span_keep_first")(
      spark, "/root/testdata/sf0.001"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(800))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val seg = plan(Dedup.duplicatedSpanSegments(docs, 8, 12, 2L,
      keepFirst = true))
    assert(!seg.contains("CartesianProduct") &&
      !seg.contains("BroadcastNestedLoop"), seg.take(800))
    // min(struct(doc_id, pos)) must partial-aggregate alongside the count
    assert(seg.contains("partial_min"), seg.take(1200))
    // the ONLY Window in the pipeline is the doc-keyed gaps-and-islands
    // row_number; nothing windows over the gram key
    val windowSpecs = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(seg).map(_.group(1)).toList
    assert(windowSpecs.nonEmpty &&
      windowSpecs.forall(s => s.contains("doc_id") && !s.contains("gram")),
      s"unexpected window partitioning: $windowSpecs")
  }

  test("DSIR: the 4096-row weight table is broadcast to the scorer (the " +
    "exploded corpus never shuffles on the bucket key), learning's " +
    "bucket aggregate map-side combines, and no join is a product") {
    val p = plan(graft.SparkEntry.queries("q69_dsir_scores")(
      spark, "/root/testdata/sf0.001"))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    // the only non-equi join allowed is the single-row broadcast of the
    // (T, R) totals (the q07 percentage-of-total shape)
    assert(!p.contains("CartesianProduct"), p.take(800))
    val bnl = p.linesIterator.filter(_.contains("BroadcastNestedLoop")).size
    assert(bnl <= 1, s"only the totals row may nested-loop, saw $bnl")
    val joins = p.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(joins.isEmpty, s"weight lookup must not sort-merge: $joins")
    // the fixed-B bucket count and the doc-keyed score sum both
    // partial-aggregate before their Exchanges
    assert(p.contains("partial_sum") || p.contains("Partial"), p.take(1200))
  }

  test("bigram LM: both capped lookup tables (pair counts, context " +
    "totals) broadcast to the scorer — the exploded corpus never " +
    "shuffles on the pair key and no join is a product") {
    val p = plan(graft.SparkEntry.queries("q70_bigram_lm_perplexity")(
      spark, "/root/testdata/sf0.001"))
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2, s"expected both LM lookups broadcast, saw $bhj:\n" +
      p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(800))
    val joins = p.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(joins.isEmpty, s"LM lookups must not sort-merge: $joins")
    // pair training and the doc-keyed cost sum partial-aggregate
    assert(p.contains("partial_sum") || p.contains("Partial"), p.take(1200))
  }

  test("perplexity partition: every CDF window ordering by the histogram " +
    "value is PARTITIONED by the coarse bucket (no global unpartitioned " +
    "sort over the value histogram) and no join is a product") {
    val p = plan(graft.SparkEntry.queries("q71_perplexity_partition")(
      spark, "/root/testdata/sf0.001"))
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    val valueOrdered = specs.filter(_.contains("_v#"))
    assert(valueOrdered.nonEmpty, s"expected a within-coarse window:\n$specs")
    assert(valueOrdered.forall(_.contains("_c#")),
      s"value-ordered window must partition by the coarse bucket: $specs")
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("bloom dedup: the filter rides broadcasts (corpus never shuffles " +
    "for membership), the word-keyed build partial-aggregates, and no " +
    "join is a product") {
    val p = plan(graft.SparkEntry.queries("q72_bloom_dedup")(
      spark, "/root/testdata/sf0.001"))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("partial_min") || p.contains("Partial"), p.take(1200))
  }

  test("bm25: idf and corpus stats ride broadcasts (the corpus text " +
    "never shuffles); the top-k is a TakeOrdered, not a global sort") {
    val p = plan(graft.SparkEntry.queries("q73_bm25_topk")(
      spark, "/root/testdata/sf0.001"))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("mixture sampling: the rate table rides a broadcast and the keep " +
    "coin is row-local — the corpus never shuffles") {
    val p = plan(graft.SparkEntry.queries("q74_mixture_sample")(
      spark, "/root/testdata/sf0.001"))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("source reputation: rates ride broadcasts; the corpus-wide rate " +
    "re-aggregates the tiny source table, not the corpus") {
    val p = plan(graft.SparkEntry.queries("q75_source_reputation")(
      spark, "/root/testdata/sf0.001"))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("incremental dedup: exact + near checks are keyed equi-joins " +
    "(hash/band-bucket), never a product of the two snapshots") {
    val p = plan(graft.SparkEntry.queries("q53_incremental_dedup")(
      spark, "/root/testdata/sf0.001"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(800))
    // band-bucket join key present on the near path
    assert(p.contains("band") && p.contains("bucket"), p.take(1200))
  }

  test("normalized dedup: the group aggregate partial-aggregates on the " +
    "md5 key (map-side combine before the wire) and no join is a product") {
    val p = plan(graft.SparkEntry.queries("q76_normalized_dedup")(
      spark, "/root/testdata/sf0.001"))
    assert(p.contains("partial_min") || p.contains("Partial"), p.take(1200))
    assert(p.contains("norm_md5"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("winnow overlap: the candidate join is keyed on the fingerprint " +
    "(never a product) and the stop-fingerprint aggregate partial-" +
    "aggregates before the wire") {
    val p = plan(graft.SparkEntry.queries("q79_winnow_overlap")(
      spark, "/root/testdata/sf0.001"))
    assert(p.contains("fingerprint"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("partial_count") || p.contains("Partial"), p.take(1200))
  }

  test("sequence packing: the tape window is keyed on the shard column — " +
    "no RangePartitioning (global sort) anywhere in the plan") {
    val p = plan(graft.SparkEntry.queries("q77_sequence_packing")(
      spark, "/root/testdata/sf0.001"))
    assert(p.contains("hashpartitioning(shard"), p.take(1200))
    assert(!p.toLowerCase.contains("rangepartitioning"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("star cluster edges: the bucket-rep aggregate partial-aggregates " +
    "min(id) before the wire, the rep join is a (band, bucket) equi-join " +
    "(never a product), and the shuffles carry fixed-width keys") {
    val p = plan(Dedup.minhashClusterEdges(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text", shingleK = 3, numHashes = 32, numBands = 8))
    assert(p.contains("partial_min") || p.contains("Partial"), p.take(1200))
    assert(p.contains("band") && p.contains("bucket"), p.take(1200))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(800))
  }

  test("capped near-dup pairs: the hot-bucket prune is a left-anti " +
    "equi-join on (band, bucket) ahead of the pair self-join — no " +
    "product anywhere") {
    val p = plan(graft.SparkEntry.queries("q84_capped_neardups")(
      spark, "/root/testdata/sf0.001"))
    assert(p.contains("LeftAnti"), p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(800))
  }
}
