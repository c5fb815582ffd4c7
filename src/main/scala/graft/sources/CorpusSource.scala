package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Corpus sources — every entry point that can feed `IndexBuilder.build`
  * or `IncrementalIndexer.ingest`, all validated against the ONE corpus
  * contract (BASELINE.json input_hint):
  *
  *   corpus(repo STRING, path STRING, commit STRING, lang STRING,
  *          content STRING)
  *
  * The production source at 10^12-file scale is an **Iceberg table** of
  * source-code repositories, read through Spark's DataSourceV2 (the
  * `iceberg` format, apache/iceberg spark-runtime). Iceberg is what makes
  * the scale story work end to end:
  *
  *   - **manifest-level pruning**: filters on `repo`/`lang` prune whole
  *     data files from the scan via partition + column stats in the
  *     manifest lists, before any executor reads a byte — `build` over a
  *     repo subset never scans the other 10^12−x rows;
  *   - **snapshot isolation**: a build pins one snapshot id, so a
  *     multi-hour 4N-executor build reads a consistent table while
  *     ingest keeps committing;
  *   - **incremental reads**: the changelog between two snapshot ids is
  *     exactly the delta `IncrementalIndexer.ingest` wants — the 10^12-row
  *     freshness anti-join collapses to reading only appended rows.
  *
  * This sandbox has no Iceberg runtime jar (offline resolver), so the
  * Iceberg readers below are compile-checked but exercised against
  * parquet twins of the same schema; the format string and read options
  * used are the public, documented Iceberg Spark options. Everything
  * downstream of the source (builder, searcher, pipeline ops) sees only
  * the validated DataFrame and is source-agnostic.
  */
object CorpusSource {

  /** The corpus contract: column names and types, in canonical order. */
  val Schema: StructType = StructType(Seq(
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("lang", StringType),
    StructField("content", StringType)))

  /** Optional columns the builder honors when present: a precomputed
    * content sha (skips re-hashing 10^12 rows) and the per-doc branch
    * (schema-optional `branch:` support, IndexBuilder:118-123). Kept in
    * canonical positions after the required five; both must be STRING.
    */
  val OptionalColumns: Seq[String] = Seq("contentSha", "branch")

  /** Validate an arbitrary frame against the contract: all five required
    * columns present with string type; known optional columns kept (and
    * type-checked), unknown extras dropped; canonical order. Fails fast
    * with the full diff of what is missing/mistyped — a schema drift in a
    * 10^12-row table must die at plan time, not at task 40 000.
    */
  def validated(df: DataFrame): DataFrame = {
    val have = df.schema.map(f => f.name -> f.dataType).toMap
    val optional = OptionalColumns.filter(have.contains)
    val problems = Schema.flatMap { f =>
      have.get(f.name) match {
        case None => Some(s"missing column ${f.name} STRING")
        case Some(t) if t != f.dataType =>
          Some(s"column ${f.name}: expected ${f.dataType.sql}, got ${t.sql}")
        case _ => None
      }
    } ++ optional.filter(have(_) != StringType)
      .map(c => s"optional column $c: expected STRING, got ${have(c).sql}")
    require(problems.isEmpty,
      s"corpus schema mismatch: ${problems.mkString("; ")} " +
        s"(contract: ${Schema.map(f => f.name).mkString(", ")})")
    df.select((Schema.map(f => col(f.name)) ++ optional.map(col)): _*)
  }

  /** Production source: an Iceberg table, optionally pinned to a snapshot
    * (every distributed build SHOULD pin one — plan-time consistency for
    * the whole N/4N run). `table` is a catalog-qualified name
    * (`catalog.db.corpus`). Predicate pushdown on repo/lang reaches the
    * manifest level; column pruning means a path-only query never ships
    * `content`.
    */
  def iceberg(spark: SparkSession, table: String,
              snapshotId: Option[Long] = None): DataFrame = {
    val reader = spark.read.format("iceberg")
    val pinned = snapshotId.fold(reader)(id =>
      reader.option("snapshot-id", id.toString))
    validated(pinned.load(table))
  }

  /** Incremental source: rows APPENDED between two snapshots — the input
    * shape `IncrementalIndexer.ingest` consumes. At 10^12 rows this is
    * the difference between re-scanning the table per ingest cycle and
    * reading only the new files' manifests.
    */
  def icebergIncremental(spark: SparkSession, table: String,
                         fromSnapshotExclusive: Long,
                         toSnapshotInclusive: Long): DataFrame =
    validated(spark.read.format("iceberg")
      .option("start-snapshot-id", fromSnapshotExclusive.toString)
      .option("end-snapshot-id", toSnapshotInclusive.toString)
      .load(table))

  /** Sandbox twin: a parquet directory/file already in corpus shape. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    validated(spark.read.parquet(path))

  /** Sandbox twin: the driver's documents table mapped into corpus shape
    * (source→repo, synthetic doc path, content-sha commit).
    */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    // contentSha is exported alongside commit (its prefix): the builder
    // honors a precomputed sha, so the docs stage no longer re-hashes
    // every content byte a second time (r6; codegen subexpression
    // elimination computes the sha2 once for both columns)
    validated(spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("source").as("repo"),
        concat(lit("doc/"), col("doc_id")).as("path"),
        substring(sha2(col("text"), 256), 1, 40).as("commit"),
        col("lang"),
        col("text").as("content"),
        sha2(col("text"), 256).as("contentSha")))
}
