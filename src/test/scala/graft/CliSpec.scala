package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** End-to-end CLI cycle on temp dirs: receive → FHIR ETL (dry-run, then
  * commit) → idempotent second cycle → view refresh — the reference's
  * operational loop (`id3c receive`, `id3c etl fhir --commit`,
  * `refresh-materialized-view`) against the library.
  */
class CliSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-cli").toString

  private val bundle =
    """{"resourceType":"Bundle","type":"collection","entry":[
      |{"fullUrl":"urn:uuid:p1","resource":{"resourceType":"Patient","gender":"female",
      | "identifier":[{"system":"https://seattleflu.org/individual","value":"ind-1"}]}},
      |{"fullUrl":"urn:uuid:e1","resource":{"resourceType":"Encounter",
      | "identifier":[{"system":"https://seattleflu.org/encounter","value":"enc-1"}],
      | "period":{"start":"2020-01-05T00:00:00Z"},
      | "subject":{"reference":"urn:uuid:p1"},
      | "location":[{"location":{"identifier":{"system":"https://seattleflu.org/site","value":"site-1"}}}]}}
      |]}""".stripMargin.replaceAll("\n", "")

  test("receive appends with continuing ids; etl-fhir honors dry-run then commits idempotently") {
    val feedDir = tmp() + "/fhir"
    val outDir = tmp() + "/delta"
    val nd1 = tmp() + "/a.ndjson"
    val nd2 = tmp() + "/b.ndjson"
    Files.writeString(java.nio.file.Path.of(nd1), bundle + "\n")
    Files.writeString(java.nio.file.Path.of(nd2), bundle + "\n" + bundle + "\n")

    Cli.receive(spark, feedDir, nd1)
    Cli.receive(spark, feedDir, nd2)
    val feed = spark.read.parquet(feedDir)
    assert(feed.count() == 3)
    assert(feed.agg(max(col("id"))).head().getLong(0) == 3L)

    // dry-run: full pipeline, no writes take effect
    Cli.etlFhir(spark, feedDir, "-", "-", outDir, dryRun = true)
    assert(!new java.io.File(outDir + "/encounters").exists())
    assert(spark.read.parquet(feedDir)
      .filter(size(col("processing_log")) > 0).count() == 0)

    // commit: deltas written, feed marked
    Cli.etlFhir(spark, feedDir, "-", "-", outDir, dryRun = false)
    assert(spark.read.parquet(outDir + "/encounters").count() == 3)
    assert(spark.read.parquet(outDir + "/statuses")
      .filter(col("status") === "processed").count() == 3)
    assert(spark.read.parquet(feedDir)
      .filter(size(col("processing_log")) > 0).count() == 3)

    // second cycle: nothing unprocessed → empty deltas (idempotence)
    Cli.etlFhir(spark, feedDir, "-", "-", outDir, dryRun = false)
    assert(spark.read.parquet(outDir + "/encounters").count() == 0)
  }

  test("refresh-view materializes pa_v1 from warehouse parquet") {
    import spark.implicits._
    val wh = tmp()
    Seq((1L, "S1"), (2L, "S2")).toDF("sample_id", "identifier")
      .write.parquet(wh + "/sample")
    Seq((1L, 0L, true), (2L, 1L, false))
      .toDF("sample_id", "target_id", "present")
      .write.parquet(wh + "/presence_absence")
    Seq((0L, "T0", false), (1L, "T1", true))
      .toDF("target_id", "identifier", "control")
      .write.parquet(wh + "/target")
    val out = tmp() + "/pa_v1"
    Cli.refreshView(spark, wh, "pa_v1", out, dryRun = false)
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    // control target T1 is filtered; only sample S1 × T0 remains
    assert(got == Set(("S1", "T0", true)))
  }

  test("mint writes n codes distinct from the existing set") {
    import spark.implicits._
    val existingDir = tmp() + "/existing"
    Seq("aaaaaaaa", "bbbbbbbb").toDF("code").write.parquet(existingDir)
    val out = tmp() + "/minted"
    Cli.mint(spark, existingDir, 5, out, seed = Some(42L))
    val minted = spark.read.parquet(out).select("code")
      .collect().map(_.getString(0)).toSeq
    assert(minted.size == 5 && minted.distinct.size == 5)
    assert(!minted.contains("aaaaaaaa"))
  }

  test("get-sample resolves barcode → identifier uuid → sample row") {
    import spark.implicits._
    val identDir = tmp() + "/identifiers"
    val samplesDir = tmp() + "/samples"
    Seq(("abcdefgh", "u-1", "samples"), ("ijklmnop", "u-2", "collections"))
      .toDF("barcode", "uuid", "set_name").write.parquet(identDir)
    Seq((1L, "u-1", "u-2"), (2L, "u-9", "u-8"))
      .toDF("sample_id", "identifier", "collection_identifier")
      .write.parquet(samplesDir)

    val byIdent = Cli.getSample(spark, identDir, samplesDir, "abcdefgh",
      byCollection = false)
    assert(byIdent.size == 1 && byIdent.head.contains("\"sample_id\":1"))
    // collection route: ijklmnop → u-2 → the same sample's collection key
    val byColl = Cli.getSample(spark, identDir, samplesDir, "ijklmnop",
      byCollection = true)
    assert(byColl.size == 1 && byColl.head.contains("\"sample_id\":1"))
    // unknown barcode → empty (the CLI maps this to exit 1 / 404)
    assert(Cli.getSample(spark, identDir, samplesDir, "zzzzzzzz",
      byCollection = false).isEmpty)
  }

  test("manifest-diff emits only records whose content hash is new") {
    val a = tmp() + "/old.ndjson"
    val b = tmp() + "/new.ndjson"
    Files.writeString(java.nio.file.Path.of(a),
      """{"barcode":"b1","v":"x","_provenance":{"row":1}}""" + "\n")
    Files.writeString(java.nio.file.Path.of(b),
      """{"barcode":"b1","v":"x","_provenance":{"row":9}}""" + "\n" +
        """{"barcode":"b2","v":"y","_provenance":{"row":2}}""" + "\n")
    val out = tmp() + "/diff"
    Cli.manifestDiff(spark, a, b, out)
    val got = spark.read.json(out).select("barcode")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("b2")) // b1 unchanged despite different provenance
  }

  test("Users: create / grant / reset-password / ls, wired into sample RLS") {
    import graft.etl.Users
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(Seq(StructField("name", StringType),
      StructField("description", StringType),
      StructField("password_hash", StringType)))
    val empty = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](), schema)
    import spark.implicits._
    val noGrants = Seq.empty[(String, String)].toDF("name", "role")

    var users = Users.createUser(empty, "alice", Some("epi analyst"))
    users = Users.createUser(users, "bob")
    intercept[IllegalArgumentException] { Users.createUser(users, "alice") }

    var grants = Users.grantRoles(noGrants, "alice",
      Seq("reporter", "hcov19-visibility"))
    grants = Users.grantRoles(grants, "alice", Seq("reporter")) // no-op re-grant
    grants = Users.grantRoles(grants, "bob", Seq("reporter"))
    assert(grants.count() == 3)

    users = Users.resetPassword(users, "alice", "s3cret")
    val hash = users.filter(col("name") === "alice")
      .select("password_hash").head.getString(0)
    assert(hash != null && hash.length == 64 && hash != "s3cret")
    intercept[IllegalArgumentException] {
      Users.resetPassword(users, "mallory", "x")
    }

    val ls = Users.listUsers(users, grants).collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[String](2)))
    assert(ls.toSeq == Seq(
      ("alice", "epi analyst", Seq("hcov19-visibility", "reporter")),
      ("bob", null, Seq("reporter"))), ls.toSeq)

    // RLS integration: alice (has hcov19-visibility) sees the restricted
    // sample; bob does not; access_role-null rows are visible to both
    val samples = Seq(("s1", null: String), ("s2", "hcov19-visibility"))
      .toDF("sample", "access_role")
    def visible(u: String) = graft.shipping.Views
      .sampleVisibleTo(samples, Users.rolesOf(grants, u))
      .select("sample").collect().map(_.getString(0)).toSet
    assert(visible("alice") == Set("s1", "s2"))
    assert(visible("bob") == Set("s1"))
  }

  test("explain prints the formatted physical plan for any gate query") {
    val lines = Cli.explain(spark, "q1_agg", "/root/testdata/sf0.001",
      formatted = true)
    assert(lines.exists(_.contains("== Physical Plan ==")), lines.take(5))
    assert(lines.exists(_.contains("HashAggregate")), lines.take(30))
    // the formatted mode carries the scan detail PlanAuditSpec pins
    assert(lines.exists(l => l.contains("PushedFilters") ||
      l.contains("ReadSchema")), "scan detail missing")
    val bad = Cli.explain(spark, "nope", "/root/testdata/sf0.001",
      formatted = true)
    assert(bad.head.startsWith("unknown query"))
  }
}
