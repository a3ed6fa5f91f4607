package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** The per-feed ETL pipelines (reference lib/id3c/cli/command/etl/
  * {enrollments,presence_absence,manifest,kit,consensus_genome}.py) —
  * each feed's per-record resource walk re-expressed as a DataFrame
  * decomposition from a receiving-shaped frame (id, document) to
  * warehouse deltas, sharing the identifier-lookup / sample-resolution
  * joins with [[FhirEtl]].
  *
  * Scale shape shared by every feed: one parse projection per document,
  * explodes keyed by document id, identifier lookups as equi-joins on
  * barcode (AQE broadcasts a small identifier table, shuffles a
  * warehouse-sized one), and per-record skip rules as filters — no
  * driver-side iteration.
  */
object Feeds {

  private def ddl(s: String): DataType = DataType.fromDDL(s)

  // =========================================================== enrollments

  /** enrollments.py:60-414. Validation: schemaVersion must be known
    * (:89-92, hard assert → error status). Graph: site find_or_create
    * (name + type details), individual upsert (participant, assigned sex
    * from the AssignedSex / AssignedSexAirport option response), encounter
    * upsert (id, startTimestamp, age with the ninetyOrAbove cap :245-258,
    * language), ClinicSwab sample codes → collection-identifier sample
    * upserts (:141-199), locations by use → relation (:287-231).
    */
  object Enrollments {
    val EtlName = "enrollments"
    val KnownVersions: Seq[String] = Seq("1.0.0", "1.1.0")
    val RelationByUse: Map[String, String] = Map(
      "home" -> "residence", "work" -> "workplace", "temp" -> "lodging")

    val schema: DataType = ddl(
      "STRUCT<schemaVersion: STRING, id: STRING, participant: STRING, " +
        "startTimestamp: STRING, localeLanguageCode: STRING, " +
        "site: STRUCT<name: STRING, type: STRING>, " +
        "age: STRUCT<value: STRING, ninetyOrAbove: BOOLEAN>, " +
        "sampleCodes: ARRAY<STRUCT<code: STRING, type: STRING>>, " +
        "locations: ARRAY<STRUCT<use: STRING, id: STRING, region: STRING>>, " +
        "responses: ARRAY<STRUCT<question: STRUCT<token: STRING>, " +
        "options: ARRAY<STRUCT<token: STRING>>, " +
        "answer: STRUCT<type: STRING, value: STRING, " +
        "chosenOptions: ARRAY<INT>>>>>")

    /** decode_answer (:371-398) for a single response struct: Option →
      * first chosen option token (what assigned_sex consumes), String/
      * Number → value, Declined → null.
      */
    private def firstAnswer(resp: Column): Column = {
      val a = resp.getField("answer")
      when(a.getField("type") === "Option",
        try_element_at(resp.getField("options"),
          try_element_at(a.getField("chosenOptions"), lit(1)) + 1)
          .getField("token"))
        .when(a.getField("type").isin("String", "Number"), a.getField("value"))
        .otherwise(lit(null).cast("string"))
    }

    private def responseFor(doc: Column, token: String): Column =
      try_element_at(
        filter(coalesce(doc.getField("responses"), array()),
          r => r.getField("question").getField("token") === lit(token)),
        lit(1))

    final case class Delta(
        statuses: DataFrame, // id, status, skip_reason
        sites: DataFrame, // identifier, site_type
        individuals: DataFrame, // identifier, sex
        encounters: DataFrame, // id, identifier, encountered, individual_identifier, site_identifier, age, language
        sampleUpdates: DataFrame, // collection_identifier, encounter_identifier, sample_type
        encounterLocations: DataFrame) // encounter_identifier, relation, location_identifier, tract

    /** Parse at cluster width, checkpointed — ONE parse pass shared by
      * every consumer (decompose's branches, or [[statusReport]]'s fused
      * projection + its ClinicSwab branch).
      */
    private def parsedOf(feed: DataFrame): DataFrame =
      feed.repartition(feed.sparkSession.sparkContext.defaultParallelism,
        col("id")) // parse at cluster width (explicit, AQE-uncoalescible)
        .select(col("id"), from_json(col("document"), schema).as("d"))
        .localCheckpoint(false)

    // assigned_sex (:327-343): fall back to AssignedSexAirport only when
    // the AssignedSex QUESTION is absent — a present-but-declined answer
    // stays null (NoSuchQuestionError vs a None response)
    private def sexCol: Column = {
      val asResp = responseFor(col("d"), "AssignedSex")
      when(asResp.isNotNull, firstAnswer(asResp))
        .otherwise(firstAnswer(responseFor(col("d"), "AssignedSexAirport")))
    }
    // age (:245-258): ninetyOrAbove → "90 years", else float(value) years
    private def ageCol: Column =
      when(col("d.age").isNull, lit(null).cast("string"))
        .when(col("d.age.ninetyOrAbove"), lit("90 years"))
        .otherwise(concat(col("d.age.value").cast("double").cast("string"),
          lit(" years")))

    /** skip_reason column over the parsed frame (:89-92). */
    private def skipReasonCol: Column =
      when(!col("d.schemaVersion").isin(KnownVersions: _*),
        concat(lit("error: unknown schema version "), col("d.schemaVersion")))

    /** The ClinicSwab sample-code branch (:141-199) over a parsed frame. */
    private def sampleUpdatesOf(
        parsed: DataFrame, identifiers: DataFrame): DataFrame = {
      val ident = identifiers.select(col("barcode").as("i_barcode"),
        col("uuid"), col("set_name"))
      parsed.filter(col("d.schemaVersion").isin(KnownVersions: _*))
        .select(col("id"),
          col("d.id").as("encounter_identifier"),
          explode(coalesce(col("d.sampleCodes"), array())).as("sc"))
        .filter(col("sc.code").isNotNull) // :160-163
        .filter(col("sc.type") === "ClinicSwab") // :165-171
        .join(ident, col("sc.code") === col("i_barcode")) // unknown → skip :175-179
        .filter(col("set_name").isin(FhirEtl.expectedCollectionSets: _*))
        .select(col("uuid").as("collection_identifier"),
          col("encounter_identifier"), col("sc.type").as("sample_type"))
    }

    def decompose(feed: DataFrame, identifiers: DataFrame): Delta = {
      // parse once, consume per-branch: the typed doc struct feeds the
      // status classification and every delta frame (a lazy localCheckpoint
      // — RDD-level, ContextCleaner-reclaimed — not a CacheManager entry)
      val parsed = parsedOf(feed)
      val statuses = parsed.select(col("id"), skipReasonCol.as("skip_reason"))
        .withColumn("status",
          when(col("skip_reason").isNull, "processed").otherwise("error"))
        .select("id", "status", "skip_reason")
      // same predicate as statuses, applied directly — no self-join
      val ok = parsed.filter(col("d.schemaVersion").isin(KnownVersions: _*))

      val encounters = ok.select(col("id"),
        col("d.id").as("identifier"),
        to_timestamp(col("d.startTimestamp")).as("encountered"),
        col("d.participant").as("individual_identifier"),
        sexCol.as("sex"),
        col("d.site.name").as("site_identifier"),
        col("d.site.type").as("site_type"),
        ageCol.as("age"),
        col("d.localeLanguageCode").as("language"))

      val sites = encounters
        .select(col("site_identifier").as("identifier"), col("site_type"))
        .filter(col("identifier").isNotNull).distinct()
      val individuals = encounters
        .select(col("individual_identifier").as("identifier"), col("sex"))
        .filter(col("identifier").isNotNull).distinct()

      // ClinicSwab samples (:141-199): known barcode in a collection set
      val sampleUpdates = sampleUpdatesOf(parsed, identifiers)

      // locations (:287-231): use → relation; region = tract, id = address
      val encounterLocations = ok.select(col("id"),
          col("d.id").as("encounter_identifier"),
          explode(coalesce(col("d.locations"), array())).as("loc"))
        .withColumn("relation",
          try_element_at(typedLit(RelationByUse), lower(col("loc.use"))))
        .filter(col("relation").isNotNull)
        .filter(col("loc.id").isNotNull || col("loc.region").isNotNull)
        .select(col("encounter_identifier"), col("relation"),
          col("loc.id").as("location_identifier"),
          col("loc.region").as("tract"))

      Delta(statuses, sites, individuals, encounters, sampleUpdates,
        encounterLocations)
    }

    /** `statuses LEFT JOIN encounters ON id` fused into ONE projection
      * of the parsed frame (r10; encounters is a filtered projection of
      * the same frame keyed by the unique document id — the q62/q63
      * reasoning), then the genuinely 1:N ClinicSwab collection join
      * kept as a join. One parse checkpoint serves both sides.
      * Output: id, status, skip_reason, identifier, encountered
      * (timestamp), individual_identifier, sex, site_identifier, age,
      * language, collection_identifier. Round10OpsSpec pins equality
      * with the join form.
      */
    def statusReport(feed: DataFrame, identifiers: DataFrame): DataFrame = {
      val parsed = parsedOf(feed)
      val ok = col("d.schemaVersion").isin(KnownVersions: _*)
      val fused = parsed.select(col("id"), skipReasonCol.as("skip_reason"),
          when(ok, col("d.id")).as("identifier"),
          when(ok, to_timestamp(col("d.startTimestamp"))).as("encountered"),
          when(ok, col("d.participant")).as("individual_identifier"),
          when(ok, sexCol).as("sex"),
          when(ok, col("d.site.name")).as("site_identifier"),
          when(ok, ageCol).as("age"),
          when(ok, col("d.localeLanguageCode")).as("language"))
        .withColumn("status",
          when(col("skip_reason").isNull, "processed").otherwise("error"))
      fused.join(sampleUpdatesOf(parsed, identifiers)
          .select(col("encounter_identifier").as("identifier"),
            col("collection_identifier")),
        Seq("identifier"), "left")
        .select(col("id"), col("status"), col("skip_reason"),
          col("identifier"), col("encountered"),
          col("individual_identifier"), col("sex"), col("site_identifier"),
          col("age"), col("language"), col("collection_identifier"))
    }
  }

  // ============================================== presence-absence (NWGC)

  /** presence_absence.py:60-240 (Samplify feed). Old-format documents
    * (no top-level `samples`) with store/Update are skipped, others error
    * (:88-105). Per sample: investigatorId barcode required, failed
    * samples and empty targetResults dropped, stale results
    * (!isCurrentExpressionResult) dropped, identifier must be known and
    * in a valid set (:150-165); tiny-swab sets match samples on
    * collection_identifier, others on identifier (SampleNotFound when
    * absent, :166-180 + update_sample:258-309). Per target: result
    * statuses map to present true/false/null, workflow statuses
    * (Fail/Repeat/Review) drop the row (:409-453); control statuses must
    * be NotControl/PositiveControl (:248-255); result identifier is
    * NWGC/<sampleId>/<target>[/<chip>] (:199-207).
    */
  object Samplify {
    val Revision = 5
    val ValidSets: Seq[String] = Seq("samples",
      "collections-uw-tiny-swabs-home", "collections-uw-tiny-swabs-observed",
      "collections-scan-tiny-swabs",
      "collections-adult-family-home-outbreak-tiny-swabs",
      "collections-workplace-outbreak-tiny-swabs")

    val schema: DataType = ddl(
      "STRUCT<store: STRING, Update: STRING, " +
        "samples: ARRAY<STRUCT<sampleId: STRING, investigatorId: STRING, " +
        "sampleFailed: BOOLEAN, isCurrentExpressionResult: BOOLEAN, " +
        "chip: STRING, extractionDate: STRING, assayName: STRING, " +
        "assayDate: STRING, assayType: STRING, " +
        "sampleComment: STRING, initialProceedToSequencingCall: STRING, " +
        "sampleProceedToSequencing: STRING, " +
        "targetResults: ARRAY<STRUCT<geneTarget: STRING, " +
        "targetStatus: STRING, sampleState: STRING, " +
        "controlStatus: STRING>>>>>")

    private val presentByStatus: Map[String, String] = Map(
      // true/false/null; workflow statuses (Fail/Repeat/Review) → "skip"
      "Detected" -> "true", "NotDetected" -> "false",
      "Positive" -> "true", "PositiveControlPass" -> "true",
      "Negative" -> "false", "Indeterminate" -> "null",
      "Inconclusive" -> "null",
      "Fail" -> "skip", "Repeat" -> "skip", "Review" -> "skip")

    final case class Delta(
        statuses: DataFrame, // id, status, skip_reason
        targets: DataFrame, // identifier, control
        presenceAbsence: DataFrame, // id, identifier, sample_uuid, target, present, device
        sampleDetails: DataFrame) // sample_uuid, nwgc_id, tiny_swab

    def decompose(
        feed: DataFrame,
        identifiers: DataFrame, // barcode, uuid, set_name
        samples: DataFrame // identifier, collection_identifier
    ): Delta = {
      // parse once, consume per-branch: the typed doc struct feeds the
      // status classification and every delta frame (a lazy localCheckpoint
      // — RDD-level, ContextCleaner-reclaimed — not a CacheManager entry)
      val parsed = feed.repartition(feed.sparkSession.sparkContext.defaultParallelism,
        col("id")) // parse at cluster width (explicit, AQE-uncoalescible)
        .select(col("id"), from_json(col("document"), schema).as("d"))
        .localCheckpoint(false)
      val statuses = parsed.select(col("id"),
          when(col("d.samples").isNotNull, lit(null).cast("string"))
            .when(col("d.store").isNotNull || col("d.Update").isNotNull,
              lit("old format")) // skipped, :95-104
            .otherwise(lit("error: missing samples key")).as("skip_reason"))
        .withColumn("status",
          when(col("skip_reason").isNull, "processed")
            .when(col("skip_reason").startsWith("error"), "error")
            .otherwise("skipped"))
        .select("id", "status", "skip_reason")

      val rows = parsed
        .filter(col("d.samples").isNotNull) // same predicate as statuses
        .select(col("id"), explode(col("d.samples")).as("s"))
        .filter(col("s.investigatorId").isNotNull) // :111-114
        .filter(!coalesce(col("s.sampleFailed"), lit(false))) // :116-120
        .filter(size(coalesce(col("s.targetResults"), array())) > 0) // :122-127
        .filter(coalesce(col("s.isCurrentExpressionResult"), lit(false))) // :149-152
        .join(identifiers.select(col("barcode").as("i_barcode"), col("uuid"),
            col("set_name")),
          col("s.investigatorId") === col("i_barcode")) // unknown → skip :160-165
        .filter(col("set_name").isin(ValidSets: _*)) // invalid set asserts; surfaced as drop
        .withColumn("tiny_swab", col("set_name").contains("tiny-swab"))

      // sample resolution (:166-180): tiny-swab → collection_identifier.
      // Two LEFT joins + a conditional filter instead of a union of two
      // filtered inner-join branches — the union form re-executed the
      // whole parse+explode pipeline once per branch.
      val resolved = rows
        .join(samples.select(col("identifier").as("m_ident")),
          col("uuid") === col("m_ident"), "left")
        .join(samples.select(col("collection_identifier").as("m_coll")),
          col("uuid") === col("m_coll"), "left")
        .filter(when(col("tiny_swab"), col("m_coll").isNotNull)
          .otherwise(col("m_ident").isNotNull))
        .drop("m_ident", "m_coll")

      val sampleDetails = resolved.select(col("uuid").as("sample_uuid"),
        col("s.sampleId").as("nwgc_id"), col("tiny_swab")).distinct()

      val pa = resolved
        .select(col("id"), col("uuid").as("sample_uuid"),
          col("s.sampleId").as("nwgc_sample_id"), col("s.chip").as("chip"),
          col("s.assayName").as("assay_name"),
          explode(col("s.targetResults")).as("t"))
        .withColumn("present_str",
          try_element_at(typedLit(presentByStatus),
            coalesce(col("t.targetStatus"), col("t.sampleState"))))
        .filter(col("present_str").isNotNull && col("present_str") =!= "skip")
        .filter(col("t.controlStatus").isin("NotControl", "PositiveControl"))
        .withColumn("present",
          when(col("present_str") === "true", lit(true))
            .when(col("present_str") === "false", lit(false))
            .otherwise(lit(null).cast("boolean")))
        .withColumn("identifier",
          when(col("chip").isNotNull, concat_ws("/", lit("NWGC"),
            col("nwgc_sample_id"), col("t.geneTarget"), col("chip")))
            .otherwise(concat_ws("/", lit("NWGC"), col("nwgc_sample_id"),
              col("t.geneTarget"))))
        .withColumn("device",
          when(col("assay_name").isNotNull, col("assay_name"))
            .when(col("chip").isNotNull, lit("OpenArray"))) // details:370-377

      val targets = pa.select(col("t.geneTarget").as("identifier"),
          (col("t.controlStatus") === "PositiveControl").as("control"))
        .distinct()

      Delta(statuses, targets,
        pa.select(col("id"), col("identifier"), col("sample_uuid"),
          col("t.geneTarget").as("target"), col("present"), col("device")),
        sampleDetails)
    }
  }

  // ================================================================ manifest

  /** manifest.py:106-224: barcode-keyed sample upserts. Skip rules: no
    * barcodes at all, unknown sample barcode, unknown collection barcode,
    * collection identifier from an unexpected set. update_identifiers is
    * true only when BOTH sample and collection barcodes are present
    * (:119-121); collection date always overwrites (:183).
    */
  object Manifest {
    val EtlName = "manifest"

    val schema: DataType = ddl(
      "STRUCT<sample: STRING, collection: STRING, date: STRING, " +
        "sample_type: STRING, aliquot_date: STRING>")

    final case class Delta(
        statuses: DataFrame, // id, status, skip_reason
        sampleUpdates: DataFrame) // id, identifier, collection_identifier, collection_date, update_identifiers

    /** Parse + join identifiers + classify, ONE pass — shared by
      * [[decompose]] (per-branch projections; `pin = true` checkpoints
      * so the parse+joins run once across branches) and
      * [[statusReport]] (single consumer; `pin = false` streams —
      * storing 15M-wide post-join rows for one reader is pure cost, and
      * the downstream is a plain projection, not the HOF-lambda shape
      * whose projection collapse re-parses per element).
      */
    private def classify(feed: DataFrame, identifiers: DataFrame,
        pin: Boolean = true): DataFrame = {
      val ident = identifiers.select(col("barcode"), col("uuid"), col("set_name"))
      val parsed = feed.repartition(feed.sparkSession.sparkContext.defaultParallelism,
        col("id")) // parse at cluster width (explicit, AQE-uncoalescible)
        .select(col("id"), from_json(col("document"), schema).as("d"))
        .join(ident.select(col("barcode").as("sb"), col("uuid").as("s_uuid"),
            col("set_name").as("s_set")),
          col("d.sample") === col("sb"), "left")
        .join(ident.select(col("barcode").as("cb"), col("uuid").as("c_uuid"),
            col("set_name").as("c_set")),
          col("d.collection") === col("cb"), "left")
      val classified = parsed.withColumn("skip_reason",
          when(col("d.sample").isNull && col("d.collection").isNull,
            "no barcodes") // :136-140
            .when(col("d.sample").isNotNull && col("s_uuid").isNull,
              "unknown sample barcode") // :142-146
            .when(col("d.collection").isNotNull && col("c_uuid").isNull,
              "unknown collection barcode") // :148-152
            .when(col("c_uuid").isNotNull &&
              !col("c_set").isin(FhirEtl.expectedCollectionSets: _*),
              "collection identifier in unexpected set")) // :154-159
        .withColumn("status",
          when(col("skip_reason").isNull, "processed").otherwise("skipped"))
      // parse + classify once, consume per-branch (statuses AND
      // sampleUpdates): lazy RDD-level checkpoint, ContextCleaner-reclaimed
      if (pin) classified.localCheckpoint(false) else classified
    }

    def decompose(feed: DataFrame, identifiers: DataFrame): Delta = {
      val classified = classify(feed, identifiers)
      val statuses = classified.select("id", "status", "skip_reason")
      val sampleUpdates = classified.filter(col("status") === "processed")
        .select(col("id"), col("s_uuid").as("identifier"),
          col("c_uuid").as("collection_identifier"),
          to_date(col("d.date")).as("collection_date"),
          (col("d.sample").isNotNull && col("d.collection").isNotNull)
            .as("update_identifiers")) // :119-121
      Delta(statuses, sampleUpdates)
    }

    /** `statuses LEFT JOIN sampleUpdates ON id` in ONE projection of the
      * classified frame (r10) — the feed-status report every gate reads.
      * The join form read the parse checkpoint twice and shuffled both
      * narrow sides (2 Exchanges + an SMJ growing with the feed); since
      * `sampleUpdates` is a filtered projection of the SAME frame keyed
      * by the feed's unique document id, the join is exactly a
      * when(processed, …) projection. Round10OpsSpec pins equality with
      * the join form.
      *
      * ASSUMPTION (r11, per the r10 advice): the equivalence holds only
      * because the feed's document id is unique and identifier barcodes
      * are unique — a duplicate-keyed feed would fan out N×M rows in
      * the join form but produce N rows fused. Both uniquenesses are
      * structural for every current caller (receiving ids are the
      * feed's primary key; the identifier dim is keyed on barcode);
      * nothing enforces them here, so a NEW caller feeding duplicate
      * ids must use the join form or dedupe first.
      */
    def statusReport(feed: DataFrame, identifiers: DataFrame): DataFrame = {
      val ok = col("status") === "processed"
      classify(feed, identifiers, pin = false).select(
        col("id"), col("status"), col("skip_reason"),
        when(ok, col("s_uuid")).as("identifier"),
        when(ok, col("c_uuid")).as("collection_identifier"),
        when(ok, to_date(col("d.date"))).as("collection_date"),
        when(ok, col("d.sample").isNotNull && col("d.collection").isNotNull)
          .as("update_identifiers"))
    }
  }

  // ==================================================================== kit

  /** kit.py:230-330 (kit manifests): link kits to samples. Skip rules: no
    * kit key, unknown sample barcode, unexpected sample set, sample type
    * not utm/rdt, unknown kit barcode, unexpected kit set; a known sample
    * identifier whose sample row is missing is an error (SampleNotFound,
    * :292-298 — the ETL retries next run).
    */
  object Kit {
    val EtlName = "kit"
    val ExpectedKitSets: Seq[String] = Seq("kits")

    val schema: DataType = ddl(
      "STRUCT<kit: STRING, sample: STRING, sample_type: STRING>")

    final case class Delta(
        statuses: DataFrame, // id, status, skip_reason
        kitUpdates: DataFrame) // id, kit_identifier, sample_uuid, sample_type

    /** Parse + joins + skip-ladder classification, ONE pass — shared by
      * [[decompose]] (`pin = true`: checkpointed, branches read it
      * twice) and [[statusReport]] (`pin = false`: single consumer
      * streams, no block store — see [[Manifest.classify]]).
      */
    private def classify(
        feed: DataFrame, identifiers: DataFrame, samples: DataFrame,
        pin: Boolean = true): DataFrame = {
      val ident = identifiers.select(col("barcode"), col("uuid"), col("set_name"))
      val parsed = feed.repartition(feed.sparkSession.sparkContext.defaultParallelism,
        col("id")) // parse at cluster width (explicit, AQE-uncoalescible)
        .select(col("id"), from_json(col("document"), schema).as("d"))
        .join(ident.select(col("barcode").as("sb"), col("uuid").as("s_uuid"),
            col("set_name").as("s_set")),
          col("d.sample") === col("sb"), "left")
        .join(ident.select(col("barcode").as("kb"), col("uuid").as("k_uuid"),
            col("set_name").as("k_set")),
          col("d.kit") === col("kb"), "left")
        .join(samples.select(col("identifier").as("w_ident"),
            col("sample_type").as("w_type")),
          col("s_uuid") === col("w_ident"), "left")
      val classified = parsed.withColumn("skip_reason",
          when(col("d.kit").isNull, "no kit data") // :247-251
            .when(col("s_uuid").isNull, "unknown sample barcode") // :256-261
            .when(!col("s_set").isin(FhirEtl.expectedSampleSets: _*),
              "sample identifier in unexpected set") // :263-267
            .when(col("w_ident").isNull,
              "error: sample not found") // :292-298
            .when(!col("w_type").isin("utm", "rdt"),
              "unknown sample type") // :300-305
            .when(col("k_uuid").isNull, "unknown kit barcode") // :307-312
            .when(!col("k_set").isin(ExpectedKitSets: _*),
              "kit identifier in unexpected set")) // :314-318
        .withColumn("status",
          when(col("skip_reason").isNull, "processed")
            .when(col("skip_reason").startsWith("error"), "error")
            .otherwise("skipped"))
      // parse + classify once, consume per-branch (statuses AND
      // kitUpdates): lazy RDD-level checkpoint, ContextCleaner-reclaimed
      if (pin) classified.localCheckpoint(false) else classified
    }

    def decompose(
        feed: DataFrame,
        identifiers: DataFrame, // barcode, uuid, set_name
        samples: DataFrame // identifier, sample_type (utm|rdt|other)
    ): Delta = {
      val classified = classify(feed, identifiers, samples)
      val statuses = classified.select("id", "status", "skip_reason")
      val kitUpdates = classified.filter(col("status") === "processed")
        .select(col("id"), col("k_uuid").as("kit_identifier"),
          col("s_uuid").as("sample_uuid"), col("w_type").as("sample_type"))
      Delta(statuses, kitUpdates)
    }

    /** `statuses LEFT JOIN kitUpdates ON id` in ONE projection of the
      * classified frame (r10) — same reasoning as
      * [[Manifest.statusReport]]: kitUpdates is a filtered projection of
      * the same frame keyed by the unique document id, so the join is a
      * when(processed, …) projection. Round10OpsSpec pins equality with
      * the join form.
      */
    def statusReport(
        feed: DataFrame, identifiers: DataFrame, samples: DataFrame): DataFrame = {
      val ok = col("status") === "processed"
      classify(feed, identifiers, samples, pin = false).select(
        col("id"), col("status"), col("skip_reason"),
        when(ok, col("k_uuid")).as("kit_identifier"),
        when(ok, col("s_uuid")).as("sample_uuid"),
        when(ok, col("w_type")).as("sample_type"))
    }
  }

  // ======================================================= consensus genome

  /** consensus_genome.py:64-316: sample must exist (assert → error),
    * reference organism maps to an lquery (h1n1pdm → *.H1N1, …, unknown →
    * error), organism resolved by lquery match against the organism
    * table; genomes + genomic sequences upserted only for status
    * 'complete'; sequence read sets keyed by (sample, url set).
    */
  object ConsensusGenome {
    val Revision = 1
    val OrganismLquery: Map[String, String] = Map(
      "h1n1pdm" -> "*.H1N1", "h3n2" -> "*.H3N2",
      "vic" -> "*.Vic", "yam" -> "*.Yam") // :231-236

    val schema: DataType = ddl(
      "STRUCT<sample_identifier: STRING, status: STRING, " +
        "reference_organism: STRING, " +
        "metadata: STRUCT<urls: ARRAY<STRING>>, " +
        "masked_consensus: ARRAY<STRUCT<sequence_identifier: STRING, " +
        "sequence_segment: STRING, genomic_sequence: STRING>>>")

    final case class Delta(
        statuses: DataFrame, // id, status, skip_reason
        readSets: DataFrame, // id, sample_uuid, urls (sorted csv), organism_lineage, rs_status
        sequences: DataFrame) // id, sequence_identifier, segment, organism_lineage

    /** Parse (checkpointed) + sample/organism resolution + error
      * classification — shared by [[decompose]] and [[statusReport]].
      */
    private def classify(
        feed: DataFrame, samples: DataFrame, organisms: DataFrame): DataFrame = {
      // parse once, consume per-branch: the typed doc struct feeds the
      // status classification and every delta frame (a lazy localCheckpoint
      // — RDD-level, ContextCleaner-reclaimed — not a CacheManager entry)
      val parsed = feed.repartition(feed.sparkSession.sparkContext.defaultParallelism,
        col("id")) // parse at cluster width (explicit, AQE-uncoalescible)
        .select(col("id"), from_json(col("document"), schema).as("d"))
        .localCheckpoint(false)
      // organism resolution: each known reference name's lquery matched
      // against the organism table (find_organism's `lineage ~ pattern`)
      val lineageByName = OrganismLquery.toSeq.map { case (name, pat) =>
        organisms.filter(graft.functions.lqueryMatch(col("lineage"), pat))
          .limit(1).select(lit(name).as("ref_name"), col("lineage"))
      }.reduce(_.unionByName(_))
      val withSample = parsed
        .join(samples.select(col("identifier").as("w_ident")),
          col("d.sample_identifier") === col("w_ident"), "left")
        .join(broadcast(lineageByName),
          col("d.reference_organism") === col("ref_name"), "left")
      withSample.withColumn("skip_reason",
          when(col("w_ident").isNull, "error: sample not found") // :106-110
            .when(!col("d.reference_organism").isin(OrganismLquery.keys.toSeq: _*),
              "error: unknown organism") // :225-236
            .when(col("lineage").isNull, "error: no organism matched")) // :185-190
        .withColumn("status",
          when(col("skip_reason").isNull, "processed").otherwise("error"))
    }

    /** sequences branch over a classified frame (:104-116). */
    private def sequencesOf(classified: DataFrame): DataFrame =
      classified.filter(col("status") === "processed")
        .filter(col("d.status") === "complete")
        .select(col("id"), col("lineage").as("organism_lineage"),
          explode(coalesce(col("d.masked_consensus"), array())).as("mc"))
        .select(col("id"),
          col("mc.sequence_identifier").as("sequence_identifier"),
          col("mc.sequence_segment").as("segment"),
          col("organism_lineage"))

    def decompose(
        feed: DataFrame,
        samples: DataFrame, // identifier
        organisms: DataFrame // lineage
    ): Delta = {
      val classified = classify(feed, samples, organisms)
      val statuses = classified.select("id", "status", "skip_reason")
      val ok = classified.filter(col("status") === "processed")
      val readSets = ok.select(col("id"),
        col("d.sample_identifier").as("sample_uuid"),
        array_join(array_sort(coalesce(col("d.metadata.urls"), array())), ",")
          .as("urls"),
        col("lineage").as("organism_lineage"),
        col("d.status").as("rs_status"))
      // sequences only for completed assemblies (:104-116)
      val sequences = sequencesOf(classified)
      Delta(statuses, readSets, sequences)
    }

    /** `statuses LEFT JOIN readSets ON id` fused into ONE derivation of
      * the classified frame (r10; readSets is a filtered per-id
      * projection — the q62/q63 reasoning); the genuinely 1:N sequences
      * explode stays a join. Output matches the join composition:
      * id, status, skip_reason, sample_uuid, urls, organism_lineage,
      * rs_status, sequence_identifier, segment. Round10OpsSpec pins
      * equality with the join form.
      */
    def statusReport(
        feed: DataFrame, samples: DataFrame, organisms: DataFrame): DataFrame = {
      val classified = classify(feed, samples, organisms)
      val ok = col("status") === "processed"
      val fused = classified.select(col("id"), col("status"),
        col("skip_reason"),
        when(ok, col("d.sample_identifier")).as("sample_uuid"),
        when(ok, array_join(
          array_sort(coalesce(col("d.metadata.urls"), array())), ","))
          .as("urls"),
        when(ok, col("lineage")).as("organism_lineage"),
        when(ok, col("d.status")).as("rs_status"))
      fused.join(sequencesOf(classified)
          .select(col("id"), col("sequence_identifier"), col("segment")),
        Seq("id"), "left")
    }
  }
}
