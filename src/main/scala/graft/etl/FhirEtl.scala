package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** The FHIR bundle ETL — the reference's largest single operator
  * (id3c lib/id3c/cli/command/etl/fhir.py:105-992), re-expressed as a
  * dependency-ordered graph of DataFrame transforms instead of a
  * per-record resource walk.
  *
  * Reference shape: for each receiving.fhir document, validate the Bundle
  * (fhir.py:140-151), index resources by type (:265-276), process every
  * Encounter entry before any DiagnosticReport entry (:152-164, ordering
  * avoids SampleNotFoundError), and run the dependency-ordered upsert
  * graph site → individual → encounter → sample → presence_absence
  * (:453-966).
  *
  * Spark shape: one parse pass explodes bundle entries keeping each
  * resource as RAW JSON (so conflicting per-type field shapes — e.g.
  * `specimen` is a struct on Observation but an array on DiagnosticReport
  * — never meet in one schema); per-type frames re-parse with partial
  * typed schemas; every `resolved(X)` reference walk becomes an equi-join
  * on (doc id, fullUrl). The Encounters-before-DiagnosticReports ordering
  * is not a loop ordering here — it falls out of the dataflow: the sample
  * delta from encounters feeds the DR path's sample lookup.
  *
  * Scale: every join is keyed on (id, url) where id is the bundle id —
  * shuffle-partitioned by document, no skew (bundles are small and
  * uniform), no driver-side iteration anywhere.
  */
object FhirEtl {

  val EtlName = "fhir" // fhir.py:59
  val Revision = 5 // fhir.py:58
  val InternalSystem = "https://seattleflu.org" // fhir.py:60
  val LocationRelationSystem = "http://terminology.hl7.org/CodeSystem/v3-RoleCode"
  val SnomedSystem = "http://snomed.info/sct" // fhir.py:62
  val SnomedTerm = "http://snomed.info/id" // fhir.py:63
  val LanguageSystem = "urn:ietf:bcp:47" // fhir.py:64

  /** fhir.py:65-88 */
  val expectedCollectionSets: Seq[String] = Seq(
    "collections-household-observation", "collections-household-intervention",
    "collections-household-intervention-asymptomatic", "collections-swab&send",
    "collections-kiosks", "collections-self-test", "collections-seattleflu.org",
    "collections-swab&send-asymptomatic", "collections-scan",
    "collections-scan-kiosks", "collections-uw-home", "collections-uw-observed",
    "collections-uw-tiny-swabs", "collections-uw-tiny-swabs-home",
    "collections-uw-tiny-swabs-observed", "collections-household-general",
    "collections-childcare", "collections-scan-tiny-swabs",
    "collections-adult-family-home-outbreak-tiny-swabs",
    "collections-workplace-outbreak-tiny-swabs", "collections-airs")
  val expectedSampleSets: Seq[String] = Seq("samples") // fhir.py:89

  private def ddl(s: String): DataType = DataType.fromDDL(s)

  // One merged resource schema — the union of every field any of the six
  // resource types' ETL paths read (the per-type partial schemas of the
  // reference walk, fhir.py:453-966, fused). Parsing the WHOLE bundle
  // document against this one schema means Jackson touches each byte of
  // JSON exactly once; the previous two-pass design (capture each entry's
  // resource subtree as raw text, re-parse per type) billed a second full
  // Jackson pass to every typed branch. Field names are disjoint-or-
  // identically-shaped across the six types with ONE exception:
  // `specimen` is a Reference struct on Observation but an array of
  // References on DiagnosticReport — that field alone is captured as raw
  // JSON text (StringType capture) and re-parsed per branch against the
  // branch's shape (a few dozen bytes per row, not the whole resource).
  private val identDdl = "identifier: ARRAY<STRUCT<system: STRING, value: STRING>>"
  private val codingDdl = "coding: ARRAY<STRUCT<system: STRING, code: STRING, display: STRING>>"
  val resourceSchemaDdl: String =
    "STRUCT<resourceType: STRING, " +
      // Patient (fhir.py:404-409, 563-573)
      s"gender: STRING, $identDdl, communication: ARRAY<STRUCT<" +
      s"language: STRUCT<$codingDdl>, preferred: BOOLEAN>>, " +
      // Encounter (fhir.py:453-505, 575-620)
      "status: STRING, period: STRUCT<start: STRING>, " +
      "subject: STRUCT<reference: STRING>, partOf: STRUCT<reference: STRING>, " +
      s"reasonCode: ARRAY<STRUCT<$codingDdl>>, " +
      "location: ARRAY<STRUCT<location: STRUCT<reference: STRING, " +
      "identifier: STRUCT<system: STRING, value: STRING>>>>, " +
      "meta: STRUCT<source: STRING>, " +
      // Observation (fhir.py:896-966) / QuestionnaireResponse (:710-756)
      "encounter: STRUCT<reference: STRING>, " +
      "specimen: STRING, " + // shape conflicts across types — raw capture
      s"code: STRUCT<$codingDdl>, valueBoolean: BOOLEAN, " +
      s"valueCodeableConcept: STRUCT<$codingDdl>, " +
      "device: STRUCT<identifier: STRUCT<value: STRING>>, " +
      "item: ARRAY<STRUCT<linkId: STRING, " +
      "answer: ARRAY<STRUCT<valueInteger: INT>>>>, " +
      // Specimen (fhir.py:622-708)
      "note: ARRAY<STRUCT<text: STRING>>, " +
      "collection: STRUCT<collectedDateTime: STRING, " +
      "collectedPeriod: STRUCT<start: STRING, end: STRING>>, " +
      // DiagnosticReport (fhir.py:191-257)
      "result: ARRAY<STRUCT<reference: STRING>>, effectiveDateTime: STRING>"
  /** Observation.specimen / QuestionnaireResponse-style single Reference. */
  val specimenRefSchema: DataType = ddl("STRUCT<reference: STRING>")
  /** DiagnosticReport.specimen — array of References w/ inline identifier. */
  val drSpecimenSchema: DataType = ddl(
    "ARRAY<STRUCT<reference: STRING, " +
      "identifier: STRUCT<system: STRING, value: STRING>>>")

  /** `identifier(resource, system)` (fhir.py:383-402): the identifier
    * value in `system`, or null. (The reference asserts exactly one; we
    * take the first — the assert can be layered as a column if needed.)
    */
  def identifierFor(identArr: Column, system: String): Column =
    try_element_at(
      filter(coalesce(identArr, array()),
        i => i.getField("system") === lit(system)), lit(1))
      .getField("value")

  /** `matching_system_code` (fhir.py:414-435): code for `system` in a
    * CodeableConcept, or null.
    */
  def codeFor(concept: Column, system: String): Column =
    try_element_at(
      filter(coalesce(concept.getField("coding"), array()),
        c => c.getField("system") === lit(system)), lit(1))
      .getField("code")

  /** Explode bundle entries, each resource fully typed against the merged
    * union schema (`extract_resources`, fhir.py:265-276 — the reference's
    * index-by-type dict becomes an rtype column).
    *
    * Output: id, pos (entry order — drives "first response wins" rules),
    * full_url, rtype, r (typed resource struct; `r.specimen` is raw JSON
    * text, see [[resourceSchemaDdl]]).
    */
  def parseEntries(feed: DataFrame): DataFrame =
    feed
      // Repartition BEFORE the parse: a receiving feed arrives in however
      // few files the log writer produced, and Jackson billed to the scan
      // stage would run at file parallelism (measured: a 2-file feed
      // parsed on 2 of 32 cores, 4.3s of a 10s query). Shuffling the raw
      // documents first is one narrow exchange, and hash-partitioning on
      // id satisfies the ClusteredDistribution of every downstream
      // (id, fullUrl) join — no further shuffle of the entries.
      .repartition(col("id"))
      // ONE Jackson pass over the document: fullUrl, the bundle-level
      // type fields (so classify never re-parses the document), and every
      // per-type resource field come out of the same parse. resourceType
      // is a schema field, so no get_json_object second scan either.
      .select(col("id"),
        from_json(col("document"), ddl(
          "STRUCT<resourceType: STRING, type: STRING, " +
            s"entry: ARRAY<STRUCT<fullUrl: STRING, resource: $resourceSchemaDdl>>>"))
          .as("d"))
      .select(col("id"), col("d.resourceType").as("doc_rtype"),
        col("d.type").as("doc_type"),
        posexplode_outer(col("d.entry")).as(Seq("pos", "e")))
      .select(col("id"), col("doc_rtype"), col("doc_type"), col("pos"),
        col("e.fullUrl").as("full_url"),
        col("e.resource.resourceType").as("rtype"),
        col("e.resource").as("r"))

  /** Bundle-level validation: `assert_bundle_collection` (fhir.py:140-151,
    * a hard error in the reference) and
    * `assert_required_resource_types_present` (fhir.py:341-368, a
    * SkipBundleError) plus the per-encounter site requirement
    * (fhir.py:184-185: no site ⇒ SkipBundleError).
    *
    * Output: id, status ∈ (processed|skipped|error), skip_reason.
    */
  def classify(feed: DataFrame): DataFrame =
    classifyEntries(feed, parseEntries(feed))

  private[etl] def classifyEntries(feed: DataFrame, e: DataFrame): DataFrame = {
    // one pass over the (checkpointed) entries; the bundle-level type
    // check uses the fields parseEntries carried along — posexplode_outer
    // guarantees one row per id even for entry-less/unparseable documents,
    // so the feed itself is never re-read (feed stays in the signature for
    // API stability)
    val counts = e.groupBy("id").agg(
      (first(col("doc_rtype")) === "Bundle" &&
        first(col("doc_type")) === "collection").as("is_bundle"),
      sum(when(col("rtype") === "Patient", 1).otherwise(0)).as("n_patient"),
      sum(when(col("rtype") === "Encounter", 1).otherwise(0)).as("n_encounter"),
      sum(when(col("rtype") === "Specimen", 1).otherwise(0)).as("n_specimen"),
      sum(when(col("rtype") === "Observation", 1).otherwise(0)).as("n_observation"),
      sum(when(col("rtype") === "DiagnosticReport", 1).otherwise(0)).as("n_dr"))
    // every Encounter needs a site-system location (fhir.py:604-620);
    // one without ⇒ the whole bundle is skipped (fhir.py:184-185)
    val sited = e.filter(col("rtype") === "Encounter")
      .select(col("id"), col("r.location").as("locs"))
      .select(col("id"),
        exists(coalesce(col("locs"), array()),
          l => l.getField("location").getField("identifier").getField("system")
            === lit(s"$InternalSystem/site")).as("has_site"))
      .groupBy("id").agg(min(col("has_site")).as("all_sited"))
    counts
      .join(sited, Seq("id"), "left")
      .withColumn("skip_reason",
        when(!coalesce(col("is_bundle"), lit(false)),
          "error: not a Bundle of type collection")
          .when(col("n_patient") === 0 && col("n_dr") === 0,
            "missing Patient or DiagnosticReport")
          .when(col("n_patient") > 0 && col("n_encounter") === 0,
            "Patient without Encounter")
          .when(col("n_specimen") > 0 && col("n_encounter") > 0 &&
            col("n_observation") < col("n_specimen"),
            "fewer Observations than Specimens")
          .when(col("n_encounter") > 0 && !coalesce(col("all_sited"), lit(false)),
            "insufficient information to create encounter"))
      .withColumn("status",
        when(col("skip_reason").isNull, "processed")
          .when(col("skip_reason").startsWith("error"), "error")
          .otherwise("skipped"))
      .select("id", "status", "skip_reason")
  }

  /** The decomposed warehouse deltas of one batch of bundles. */
  final case class Delta(
      statuses: DataFrame, // id, status, skip_reason
      sites: DataFrame, // identifier (find_or_create_site, fhir.py:618)
      individuals: DataFrame, // identifier, sex (upsert_individual, fhir.py:590-596)
      encounters: DataFrame, // id, identifier, encountered, individual_identifier, site_identifier, age, language, part_of
      sampleUpdates: DataFrame, // identifier, collection_identifier, collection_date, encounter_identifier, note
      targets: DataFrame, // identifier (find_or_create_target, fhir.py:941-943)
      presenceAbsence: DataFrame) // id, identifier, barcode, snomed, device, present, effective_datetime

  /** Decompose a receiving feed of FHIR bundles into warehouse deltas.
    *
    * @param feed        receiving-shaped frame: id, document
    * @param identifiers the identifier table (find_identifier,
    *                    db/__init__.py:99-124): barcode, uuid, set_name
    * @param samples     current warehouse samples for the DR-path lookup
    *                    (find_sample): identifier, collection_identifier
    */
  def decompose(
      feed: DataFrame,
      identifiers: DataFrame,
      samples: DataFrame): Delta = {
    // Parse once, consume ~10 times: the typed frames, classify counts and
    // the reference-resolution joins all branch from this frame, and
    // Catalyst pushes each branch's rtype filter below any shared exchange
    // (so ReuseExchange can't deduplicate them). A LAZY localCheckpoint
    // materializes the parsed entries as an RDD-level cache on first use —
    // no CacheManager registration (nothing to unpersist by hand: the
    // ContextCleaner reclaims it once the frame is unreachable after GC).
    // Because the merged-schema parse happens BELOW this checkpoint, every
    // typed branch downstream is a filter + struct-field read of the
    // materialized rows — zero Jackson anywhere past this line.
    val entries = parseEntries(feed).localCheckpoint(false)
    // statuses is ALSO multi-consumed: every typed branch joins `ok`, so an
    // unmaterialized classify would re-run its two aggregations once per
    // branch (measured ~1s × 4-6 consumers per query at sf0.1). One row per
    // bundle — checkpointing it is cheap and makes `ok` a read.
    val statuses = classifyEntries(feed, entries).localCheckpoint(false)
    val ok = statuses.filter(col("status") === "processed").select("id")
    val e = entries.join(ok, "id")

    def typed(rtype: String): DataFrame =
      e.filter(col("rtype") === rtype)
        .select(col("id"), col("pos"), col("full_url"), col("r"))

    val pat = typed("Patient")
    val enc = typed("Encounter")
    val obs = typed("Observation")
    val spec = typed("Specimen")
    val qr = typed("QuestionnaireResponse")
    val dr = typed("DiagnosticReport")

    // ---- encounter graph (process_encounter, fhir.py:453-505) ----------
    val encBase = enc.select(
      col("id"), col("pos"), col("full_url"),
      identifierFor(col("r.identifier"), s"$InternalSystem/encounter")
        .as("identifier"),
      to_timestamp(col("r.period.start")).as("encountered"),
      col("r.subject.reference").as("subject_ref"),
      col("r.partOf.reference").as("part_of_ref"),
      // first site-system location (process_encounter_site, fhir.py:604-620)
      try_element_at(
        filter(coalesce(col("r.location"), array()),
          l => l.getField("location").getField("identifier").getField("system")
            === lit(s"$InternalSystem/site")), lit(1))
        .getField("location").getField("identifier").getField("value")
        .as("site_identifier"),
      // reason codes (process_encounter_reason, fhir.py:575-585)
      flatten(transform(coalesce(col("r.reasonCode"), array()),
        c => transform(c.getField("coding"), cd => cd.getField("code"))))
        .as("reason_codes"))

    // patient: sex (fhir.py:404-409), preferred language (fhir.py:563-573)
    val patient = pat.select(
      col("id"), col("full_url").as("p_url"),
      identifierFor(col("r.identifier"), s"$InternalSystem/individual")
        .as("individual_identifier"),
      when(col("r.gender") === "unknown", lit(null))
        .otherwise(col("r.gender")).as("sex"),
      codeFor(
        try_element_at(filter(coalesce(col("r.communication"), array()),
          c => c.getField("preferred")), lit(1)).getField("language"),
        LanguageSystem).as("language"))

    // age from the first QuestionnaireResponse linked to the encounter
    // (encounter_age/process_age, fhir.py:710-756): months take precedence
    // within a response; first response with an age wins (entry order).
    val ages = qr.select(
        col("id"), col("pos"),
        col("r.encounter.reference").as("enc_ref"),
        try_element_at(filter(coalesce(col("r.item"), array()),
          i => i.getField("linkId") === "age_months"), lit(1))
          .getField("answer").getField("valueInteger").getItem(0).as("months"),
        try_element_at(filter(coalesce(col("r.item"), array()),
          i => i.getField("linkId") === "age"), lit(1))
          .getField("answer").getField("valueInteger").getItem(0).as("years"))
      .filter(col("months").isNotNull || col("years").isNotNull)
      .withColumn("age",
        when(col("months").isNotNull,
          concat((col("months") / lit(12.0)).cast("string"), lit(" years")))
          .otherwise(concat(col("years").cast("string"), lit(" years"))))
      .groupBy("id", "enc_ref")
      .agg(min_by(col("age"), col("pos")).as("age"))

    // partOf resolution (fhir.py:480-483): referenced encounter's identifier
    val partOf = encBase.select(
      col("id").as("po_id"), col("full_url").as("po_url"),
      col("identifier").as("part_of"))
    val patientR = patient.withColumnRenamed("id", "p_id")
    val agesR = ages.select(col("id").as("a_id"), col("enc_ref").as("a_ref"),
      col("age"))

    val encounters = encBase
      .join(patientR,
        col("id") === col("p_id") && col("subject_ref") === col("p_url"),
        "left")
      .join(agesR,
        col("id") === col("a_id") && col("full_url") === col("a_ref"), "left")
      .join(partOf,
        col("id") === col("po_id") && col("part_of_ref") === col("po_url"),
        "left")
      .select(col("id"), col("pos"), col("full_url"), col("identifier"),
        col("encountered"), col("individual_identifier"), col("sex"),
        col("language"), col("site_identifier"), col("age"), col("part_of"),
        col("reason_codes"))

    val sites = encounters.select(col("site_identifier").as("identifier"))
      .filter(col("identifier").isNotNull).distinct()
    val individuals = patient
      .select(col("individual_identifier").as("identifier"), col("sex"))
      .filter(col("identifier").isNotNull).distinct()

    // ---- encounter samples (process_encounter_samples, fhir.py:622-708) -
    // Observation is the only Specimen↔Encounter link: obs.encounter →
    // encounter fullUrl, obs.specimen → specimen fullUrl.
    val ident = identifiers.select(
      col("barcode").as("i_barcode"), col("uuid"), col("set_name"))
    val encSamples = obs
      .select(col("id"),
        col("r.encounter.reference").as("enc_ref"),
        // r.specimen is raw-captured (shape conflict, see resourceSchemaDdl):
        // re-parse the few-dozen-byte Reference here, Observation rows only
        from_json(col("r.specimen"), specimenRefSchema)
          .getField("reference").as("spec_ref"))
      .filter(col("enc_ref").isNotNull && col("spec_ref").isNotNull)
      .join(encounters.select(col("id"), col("full_url").as("enc_url"),
          col("identifier").as("encounter_identifier")),
        Seq("id"))
      .filter(col("enc_ref") === col("enc_url"))
      .join(spec.select(col("id"), col("full_url").as("spec_url"),
          trim(identifierFor(col("r.identifier"), s"$InternalSystem/sample"))
            .as("barcode"),
          try_element_at(col("r.note"), lit(1)).getField("text").as("note"),
          // collectedDateTime || collectedPeriod.start || .end (fhir.py:688-695)
          coalesce(col("r.collection.collectedDateTime"),
            col("r.collection.collectedPeriod.start"),
            col("r.collection.collectedPeriod.end")).as("collection_date")),
        Seq("id"))
      .filter(col("spec_ref") === col("spec_url"))
      // unknown barcode → skip specimen, not bundle (fhir.py:664-667);
      // plain equi-join on barcode — AQE broadcasts if the identifier
      // table is small, shuffles if it is warehouse-sized
      .join(ident, col("barcode") === col("i_barcode"), "inner")
      // unexpected set → skip specimen (fhir.py:669-671)
      .filter(col("set_name").isin(expectedCollectionSets ++ expectedSampleSets: _*))
      .select(col("id"), col("encounter_identifier"),
        when(col("set_name").isin(expectedSampleSets: _*), col("uuid"))
          .as("identifier"),
        when(col("set_name").isin(expectedCollectionSets: _*), col("uuid"))
          .as("collection_identifier"),
        to_date(col("collection_date")).as("collection_date"),
        col("note"))

    // ---- DiagnosticReport path (fhir.py:191-257, 896-966) --------------
    // reference.identifier absent → resolve the Specimen resource;
    // present with the internal system → inline barcode; present with any
    // other system → no barcode → continue (fhir.py:204-215)
    val drSpec = dr.select(col("id"), col("pos"),
        col("r.effectiveDateTime").as("effective_datetime"),
        col("r.result").as("results"),
        // DR's specimen list is the array shape of the raw capture
        explode(coalesce(from_json(col("r.specimen"), drSpecimenSchema),
          array())).as("sp"))
    val drInline = drSpec
      .filter(col("sp.identifier").isNotNull)
      .filter(col("sp.identifier.system") === InternalSystem)
      .withColumn("barcode", trim(col("sp.identifier.value")))
    val drResolved = drSpec
      .filter(col("sp.identifier").isNull)
      .join(spec.select(col("id"), col("full_url").as("spec_url"),
          trim(identifierFor(col("r.identifier"), s"$InternalSystem/sample"))
            .as("barcode")),
        Seq("id"))
      .filter(col("sp.reference") === col("spec_url"))
      .drop("spec_url")
    val drBarcodes = drInline
      .unionByName(drResolved, allowMissingColumns = true)
      .filter(col("barcode").isNotNull) // fhir.py:214-215: no barcode → continue
      .join(ident, col("barcode") === col("i_barcode"), "inner")
      .filter(col("set_name")
        .isin(expectedCollectionSets ++ expectedSampleSets: _*))
      .withColumn("is_collection",
        col("set_name").isin(expectedCollectionSets: _*))

    // find_sample by uuid; missing collection-set samples are created with
    // just the collection identifier (fhir.py:243-255). Two equi left
    // joins, never an OR-join (which Spark would plan as a nested loop).
    val drWithSample = drBarcodes
      .join(samples.select(col("identifier").as("s_ident")),
        col("uuid") === col("s_ident"), "left")
      .join(samples.select(col("collection_identifier").as("s_coll")),
        col("uuid") === col("s_coll"), "left")
      .withColumn("sample_missing", col("s_ident").isNull && col("s_coll").isNull)
    val drCreatedSamples = drWithSample
      .filter(col("sample_missing") && col("is_collection"))
      .select(lit(null).cast("string").as("identifier"),
        col("uuid").as("collection_identifier"))
      .distinct()

    // presence-absence per result Observation (fhir.py:896-966)
    val pa = drWithSample
      // sample-set barcode with no sample ⇒ SampleNotFoundError — surfaced
      // as a droppable error column rather than a job abort
      .withColumn("sample_not_found", col("sample_missing") && !col("is_collection"))
      .filter(!col("sample_not_found"))
      .select(col("id"), col("barcode"), col("effective_datetime"),
        explode(coalesce(col("results"), array())).as("res_ref"))
      .withColumn("result_ref", col("res_ref.reference"))
      .join(obs.select(col("id"), col("full_url").as("obs_url"),
          codeFor(col("r.code"), SnomedSystem).as("snomed"),
          col("r.valueBoolean").as("value_bool"),
          codeFor(col("r.valueCodeableConcept"), SnomedSystem).as("value_code"),
          col("r.device.identifier.value").as("device")),
        Seq("id"))
      .filter(col("result_ref") === col("obs_url"))
      .filter(col("snomed").isNotNull) // assert, fhir.py:929
      .filter(col("snomed") =!= "911000124104") // inconclusive, fhir.py:936-937
      .withColumn("present",
        when(col("value_bool").isNotNull, col("value_bool"))
          .when(col("value_code") === "10828004", lit(true))
          .when(col("value_code") === "260385009", lit(false))
          .otherwise(lit(null).cast("boolean"))) // 82334004 / absent
      // Ellume inconclusives are skipped (fhir.py:952-953)
      .filter(!(col("device") === "Ellume" && col("present").isNull))
      .withColumn("identifier",
        concat_ws("/", col("barcode"), col("snomed"), col("device")))

    val targets = pa
      .select(concat(lit(s"$SnomedTerm/"), col("snomed")).as("identifier"))
      .distinct()

    Delta(
      statuses = statuses,
      sites = sites,
      individuals = individuals,
      encounters = encounters,
      sampleUpdates = encSamples.select(
          col("identifier"), col("collection_identifier"),
          col("collection_date"), col("encounter_identifier"), col("note"))
        .unionByName(drCreatedSamples
          .withColumn("collection_date", lit(null).cast("date"))
          .withColumn("encounter_identifier", lit(null).cast("string"))
          .withColumn("note", lit(null).cast("string"))),
      targets = targets,
      presenceAbsence = pa.select(col("id"), col("identifier"), col("barcode"),
        col("snomed"), col("device"), col("present"),
        col("effective_datetime")))
  }
}
