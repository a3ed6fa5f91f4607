package graft.shipping

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.{DistinctOn, RangeBinJoin}

/** The shipping area (SURVEY.md §1.3, §2.4-2.6, §3.3): consumer-facing
  * analytical views as pure DataFrame functions, registered as temp views
  * so both the DataFrame API and `spark.sql("select * from shipping_…")`
  * work — mirroring the reference's schema/deploy/shipping/views.sql.
  */
object Views {

  /** presence_absence_result_v1 (reference shipping/views.sql:17-28):
    * sample ⋈ presence_absence ⋈ target, control targets excluded.
    * `target` is a tiny dim — broadcast; the fact-fact join shuffles on
    * sample_id only.
    */
  def presenceAbsenceResultV1(
      sample: DataFrame, presenceAbsence: DataFrame, target: DataFrame): DataFrame =
    presenceAbsence
      .join(sample.select(col("sample_id"), col("identifier").as("sample")), "sample_id")
      .join(broadcast(target.filter(!col("control"))
        .select(col("target_id"), col("identifier").as("target"))), "target_id")
      .select("sample", "target", "present")

  /** presence_absence_result_v2: + organism lineage (left join) and
    * device from details (reference views@2020-01-14b.sql:104-135 shape).
    */
  def presenceAbsenceResultV2(
      sample: DataFrame, presenceAbsence: DataFrame, target: DataFrame,
      organism: DataFrame): DataFrame =
    presenceAbsence
      .join(sample.select(col("sample_id"), col("identifier").as("sample")), "sample_id")
      .join(broadcast(target.filter(!col("control"))
        .select(col("target_id"), col("identifier").as("target"),
          col("organism_id"))), "target_id")
      .join(broadcast(organism.select(col("organism_id"),
        col("lineage"))), Seq("organism_id"), "left")
      .withColumn("device", jsonScalarField(col("details"), lit("device")))
      .select("sample", "target", "present", "lineage", "device")

  /** primary_encounter_location (reference
    * warehouse/primary-encounter-location.sql:7-14): DISTINCT ON
    * (encounter_id) ordered by relation priority nulls last.
    */
  def primaryEncounterLocation(
      encounterLocation: DataFrame, relations: DataFrame): DataFrame =
    DistinctOn(
      encounterLocation.join(broadcast(relations), Seq("relation"), "left"),
      partitionBy = Seq("encounter_id"),
      orderBy = Seq(col("priority").asc_nulls_last, col("relation")))

  /** The survey-response lateral (reference views@2020-01-14b.sql:73-97):
    * `jsonb_to_record(details->'responses') as (FluShot text[], …)` — one
    * from_json with a typed array schema, fused with the view's junk
    * collapsing (`nullif(nullif(…,'doNotKnow'),'dontKnow')::bool`,
    * `array_distinct`). Returns a struct column so the parse runs once per
    * row (CollapseProject won't inline a non-cheap alias used 4×).
    */
  def surveyResponses(details: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // one Jackson pass: the responses wrapper is part of the schema, so
    // details is parsed once (get_json_object + from_json double-parsed
    // every row and measured ~2× the cost at sf0.1)
    val schema = org.apache.spark.sql.types.DataType.fromDDL(
      "STRUCT<responses: STRUCT<FluShot: ARRAY<STRING>, " +
        "Symptoms: ARRAY<STRING>, Race: ARRAY<STRING>, " +
        "HispanicLatino: ARRAY<STRING>>>")
    val r = from_json(details, schema).getField("responses")
    struct(
      nullif(nullif(try_element_at(r.getField("FluShot"), lit(1)),
        lit("doNotKnow")), lit("dontKnow")).cast("boolean").as("flu_shot"),
      array_distinct(r.getField("Symptoms")).as("symptoms"),
      array_distinct(r.getField("Race")).as("race"),
      nullif(try_element_at(r.getField("HispanicLatino"), lit(1)),
        lit("preferNotToSay")).cast("boolean").as("hispanic_or_latino"))
  }

  /** incidence_model_observation_v2-shape (reference
    * views@2020-01-14b.sql:138-218): encounter star join + ISO-week
    * bucketing + age-bin range joins + JSON detail extraction. When the
    * encounter frame carries a `details` column, the survey-response
    * lateral (views@2020-01-14b.sql:73-97) is fused in, adding flu_shot /
    * symptoms / race / hispanic_or_latino.
    */
  def incidenceModelObservation(
      encounter: DataFrame, individual: DataFrame, site: DataFrame,
      sample: DataFrame, ageBinFine: DataFrame, ageBinCoarse: DataFrame,
      reportingTz: String = "US/Pacific"): DataFrame = {
    val hasResponses = encounter.columns.contains("details")
    val responseCols =
      if (hasResponses)
        Seq("flu_shot", "symptoms", "race", "hispanic_or_latino")
      else Seq.empty
    val withResp =
      if (hasResponses)
        encounter.withColumn("_resp", surveyResponses(col("details")))
          .withColumn("flu_shot", col("_resp.flu_shot"))
          .withColumn("symptoms", col("_resp.symptoms"))
          .withColumn("race", col("_resp.race"))
          .withColumn("hispanic_or_latino", col("_resp.hispanic_or_latino"))
          .drop("_resp", "details")
      else encounter
    val base = withResp
      .join(broadcast(site.select(col("site_id"), col("identifier").as("site"),
        jsonScalarField(col("details"), lit("type")).as("site_type"))), "site_id")
      .join(individual.select(col("individual_id"), col("sex")), "individual_id")
      .join(sample.select(col("encounter_id"), col("identifier").as("sample")),
        Seq("encounter_id"), "left")
      .withColumn("encountered_date", tzDate(col("encountered"), reportingTz))
      .withColumn("encountered_week", isoWeekInTz(col("encountered"), reportingTz))
      .withColumn("age_in_years", ageInYears(col("age_months")))
      .withColumn("age_reporting", cappedReportingAge(col("age_in_years")))
    val withFine = RangeBinJoin(base, "age_months",
      ageBinFine.select(col("lo").as("fine_lo"), col("hi").as("fine_hi"),
        col("label").as("age_range_fine")), "fine_lo", "fine_hi")
    RangeBinJoin(withFine, "age_months",
      ageBinCoarse.select(col("lo").as("coarse_lo"), col("hi").as("coarse_hi"),
        col("label").as("age_range_coarse")), "coarse_lo", "coarse_hi")
      .select((Seq("encounter_id", "site", "site_type", "sex", "sample",
        "encountered_date", "encountered_week", "age_in_years",
        "age_reporting", "age_range_fine", "age_range_coarse") ++
        responseCols).map(col): _*)
  }

  /** Census-tract attachment from the incidence v1/v3 views (reference
    * views@2020-01-14b.sql:58-71, 276-284): residence tract from
    * relations residence|lodging, work tract from workplace, each via
    * encounter_location ⋈ location with `hierarchy->'tract'` (hstore).
    * Left joins — encounters without located relations keep null tracts;
    * multi-location encounters fan out exactly like the reference's
    * subquery join.
    */
  def withCensusTracts(
      df: DataFrame, // has encounter_id
      encounterLocation: DataFrame, // encounter_id, relation, location_id
      location: DataFrame): DataFrame = { // location_id, hierarchy (hstore text)
    val tract = try_element_at(hstoreParse(col("hierarchy")), lit("tract"))
    def tractFor(relations: Seq[String], as: String) =
      encounterLocation.filter(col("relation").isin(relations.map(r => r: Any): _*))
        .join(location, Seq("location_id"))
        .select(col("encounter_id"), tract.as(as))
    df.join(tractFor(Seq("residence", "lodging"), "residence_census_tract"),
        Seq("encounter_id"), "left")
      .join(tractFor(Seq("workplace"), "work_census_tract"),
        Seq("encounter_id"), "left")
  }

  /** observation_with_presence_absence_result (reference
    * views@2020-01-14b.sql:232-241): view-on-view join on sample.
    */
  def observationWithPresenceAbsence(
      observation: DataFrame, paResult: DataFrame): DataFrame =
    observation.join(paResult, Seq("sample"))

  /** Sample row-level security as a view filter (reference RLS policy
    * warehouse/sample/access-role-rls.sql:5-16): a row is visible when
    * access_role is null or among the caller's roles.
    */
  def sampleVisibleTo(sample: DataFrame, roles: Seq[String]): DataFrame =
    sample.filter(col("access_role").isNull ||
      col("access_role").isin(roles.map(r => r: Any): _*))

  /** Register views for SQL access (`shipping_` prefix ≡ schema). */
  def register(spark: SparkSession, name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(s"shipping_$name")
}
