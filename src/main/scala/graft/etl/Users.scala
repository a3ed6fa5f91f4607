package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User / role administration as warehouse tables (reference
  * lib/id3c/cli/command/user.py + lib/id3c/db/__init__.py:104-153).
  * Postgres keeps these in pg_user / pg_group; the Spark-side analogue
  * is a pair of tiny dimension frames:
  *
  *   users:  name, description, password_hash
  *   grants: name, role
  *
  * so the RLS half of the story
  * ([[graft.shipping.Views.sampleVisibleTo]], SURVEY §2.2) can resolve a
  * caller's role set from data the engine owns. Passwords are stored as
  * the salted sha-256 of C14 ([[graft.functions.saltedSha256Str]]'s
  * column twin), never in the clear — the reference delegates storage
  * hashing to Postgres; an analytics engine must do its own.
  *
  * All frames are user-cardinality-sized: every operation is a tiny
  * union / join that broadcast-joins into anything fact-sized.
  */
object Users {

  /** `create user <name>` (db/__init__.py:104-117): append the user row;
    * duplicates are an error, like the DDL.
    */
  def createUser(users: DataFrame, name: String,
      comment: Option[String] = None): DataFrame = {
    require(users.filter(col("name") === name).isEmpty,
      s"user «$name» already exists")
    users.unionByName(users.sparkSession.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(name, comment.orNull, null: String)),
      users.schema))
  }

  /** `grant <role> to <name>` for each role (db/__init__.py:120-135);
    * re-granting an existing role is a no-op, as in Postgres.
    */
  def grantRoles(grants: DataFrame, name: String,
      roles: Seq[String]): DataFrame =
    if (roles.isEmpty) grants
    else {
      import grants.sparkSession.implicits._
      grants.unionByName(roles.map(r => (name, r)).toDF("name", "role"))
        .distinct()
    }

  /** `alter user <name> password ...` (db/__init__.py:138-153): store
    * the salted hash of the supplied password. The reference generates
    * the secret with `secrets.token_urlsafe()`; generation is the
    * caller's concern here (engines don't own entropy), storage is ours.
    */
  def resetPassword(users: DataFrame, name: String,
      password: String, salt: String = "graft"): DataFrame = {
    require(!users.filter(col("name") === name).isEmpty,
      s"user «$name» does not exist")
    users.withColumn("password_hash",
      when(col("name") === name,
        sha2(concat(lit(password), lit(salt)), 256))
        .otherwise(col("password_hash")))
  }

  /** `user ls` (user.py:82-110): one row per user with the sorted role
    * array, system users excluded, ordered by name.
    */
  def listUsers(users: DataFrame, grants: DataFrame,
      systemUsers: Seq[String] = Seq("postgres", "rdsadmin")): DataFrame =
    users
      .filter(!col("name").isin(systemUsers.map(s => s: Any): _*))
      .join(grants, Seq("name"), "left")
      .groupBy("name")
      .agg(first(col("description"), ignoreNulls = true).as("description"),
        coalesce(sort_array(collect_list(col("role"))),
          array().cast("array<string>")).as("roles"))
      .orderBy("name")

  /** The caller's role set, for [[graft.shipping.Views.sampleVisibleTo]]:
    * grants are user-cardinality, so a driver-side collect here is the
    * same "roles of the current session" lookup every RLS check does.
    */
  def rolesOf(grants: DataFrame, name: String): Seq[String] =
    grants.filter(col("name") === name)
      .select("role").collect().map(_.getString(0)).toSeq.sorted
}
