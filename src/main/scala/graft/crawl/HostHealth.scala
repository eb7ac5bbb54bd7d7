package graft.crawl

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host health classification + enabled-state transition — the "site
  * analysis sweep" (SURVEY.md §3.3) as a single declarative batch query
  * over the host dimension.
  *
  * Status ladder, in the reference's precedence order
  * (/root/reference/Source/WebCrawler.WPF/ViewModels/ManageViewModel.cs:784-828):
  * broken fetch → ErrorBroken; 0 catalog items → ErrorCatalogMissing;
  * any undated item (when the host validates dates) → WarningNoDates;
  * newest published older than `outdateDays` → ErrorOutdate; else Normal.
  * (WarningRedirected has no analog in the snapshot-table model — there
  * are no live redirects to observe.)
  *
  * Enabled transition (DTO/WebsiteDTO.cs:192-212): Normal → enable;
  * Warning* → disable only when the status CHANGED (first transition);
  * Error* → always disable; otherwise keep the current flag.
  */
object HostHealth {

  val Normal = "Normal"
  val WarningNoDates = "WarningNoDates"
  val ErrorBroken = "ErrorBroken"
  val ErrorCatalogMissing = "ErrorCatalogMissing"
  val ErrorOutdate = "ErrorOutdate"

  /** Classify per-host facts into a status column. Input columns:
    * host, home_failed:boolean, catalog_found:int, n_undated:int,
    * newest_published:timestamp (nullable), validate_date:boolean. */
  def classify(facts: DataFrame, asOf: Timestamp,
               outdateDays: Int = 365): DataFrame = {
    val outdated = lit(asOf).cast("timestamp") -
      expr(s"INTERVAL $outdateDays DAYS")
    facts.withColumn("status",
      when(col("home_failed"), ErrorBroken)
        .when(col("catalog_found") === 0, ErrorCatalogMissing)
        .when(col("validate_date") && col("n_undated") > 0, WarningNoDates)
        .when(col("validate_date") && col("newest_published").isNotNull &&
          col("newest_published") < outdated, ErrorOutdate)
        .otherwise(Normal))
  }

  /** F8: pure transition function (WebsiteDTO.cs:192-212). Returns the
    * new enabled flag. */
  def nextEnabled(currentEnabled: Boolean, status: String,
                  prevStatus: String): Boolean =
    if (status == Normal) true
    else if (status.startsWith("Warning"))
      if (status != prevStatus) false else currentEnabled
    else false // Error*

  /** Column form of [[nextEnabled]] for the MERGE-shaped host update. */
  def nextEnabledCol(currentEnabled: org.apache.spark.sql.Column,
                     status: org.apache.spark.sql.Column,
                     prevStatus: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(status === Normal, lit(true))
      .when(status.startsWith("Warning"),
        when(status =!= prevStatus, lit(false)).otherwise(currentEnabled))
      .otherwise(lit(false))

  /** The full analysis sweep over one wave's outputs: joins the wave
    * metrics (catalog_found, home failures) with the frontier's date
    * facts and the host config, classifies, and applies the enabled
    * transition against the previous status. */
  def sweep(metrics: DataFrame, frontier: DataFrame, hosts: DataFrame,
            prevStatus: DataFrame, asOf: Timestamp,
            outdateDays: Int = 365): DataFrame = {
    val dateFacts = frontier.groupBy("host").agg(
      sum(when(col("published").isNull, 1).otherwise(0)).as("n_undated"),
      max(col("published")).as("newest_published"))
    // validate_date comes from the host's RULE when the hosts frame
    // carries one (RuleSpec.validate_date — a host that opts out of
    // date validation must not be classified WarningNoDates/
    // ErrorOutdate and auto-disabled); hosts frames without a rule
    // column (bare dimension inputs) default to validating.
    val vd =
      if (hosts.columns.contains("rule"))
        coalesce(col("rule").getField("validate_date"), lit(true))
      else lit(true)
    val facts = metrics
      .join(dateFacts, Seq("host"), "left")
      .join(hosts.select(col("host"), col("enabled"),
        vd.as("validate_date")), Seq("host"), "left")
      .join(prevStatus, Seq("host"), "left")
      .select(col("host"),
        (col("fetch_failed") > 0 && col("catalog_found") === 0).as("home_failed"),
        col("catalog_found"),
        coalesce(col("n_undated"), lit(0)).as("n_undated"),
        col("newest_published"), col("validate_date"), col("enabled"),
        coalesce(col("prev_status"), lit(Normal)).as("prev_status"))
    classify(facts, asOf, outdateDays)
      .withColumn("next_enabled",
        nextEnabledCol(col("enabled"), col("status"), col("prev_status")))
      .select("host", "status", "prev_status", "enabled", "next_enabled")
  }
}
