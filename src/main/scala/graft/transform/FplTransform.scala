package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.quality.Checks
import graft.sources.Sources

/** The reference's 11-table transform (SURVEY.md §3.1; ref:
  * etl/run_transform.py:81-522) as one lazy Spark DAG.
  *
  * Differences from the reference are architectural, not semantic: the 11
  * outputs are projections of one Catalyst-optimized plan instead of 11
  * eagerly-materialized pickles; fixture/team/position joins are
  * broadcast; V3 warnings ride along with the first action via `observe`
  * (run() triggers no job), and V1/V2 validation is the explicit
  * [[validate]] step with the reference's raise-vs-log toggle
  * (etl/run_transform.py:43-46).
  *
  * Scale notes: the only shuffles are the league-table group-sum and the
  * players_full dedup window (partitioned by the PK); everything else is
  * narrow or broadcast. `persist()` on the multiply-consumed fixtures
  * frame mirrors §3.1's advice.
  */
object FplTransform {

  /** P4 — NaN-safe int-string coercion (ref: pandas_integerstr_to_int,
    * etl/transform.py:59-66): null-propagating numeric → decimal-truncated
    * string. NaN/±Inf/out-of-long-range → null (Spark 4 ANSI cast would
    * throw; the reference's NaN path yields null). */
  def intStr(c: Column): Column = {
    val d = c.cast("double")
    when(d.isNotNull && !d.isNaN &&
      d > -9.223372036854775e18 && d < 9.223372036854775e18,
      d.cast("long").cast("string"))
  }

  /** P5 — lenient ISO8601 timestamp parse, null on failure (ref:
    * to_datetime(errors='coerce')). */
  def lenientTs(c: Column): Column =
    try_to_timestamp(trim(regexp_replace(c, "[TZ]", " ")))

  /** Warn listeners registered by [[warnOnMaterialize]] that have not
    * fired yet. A listener self-unregisters when its observed frame first
    * materializes — but a caller that builds plans and never acts on them
    * (or a long-lived session invoking run() repeatedly and discarding
    * outputs) would accumulate listeners and retained warn closures on the
    * shared SparkSession. Such callers should call
    * [[detachWarnListeners]] when discarding a run's outputs. */
  private val pendingWarnListeners = java.util.concurrent.ConcurrentHashMap
    .newKeySet[(org.apache.spark.sql.SparkSession,
      org.apache.spark.sql.util.QueryExecutionListener)]()

  /** Unregister every not-yet-fired warn listener this object attached to
    * `spark`; returns how many were detached. Safe to call any time —
    * fired listeners have already removed themselves. */
  def detachWarnListeners(spark: org.apache.spark.sql.SparkSession): Int = {
    val it = pendingWarnListeners.iterator()
    var n = 0
    while (it.hasNext) {
      val e = it.next()
      if (e._1 eq spark) {
        spark.listenerManager.unregister(e._2)
        it.remove()
        n += 1
      }
    }
    n
  }

  /** V3 warning WITHOUT an eager job: a CollectMetrics (`observe`) node
    * piggy-backs the violation count on whatever action first materializes
    * the frame, and a one-shot listener turns it into `warn`. run(...)
    * stays fully lazy — no Spark job until an output is acted on. The
    * listener is tracked in [[pendingWarnListeners]] until it fires (see
    * the leak note there). */
  private def warnOnMaterialize(df: DataFrame, metric: Column,
      msg: Long => String, warn: String => Unit): DataFrame = {
    val name = s"fpl_v3_${java.util.UUID.randomUUID().toString.take(8)}"
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val session = df.sparkSession
    val mgr = session.listenerManager
    val listener: org.apache.spark.sql.util.QueryExecutionListener =
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.get(name).foreach { row =>
            if (fired.compareAndSet(false, true)) {
              val n = row.getAs[Long]("n")
              if (n > 0) warn(msg(n))
              mgr.unregister(this)
              pendingWarnListeners.remove((session, this))
            }
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
    mgr.register(listener)
    pendingWarnListeners.add((session, listener))
    df.observe(name, coalesce(sum(metric.cast("long")), lit(0L)).as("n"))
  }

  def run(fixturesRaw: DataFrame, mainRaw: DataFrame, playersRaw: DataFrame,
      warn: String => Unit = m => System.err.println(m)): Map[String, DataFrame] = {

    // ---- fixtures (ref :87-129) -------------------------------------
    val fixturesAll = fixturesRaw.select(
      intStr(col("code")).as("fixture_id_long"),
      intStr(col("event")).as("gameweek_id"),
      intStr(col("id")).as("fixture_id"),
      col("finished").as("fixture_finished"),
      col("started").as("fixture_started"),
      col("minutes").as("fixture_minutes"),
      lenientTs(col("kickoff_time")).as("fixture_kickoff_datetime"),
      intStr(col("team_h")).as("home_team_id"),
      intStr(col("team_a")).as("away_team_id"),
      col("team_h_score").as("home_team_score"),
      col("team_a_score").as("away_team_score"),
      col("team_h_difficulty").as("home_team_difficulty"),
      col("team_a_difficulty").as("away_team_difficulty"))

    // V3 — postponed fixtures warning (null gameweek), then keep all rows
    // (the ref warns here and drops only in players_future, :119-129);
    // emitted lazily on first materialization, no job at build time.
    // observe sits ABOVE persist: metrics inside a cached subtree would be
    // hidden behind InMemoryTableScan and never reach the listener.
    val fixtures = warnOnMaterialize(fixturesAll.persist(),
      col("gameweek_id").isNull,
      n => s"[fpl] $n fixtures with null gameweek (postponed)", warn)

    // ---- gameweeks / teams / positions / players_summary (ref :135-240)
    val gameweeks = Sources.explodeChild(
      mainRaw.select(lit(1).as("__k"), col("events")), "__k", "events")
      .drop("__k")
      .select(
        intStr(col("id")).as("gameweek_id"),
        col("name").as("gameweek_name"),
        lenientTs(col("deadline_time")).as("gameweek_deadline"),
        col("finished").as("gameweek_finished"),
        col("is_current").as("gameweek_current"),
        col("is_next").as("gameweek_next"),
        col("is_previous").as("gameweek_previous"),
        col("data_checked"),
        col("deadline_time_epoch"),
        col("average_entry_score"),
        col("highest_score"),
        intStr(col("highest_scoring_entry")).as("highest_scoring_entry"),
        intStr(col("most_selected")).as("most_selected_player_id"),
        intStr(col("most_transferred_in")).as("most_transferred_in_player_id"),
        intStr(col("top_element")).as("top_player_id"),
        intStr(col("most_captained")).as("most_captained_player_id"),
        intStr(col("most_vice_captained")).as("most_vice_captained_player_id"),
        col("transfers_made"))

    val teams = Sources.explodeChild(
      mainRaw.select(lit(1).as("__k"), col("teams")), "__k", "teams")
      .drop("__k")
      .select(
        intStr(col("id")).as("team_id"),
        intStr(col("code")).as("team_code"),
        col("name").as("team_name"),
        col("short_name").as("team_name_short"),
        col("strength").as("team_strength"),
        col("strength_overall_home"),
        col("strength_overall_away"),
        col("strength_attack_home"),
        col("strength_attack_away"),
        col("strength_defence_home"),
        col("strength_defence_away"))

    val positions = Sources.explodeChild(
      mainRaw.select(lit(1).as("__k"), col("element_types")), "__k", "element_types")
      .drop("__k")
      .select(
        intStr(col("id")).as("position_id"),
        col("singular_name").as("position_name"),
        col("singular_name_short").as("position_name_short"),
        col("squad_select"),
        col("squad_min_play"),
        col("squad_max_play"))

    val stats = (FplSchemas.playerStats ++ FplSchemas.playerStatsDouble).map(col)
    val playersSummary = Sources.explodeChild(
      mainRaw.select(lit(1).as("__k"), col("elements")), "__k", "elements")
      .drop("__k")
      .select(Seq(
        intStr(col("id")).as("player_id"),
        intStr(col("code")).as("player_code"),
        intStr(col("element_type")).as("position_id"),
        intStr(col("team")).as("team_id"),
        intStr(col("team_code")).as("team_code"),
        concat_ws(" ", col("first_name"), col("second_name")).as("player_name"),
        col("news"),
        lenientTs(col("news_added")).as("news_added"),
        col("now_cost"),
        col("event_points"),
        col("selected_by_percent"),
        col("chance_of_playing_next_round"),
        col("chance_of_playing_this_round"),
        col("cost_change_event"),
        col("cost_change_event_fall"),
        col("cost_change_start"),
        col("cost_change_start_fall"),
        col("ep_next"),
        col("ep_this"),
        col("in_dreamteam"),
        col("dreamteam_count"),
        col("photo"),
        col("points_per_game"),
        col("special"),
        col("status"),
        col("transfers_in"),
        col("transfers_out"),
        col("transfers_in_event"),
        col("transfers_out_event"),
        col("value_form"),
        col("value_season"),
        col("form"),
        col("ict_index")) ++ stats: _*)

    // ---- per-player stacked tables (S4; ref :246-323) ----------------
    val prevSeasons = Sources.explodeChild(playersRaw, "player_id", "history_past", outer = false)
      .select(Seq(
        intStr(col("player_id")).as("player_id"),
        intStr(col("element_code")).as("player_code"),
        col("season_name"),
        col("start_cost"), col("end_cost")) ++ stats: _*)

    val fixSlim = fixtures.select(
      col("fixture_id"), col("gameweek_id").as("fixture_gameweek_id"),
      col("fixture_kickoff_datetime"), col("fixture_finished"))

    val playersPast = Sources.explodeChild(playersRaw, "player_id", "history", outer = false)
      .select(Seq(
        intStr(col("player_id")).as("player_id"),
        intStr(col("fixture")).as("fixture_id"),
        intStr(col("round")).as("gameweek_id"),
        col("was_home").as("fixture_home"),
        lenientTs(col("kickoff_time")).as("kickoff"),
        col("value"), col("selected"), col("transfers_balance"),
        col("transfers_in"), col("transfers_out")) ++ stats: _*)
      .join(broadcast(fixSlim), Seq("fixture_id"), "inner") // J1

    val playersFutureRaw = Sources.explodeChild(playersRaw, "player_id", "fixtures", outer = false)
      .select(
        intStr(col("player_id")).as("player_id"),
        intStr(col("code")).as("fixture_id_long"),
        intStr(col("event")).as("gameweek_id"),
        col("is_home").as("fixture_home"),
        col("finished").as("fixture_finished"),
        col("difficulty"),
        lenientTs(col("kickoff_time")).as("kickoff"))
    // F1 — drop null-gameweek (postponed) rows, with lazy count logging
    // (the observe node sits above the pre-filter frame, so the dropped
    // count rides along with the first action on players_future)
    val fixByLong = fixtures.select(
      col("fixture_id_long"), col("fixture_id"))
    val playersFuture = warnOnMaterialize(playersFutureRaw,
      col("gameweek_id").isNull,
      n => s"[fpl] dropping $n future rows with null gameweek", warn)
      .filter(col("gameweek_id").isNotNull)
      .join(broadcast(fixByLong), Seq("fixture_id_long"), "inner") // J2

    // ---- players_full (O5 + F2 + J3; ref :353-371) -------------------
    val unioned = playersPast
      .unionByName(playersFuture, allowMissingColumns = true)
    val pkW = Window.partitionBy(col("player_id"), col("gameweek_id"), col("fixture_id"))
    val playersFull = unioned
      .withColumn("__cnt", count(lit(1)).over(pkW))
      .filter(!(col("__cnt") > 1 && col("total_points").isNull)) // F2: past beats future
      .drop("__cnt")
      .join(broadcast(playersSummary.select(col("player_id"), col("position_id"))),
        Seq("player_id"), "left") // J3

    // ---- team_results + league_table (ref :386-446) ------------------
    val played = fixtures.filter(col("fixture_finished") === true)
    val results = played.select(
      col("home_team_id").cast("long").as("home_id"),
      col("away_team_id").cast("long").as("away_id"),
      col("home_team_score").as("home_score"),
      col("away_team_score").as("away_score"),
      lit(true).as("played"))
    val teamResults = LeagueTable.fromResults(results)
      .withColumn("team_id", col("team_id").cast("string"))
      .join(broadcast(teams.select(col("team_id"), col("team_name"))),
        Seq("team_id"), "left") // J4
    val leagueTable = teamResults
      .select(col("table_position"), col("team_id"), col("team_name"),
        col("played"), col("won"), col("drawn"), col("lost"),
        col("goals_scored"), col("goals_conceded"),
        col("goal_difference"), col("points"))

    val out = Map(
      "fixtures" -> fixtures,
      "gameweeks" -> gameweeks,
      "teams" -> teams,
      "positions" -> positions,
      "players_summary" -> playersSummary,
      "players_prev_seasons" -> prevSeasons,
      "players_past" -> playersPast,
      "players_future" -> playersFuture,
      "players_full" -> playersFull,
      "team_results" -> teamResults,
      "league_table" -> leagueTable)

    out
  }

  /** PK contract per output table (ref DDL: etl/load.py:112-472). */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "fixtures" -> Seq("fixture_id"),
    "gameweeks" -> Seq("gameweek_id"),
    "teams" -> Seq("team_id"),
    "positions" -> Seq("position_id"),
    "players_summary" -> Seq("player_id"),
    "players_prev_seasons" -> Seq("player_id", "season_name"),
    "players_past" -> Seq("player_id", "fixture_id"),
    "players_future" -> Seq("player_id", "fixture_id"),
    "players_full" -> Seq("player_id", "gameweek_id", "fixture_id"),
    "team_results" -> Seq("team_id"),
    "league_table" -> Seq("team_id"))

  /** V1/V2 validation layer (ref :462-506) as an EXPLICIT post-hoc step in
    * the quality layer — `run(...)` itself stays lazy (plan construction
    * triggers no jobs); callers validate once before publishing, exactly
    * where the reference validates before load. */
  def validate(tables: Map[String, DataFrame], raiseErrors: Boolean = true,
      warn: String => Unit = m => System.err.println(m)): Unit =
    primaryKeys.foreach { case (name, pk) =>
      Checks.enforce(s"$name unique PK ${pk.mkString(",")}",
        Checks.isUniqueKey(tables(name), pk), raiseErrors, warn)
      Checks.enforce(s"$name non-null PK ${pk.mkString(",")}",
        Checks.hasNoNullKeys(tables(name), pk), raiseErrors, warn)
    }
}
