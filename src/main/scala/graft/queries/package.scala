package graft

/** Shared oracle-SQL building blocks for the query modules. */
package object queries {
  /** Oracle-side prefix normalizing events.ts from ns to µs so both
    * engines see identical timestamps (SURVEY §2.5.3): DuckDB's
    * CAST(ts AS TIMESTAMP) truncates ns→µs exactly like
    * `graft.Tables.events`. Single definition — the recipe must never
    * diverge between modules.
    */
  val EV: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
      |                  event_type, value, props FROM events)
      |""".stripMargin
}
