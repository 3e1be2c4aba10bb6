package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.security.SqlStdAuth

/** SQL-standard authorization queries — the reference's SQLStdAuth plugin
  * surface (`ql/security/authorization/plugin/sqlstd/`) driven end-to-end
  * through the SQL front end: role DDL, privilege grants with grant-option
  * discipline, enforcement denials, and the SHOW GRANT ledger. Grant times
  * are deterministic ordinals (the KV-handler timestamp discipline), so the
  * ledger replays closed-form; the PROBE rows carry enforcement-gated
  * counts the oracle recomputes from the data. */
object AuthQ {

  val all: Seq[Qd] = Seq(

    // Scenario: owner grants to a role and to users (multi-priv + grant
    // option), a grantee re-grants under its option, the owner downgrades
    // one option in place (REVOKE GRANT OPTION FOR keeps the privilege and
    // its ordinal). Result = the full SHOW GRANT ledger plus two PROBE rows
    // whose grant_time column carries the row count each reader could
    // actually read under enforcement — denials for the ungranted user and
    // for an un-privileged INSERT are require()d in place.
    Qd("q343_sql_std_auth",
      """SELECT * FROM (
        |  SELECT 'customer' AS tbl, 'readers' AS principal_name,
        |    'ROLE' AS principal_type, 'SELECT' AS privilege,
        |    false AS grant_option, CAST(1 AS BIGINT) AS grant_time,
        |    'owen' AS grantor
        |  UNION ALL SELECT 'orders', 'carol', 'USER', 'SELECT', true, 2, 'owen'
        |  UNION ALL SELECT 'orders', 'carol', 'USER', 'INSERT', false, 3, 'owen'
        |  UNION ALL SELECT 'orders', 'bob', 'USER', 'SELECT', false, 4, 'carol'
        |  UNION ALL SELECT 'customer', 'bob', 'PROBE', 'SELECT_COUNT', false,
        |    (SELECT count(*) FROM customer), ''
        |  UNION ALL SELECT 'orders', 'carol', 'PROBE', 'SELECT_COUNT', false,
        |    (SELECT count(*) FROM orders), ''
        |) ORDER BY grant_time, tbl""") { (s, dir) =>
      Engine.registerAll(s, dir)
      def sql(q: String): DataFrame = Engine.sql(s, dir, q)
      try {
        SqlStdAuth.enable(adminUser = "alice")
        SqlStdAuth.registerTable("customer", owner = "owen")
        SqlStdAuth.registerTable("orders", owner = "owen")
        sql("CREATE ROLE readers")
        sql("GRANT ROLE readers TO USER bob")
        SqlStdAuth.setUser("owen")
        sql("GRANT SELECT ON customer TO ROLE readers")
        sql("GRANT SELECT, INSERT ON orders TO USER carol WITH GRANT OPTION")
        SqlStdAuth.setUser("carol")
        sql("GRANT SELECT ON orders TO USER bob") // re-grant under the option
        SqlStdAuth.setUser("owen")
        sql("REVOKE GRANT OPTION FOR INSERT ON orders FROM USER carol")
        // enforcement probes: dave holds nothing — both denials must carry
        // the reference's message shape; carol cannot re-grant INSERT after
        // the downgrade; an un-privileged INSERT denies before execution
        SqlStdAuth.setUser("dave")
        val d1 = scala.util.Try(sql("SELECT count(*) FROM customer"))
        require(d1.failed.toOption.exists(_.getMessage.contains(
          "Permission denied: Principal [name=dave, type=USER]")),
          "ungranted SELECT must deny with the SQLAuthorizationUtils shape")
        SqlStdAuth.setUser("carol")
        require(scala.util.Try(sql("GRANT INSERT ON orders TO USER dave")).isFailure,
          "re-granting after REVOKE GRANT OPTION FOR must deny")
        require(scala.util.Try(sql(
          "INSERT INTO customer SELECT * FROM customer LIMIT 1")).failed
          .toOption.exists(_.getMessage.contains("[[INSERT] on Object")),
          "INSERT without the INSERT privilege must deny")
        // allowed reads, counted under enforcement
        SqlStdAuth.setUser("bob")
        val bobCust = sql("SELECT count(*) AS c FROM customer").collect()(0).getLong(0)
        SqlStdAuth.setUser("carol")
        val carolOrd = sql("SELECT count(*) AS c FROM orders").collect()(0).getLong(0)
        SqlStdAuth.setUser("alice")
        val ledger = sql("SHOW GRANT")
        val probes = Seq(
          ("customer", "bob", "PROBE", "SELECT_COUNT", false, bobCust, ""),
          ("orders", "carol", "PROBE", "SELECT_COUNT", false, carolOrd, ""))
        val probeDf = s.createDataFrame(probes).toDF(
          "tbl", "principal_name", "principal_type", "privilege",
          "grant_option", "grant_time", "grantor")
        ledger.unionAll(probeDf).orderBy("grant_time", "tbl")
      } finally SqlStdAuth.disable() // never leak enforcement into later queries
    })
}
