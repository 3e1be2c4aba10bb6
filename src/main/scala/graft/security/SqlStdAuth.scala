package graft.security

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong, AtomicReference}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SQL-standard-based authorization — the reference's SQLStdAuth plugin
  * (`ql/security/authorization/plugin/sqlstd/SQLStdHiveAccessController.java`,
  * `SQLStdHiveAuthorizationValidator.java`) re-expressed as a session
  * security catalog plus an enforcement hook the SQL front end
  * ([[graft.Engine.sql]]) consults before executing a statement.
  *
  * Semantics mirrored from the reference:
  *  - Privilege types are exactly SELECT / INSERT / UPDATE / DELETE, with
  *    ALL expanding to the four (`SQLPrivilegeType.java:26` — "ALL privilege
  *    is expanded to these").
  *  - Statement→required-privilege map follows `Operation2Privilege.java:304`:
  *    inputs need SELECT, INSERT outputs need INSERT, INSERT OVERWRITE
  *    outputs need INSERT + DELETE, DELETE needs DELETE, UPDATE needs
  *    UPDATE; MERGE (one statement that can insert/update/delete) needs all
  *    three on the target plus SELECT on its source.
  *  - The table OWNER holds every privilege with grant option implicitly
  *    (`SQLPrivTypeGrant.java:32` OWNER_PRIV, "OBJECT OWNERSHIP").
  *  - `admin` is a built-in role whose members bypass checks and administer
  *    roles; CREATE/DROP ROLE is admin-only
  *    (`SQLStdHiveAccessController.java:252-257`), and ALL/DEFAULT/NONE are
  *    reserved role names (`:76`). `public` is a built-in role every
  *    principal belongs to implicitly.
  *  - GRANT requires the grantor to hold the granted privilege WITH GRANT
  *    OPTION on the object (or ownership / admin) —
  *    `GrantPrivAuthUtils.checkRequiredPrivileges`.
  *  - REVOKE matches only grants made by the revoking user
  *    (`RevokePrivAuthUtils.java` — the reference scans for grants whose
  *    grantor is the current user); admin revokes anyone's. `REVOKE GRANT
  *    OPTION FOR` downgrades the option without dropping the privilege.
  *  - Role grants are principal→role edges (roles can be granted to roles;
  *    membership is the transitive closure), optionally WITH ADMIN OPTION,
  *    which lets the member administer that role's membership.
  *  - `SET ROLE r` requires membership; `SET ROLE ALL` / `NONE` always
  *    work. Enforcement evaluates the user plus the ACTIVE role set.
  *  - The denial message mirrors `SQLAuthorizationUtils.java:473`:
  *    "Permission denied: Principal [name=…, type=USER] does not have
  *    following privileges for operation …".
  *
  * Deliberate narrowings (documented, single-database engine): objects are
  * table-level only (no column/partition grants), `grant_time` is a
  * deterministic grant ordinal rather than wall-clock (the KV-handler
  * timestamp discipline — keeps SHOW GRANT output oracle-replayable), and
  * only tables registered in this catalog are securable — an unregistered
  * relation is out of scope exactly like a path outside the metastore.
  * Enforcement is off until [[enable]] — the reference likewise activates
  * the validator only when the authorizer factory is configured.
  */
object SqlStdAuth {

  val PrivTypes: Seq[String] = Seq("SELECT", "INSERT", "UPDATE", "DELETE")
  private val ReservedRoles = Set("ALL", "DEFAULT", "NONE")
  private val BuiltinRoles = Set("public", "admin")

  final case class Grant(table: String, principalType: String, principal: String,
      priv: String, grantOption: Boolean, grantor: String, ord: Long)

  // ---------------------------------------------------------------- state
  // Process-wide like TxnSql.tables — the metastore-catalog analog.

  private val enabled = new AtomicBoolean(false)
  private val currentUserRef = new AtomicReference[String]("admin")
  /** SET ROLE state: None = ALL (every granted role active). */
  private val activeRolesRef = new AtomicReference[Option[Set[String]]](None)
  private val createdRoles = ConcurrentHashMap.newKeySet[String]()
  /** (principalName lowercase, roleName lowercase) -> adminOption */
  private val roleGrants = new ConcurrentHashMap[(String, String), Boolean]()
  /** table lowercase -> owner */
  private val owners = new ConcurrentHashMap[String, String]()
  private val grants = new java.util.concurrent.CopyOnWriteArrayList[Grant]()
  private val ordCounter = new AtomicLong(0L)

  /** Reset + enable enforcement; `user` becomes the authenticated user and
    * a member of `admin` (the bootstrap the reference gets from
    * `hive.users.in.admin.role`). */
  def enable(adminUser: String = "admin"): Unit = {
    reset()
    roleGrants.put((adminUser.toLowerCase, "admin"), true)
    currentUserRef.set(adminUser)
    enabled.set(true)
  }

  def disable(): Unit = { enabled.set(false); reset() }

  def isEnabled: Boolean = enabled.get

  private def reset(): Unit = {
    createdRoles.clear(); roleGrants.clear(); owners.clear(); grants.clear()
    ordCounter.set(0L); activeRolesRef.set(None); currentUserRef.set("admin")
  }

  /** Authenticator analog — HS2 sets this from the connection; a library
    * caller sets it explicitly. Switching user resets SET ROLE to ALL
    * (a new session in the reference). */
  def setUser(user: String): Unit = {
    currentUserRef.set(user)
    activeRolesRef.set(None)
  }

  def currentUser: String = currentUserRef.get

  /** Make `table` a securable object owned by `owner` (the CREATE TABLE
    * path — ownership carries OWNER_PRIV). */
  def registerTable(table: String, owner: String): Unit =
    owners.put(table.toLowerCase, owner)

  def unregisterTable(table: String): Unit = owners.remove(table.toLowerCase)

  // ------------------------------------------------------------ membership

  /** Transitive role closure of a principal, always including `public`. */
  private def rolesOf(user: String): Set[String] = {
    val direct = roleGrants.keySet.asScala.toSet
    var out = Set("public")
    var frontier = Set(user.toLowerCase)
    var grown = true
    while (grown) {
      val next = direct.collect {
        case (p, r) if frontier.contains(p) && !out.contains(r) => r
      }
      grown = next.nonEmpty
      out ++= next
      frontier = next
    }
    out
  }

  private def isAdmin(user: String): Boolean = rolesOf(user).contains("admin")

  /** Roles enforcement sees: SET ROLE selection intersected with actual
    * membership (public always active). */
  private def activeRoles(user: String): Set[String] = {
    val all = rolesOf(user)
    activeRolesRef.get match {
      case None => all
      case Some(sel) => (all & sel) + "public"
    }
  }

  private def hasAdminOption(user: String, role: String): Boolean = {
    val rl = role.toLowerCase
    if (roleGrants.asScala.exists { case ((p, r), adm) =>
        p == user.toLowerCase && r == rl && adm }) true
    else // admin option can arrive through a role the user belongs to
      rolesOf(user).exists(via => roleGrants.asScala.exists { case ((p, r), adm) =>
        p == via && r == rl && adm })
  }

  // ----------------------------------------------------------- privileges

  private def fail(msg: String): Nothing =
    throw new SecurityException(msg)

  private def denied(user: String, op: String, privs: Seq[String], table: String): Nothing =
    fail(s"Permission denied: Principal [name=$user, type=USER] does not have " +
      s"following privileges for operation $op " +
      s"[[${privs.mkString(", ")}] on Object [type=TABLE_OR_VIEW, name=$table]]")

  /** Does `user` (with active roles) hold `priv` on `table`?
    * Returns (held, heldWithGrantOption). Owner ⇒ (true, true). */
  private def holds(user: String, table: String, priv: String): (Boolean, Boolean) = {
    val t = table.toLowerCase
    if (isAdmin(user) || Option(owners.get(t)).exists(_.equalsIgnoreCase(user)))
      return (true, true)
    val principals = ("USER", user.toLowerCase) +:
      activeRoles(user).toSeq.map(r => ("ROLE", r))
    val mine = grants.asScala.filter(g => g.table == t && g.priv == priv &&
      principals.contains((g.principalType, g.principal.toLowerCase)))
    (mine.nonEmpty, mine.exists(_.grantOption))
  }

  /** Enforcement entry: require each (priv, table); the securable set is
    * the registered catalog — unregistered relations pass. */
  def require(op: String, needs: Seq[(String, String)]): Unit = {
    if (!enabled.get) return
    val user = currentUser
    needs.foreach { case (priv, table) =>
      if (owners.containsKey(table.toLowerCase) && !holds(user, table, priv)._1)
        denied(user, op, Seq(priv), table)
    }
  }

  // ----------------------------------------------------------- statements

  private val CreateRole = "(?is)^CREATE\\s+ROLE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
  private val DropRole = "(?is)^DROP\\s+ROLE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
  private val GrantRole =
    ("(?is)^GRANT\\s+ROLE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+TO\\s+(USER|ROLE)\\s+" +
      "([A-Za-z_][A-Za-z0-9_]*)(\\s+WITH\\s+ADMIN\\s+OPTION)?\\s*$").r
  private val RevokeRole =
    "(?is)^REVOKE\\s+ROLE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+FROM\\s+(USER|ROLE)\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
  private val GrantPriv =
    ("(?is)^GRANT\\s+([A-Za-z,\\s]+?)\\s+ON\\s+(?:TABLE\\s+)?([A-Za-z_][A-Za-z0-9_]*)\\s+TO\\s+" +
      "(USER|ROLE)\\s+([A-Za-z_][A-Za-z0-9_]*)(\\s+WITH\\s+GRANT\\s+OPTION)?\\s*$").r
  private val RevokePriv =
    ("(?is)^REVOKE\\s+(GRANT\\s+OPTION\\s+FOR\\s+)?([A-Za-z,\\s]+?)\\s+ON\\s+(?:TABLE\\s+)?" +
      "([A-Za-z_][A-Za-z0-9_]*)\\s+FROM\\s+(USER|ROLE)\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$").r
  private val SetRole = "(?is)^SET\\s+ROLE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
  private val ShowGrantOn =
    ("(?is)^SHOW\\s+GRANT\\s*(?:(USER|ROLE)\\s+([A-Za-z_][A-Za-z0-9_]*))?" +
      "(?:\\s+ON\\s+(?:TABLE\\s+)?([A-Za-z_][A-Za-z0-9_]*))?\\s*$").r
  private val ShowRoleGrant =
    "(?is)^SHOW\\s+ROLE\\s+GRANT\\s+(USER|ROLE)\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r

  def handles(sqlText: String): Boolean = {
    val s = sqlText.trim
    val up = s.toUpperCase
    up.startsWith("CREATE ROLE") || up.startsWith("DROP ROLE") ||
      up.startsWith("GRANT ") || up.startsWith("REVOKE ") ||
      up.startsWith("SET ROLE") || up.startsWith("SHOW ROLES") ||
      up.startsWith("SHOW CURRENT ROLES") || up.startsWith("SHOW ROLE GRANT") ||
      up.startsWith("SHOW GRANT")
  }

  def returnsRows(sqlText: String): Boolean = {
    val up = sqlText.trim.toUpperCase
    up.startsWith("SHOW")
  }

  private def expandPrivs(spec: String): Seq[String] = {
    val ps = spec.split(",").map(_.trim.toUpperCase).filter(_.nonEmpty).toSeq
    if (ps == Seq("ALL")) PrivTypes // SQLPrivilegeType.java:25 — ALL expands
    else {
      ps.foreach(p => if (!PrivTypes.contains(p))
        fail(s"Unsupported privilege type $p")) // SQLPrivilegeType.getRequirePrivilege
      ps.distinct
    }
  }

  /** Execute a non-row statement (grants, roles, SET ROLE). */
  def exec(sqlText: String): Unit = sqlText.trim match {
    case CreateRole(r) =>
      val user = currentUser
      if (!isAdmin(user)) fail(s"Current user : $user is not allowed to add roles. " +
        "User has to belong to ADMIN role and have it as current role, for this action.")
      val rl = r.toLowerCase
      if (ReservedRoles.contains(r.toUpperCase) || BuiltinRoles.contains(rl))
        fail(s"Role name cannot be one of the reserved roles: $r")
      if (!createdRoles.add(rl)) fail(s"Role $r already exists")
    case DropRole(r) =>
      val user = currentUser
      if (!isAdmin(user)) fail(s"Current user : $user is not allowed to drop roles. " +
        "User has to belong to ADMIN role and have it as current role, for this action.")
      val rl = r.toLowerCase
      if (BuiltinRoles.contains(rl)) fail(s"Built-in role $r cannot be dropped")
      if (!createdRoles.remove(rl)) fail(s"Role $r does not exist")
      roleGrants.keySet.asScala.filter(_._2 == rl).foreach(roleGrants.remove)
    case GrantRole(role, _, principal, adminOpt) =>
      val user = currentUser
      val rl = role.toLowerCase
      if (!createdRoles.contains(rl) && !BuiltinRoles.contains(rl))
        fail(s"Role $role does not exist")
      if (!isAdmin(user) && !hasAdminOption(user, rl))
        fail(s"Current user : $user is not allowed to grant role $role " +
          "(needs ADMIN role or the role WITH ADMIN OPTION)")
      roleGrants.put((principal.toLowerCase, rl), adminOpt != null)
    case RevokeRole(role, _, principal) =>
      val user = currentUser
      val rl = role.toLowerCase
      if (!isAdmin(user) && !hasAdminOption(user, rl))
        fail(s"Current user : $user is not allowed to revoke role $role")
      // the map's value type is primitive Boolean, so a missing key
      // unboxes null → false and a `remove(...) == null` test can never
      // fire — presence must be tested explicitly (Hive's
      // SQLStdHiveAccessController errors on revoking a never-made grant)
      if (!roleGrants.containsKey((principal.toLowerCase, rl)))
        fail(s"Principal $principal does not have role $role")
      roleGrants.remove((principal.toLowerCase, rl))
    case GrantPriv(privSpec, table, ptype, principal, grantOpt) =>
      val user = currentUser
      val t = table.toLowerCase
      if (!owners.containsKey(t)) fail(s"Table $table is not a securable object")
      expandPrivs(privSpec).foreach { p =>
        // GrantPrivAuthUtils: grantor must hold the privilege WITH GRANT
        // OPTION (ownership and admin imply it)
        if (!holds(user, t, p)._2)
          denied(user, "GRANT_PRIVILEGE", Seq(s"$p with grant"), table)
        val pt = ptype.toUpperCase
        if (pt == "ROLE" && !createdRoles.contains(principal.toLowerCase) &&
          !BuiltinRoles.contains(principal.toLowerCase))
          fail(s"Role $principal does not exist")
        // re-grant replaces (grantOption may upgrade), like the metastore
        grants.removeIf(g => g.table == t && g.priv == p &&
          g.principalType == pt && g.principal.equalsIgnoreCase(principal))
        grants.add(Grant(t, pt, principal.toLowerCase, p, grantOpt != null,
          user.toLowerCase, ordCounter.incrementAndGet()))
      }
    case RevokePriv(optOnly, privSpec, table, ptype, principal) =>
      val user = currentUser
      val t = table.toLowerCase
      expandPrivs(privSpec).foreach { p =>
        val matching = grants.asScala.filter(g => g.table == t && g.priv == p &&
          g.principalType == ptype.toUpperCase &&
          g.principal.equalsIgnoreCase(principal) &&
          // RevokePrivAuthUtils: non-admin revokes only its own grants
          (isAdmin(user) || g.grantor.equalsIgnoreCase(user)))
        if (matching.isEmpty)
          fail(s"Cannot find privilege $p for [name=$principal, type=${ptype.toUpperCase}] " +
            s"on $table granted by $user")
        matching.foreach { g =>
          grants.remove(g)
          if (optOnly != null) grants.add(g.copy(grantOption = false))
        }
      }
    case SetRole(r) =>
      val rl = r.toLowerCase
      if (rl == "all") activeRolesRef.set(None)
      else if (rl == "none") activeRolesRef.set(Some(Set.empty))
      else {
        if (!rolesOf(currentUser).contains(rl))
          fail(s"${currentUser} doesn't belong to role $r")
        activeRolesRef.set(Some(Set(rl)))
      }
    case other => fail(s"Unrecognized authorization statement: $other")
  }

  private val grantSchema = StructType(Seq(
    StructField("tbl", StringType), StructField("principal_name", StringType),
    StructField("principal_type", StringType), StructField("privilege", StringType),
    StructField("grant_option", BooleanType), StructField("grant_time", LongType),
    StructField("grantor", StringType)))

  /** SHOW … forms as DataFrames (Hive renders these as result rows too —
    * `SHOW GRANT` column set minus database/partition/column, which are
    * single-valued here). Ordering is deterministic: grant ordinal. */
  def query(spark: SparkSession, sqlText: String): DataFrame = {
    val s = sqlText.trim
    val up = s.toUpperCase
    if (up.startsWith("SHOW CURRENT ROLES")) {
      rolesDf(spark, activeRoles(currentUser).toSeq.sorted)
    } else if (up.startsWith("SHOW ROLES")) {
      rolesDf(spark,
        (BuiltinRoles ++ createdRoles.asScala).toSeq.sorted)
    } else s match {
      case ShowRoleGrant(_, principal) =>
        rolesDf(spark, (rolesOf(principal)).toSeq.sorted)
      case ShowGrantOn(ptype, principal, table) =>
        val rows = grants.asScala.toSeq
          .filter(g => table == null || g.table.equalsIgnoreCase(table))
          .filter(g => principal == null ||
            (g.principalType == ptype.toUpperCase && g.principal.equalsIgnoreCase(principal)))
          .sortBy(_.ord)
          .map(g => Row(g.table, g.principal, g.principalType, g.priv,
            g.grantOption, g.ord, g.grantor))
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), grantSchema)
      case other => fail(s"Unrecognized SHOW statement: $other")
    }
  }

  private def rolesDf(spark: SparkSession, roles: Seq[String]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(roles.map(Row(_)), 1),
      StructType(Seq(StructField("role", StringType))))
}
