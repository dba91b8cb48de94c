package graft.sources

/** Per-user database catalog + credential scoping (reference:
  * DistributedQueryEngine.diff :109-115 — the reference resolves the
  * RDBMS server through `UserManagers(...).getClient(queryContext.user)`,
  * so WHICH server a name denotes, and with WHOSE credentials, is a
  * per-user decision). This was the one structural concept in the
  * reference diff with no graft analogue through r4: `Databases.scala`
  * is the vendor model, this is the multi-tenant resolution layer over
  * it.
  *
  * Semantics, mirrored from the reference's user-manager shape:
  *  - registrations are keyed (user, database-name): two users may bind
  *    the SAME name to different servers or different credentials, and
  *    neither can see or resolve the other's entry;
  *  - resolution is loud: a user asking for an unregistered name gets a
  *    [[NoSuchElementException]] naming user and database, never a
  *    silent fallback to some shared default (credential leakage by
  *    fallback is the classic multi-tenant bug);
  *  - listings and rendered configs REDACT credentials — passwords ride
  *    resolution results only, never display surfaces.
  *
  * In-memory by design, like [[graft.plans.MvCatalog]]: the catalog is
  * session state the control plane populates per request context; a
  * durable multi-tenant store is a deployment concern layered above.
  * Thread-safe (concurrent request contexts register/resolve in
  * parallel).
  */
object UserCatalog {

  final case class Grant(user: String, config: DatabaseConfig)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DatabaseConfig]()

  def register(user: String, config: DatabaseConfig): Unit = {
    require(user.nonEmpty, "user catalog: empty user")
    entries.put((user, config.name), config)
    ()
  }

  /** The config `dbName` denotes FOR `user` — with that user's
    * credentials. Loud on a miss. */
  def resolve(user: String, dbName: String): DatabaseConfig = {
    val c = entries.get((user, dbName))
    if (c == null)
      throw new NoSuchElementException(
        s"user catalog: no database '$dbName' registered for user '$user'")
    c
  }

  /** The names `user` may resolve — only their own registrations. */
  def databasesOf(user: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    entries.keySet().asScala.toSeq.collect { case (u, n) if u == user => n }.sorted
  }

  /** Display form with credentials REDACTED — safe for logs/UIs. */
  def describe(user: String, dbName: String): String = {
    val c = resolve(user, dbName)
    s"${c.name}: ${c.vendor} ${c.connectionString}" +
      c.username.map(u => s" user=$u password=${"*" * 8}").getOrElse("")
  }

  def deregister(user: String, dbName: String): Unit = {
    entries.remove((user, dbName)); ()
  }

  def clear(): Unit = entries.clear()
}
