package graft

import graft.sources.{PostgresConfig, HiveConfig, UserCatalog}
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** Per-user credential scoping (reference UserManagers shape): same
  * name, different users, different servers/credentials; no cross-user
  * visibility; loud on a miss; credentials never printed. */
class UserCatalogSpec extends AnyFunSuite with BeforeAndAfterEach {

  override def afterEach(): Unit = UserCatalog.clear()

  test("same database name resolves per user, with that user's credentials") {
    UserCatalog.register("alice", PostgresConfig("warehouse", "pg-a", 5432,
      "sales", Some("alice"), Some("secretA")))
    UserCatalog.register("bob", PostgresConfig("warehouse", "pg-b", 5433,
      "sales", Some("bob"), Some("secretB")))
    val a = UserCatalog.resolve("alice", "warehouse")
    val b = UserCatalog.resolve("bob", "warehouse")
    assert(a.host === "pg-a" && a.username === Some("alice"))
    assert(b.host === "pg-b" && b.username === Some("bob"))
    assert(a.connectionString !== b.connectionString)
  }

  test("no cross-user visibility; resolution is loud, never a fallback") {
    UserCatalog.register("alice", HiveConfig("lake", "hive-a", 10000, "default"))
    assert(UserCatalog.databasesOf("alice") === Seq("lake"))
    assert(UserCatalog.databasesOf("bob").isEmpty)
    val e = intercept[NoSuchElementException](UserCatalog.resolve("bob", "lake"))
    assert(e.getMessage.contains("bob") && e.getMessage.contains("lake"))
  }

  test("display surfaces redact the password") {
    UserCatalog.register("alice", PostgresConfig("warehouse", "pg-a", 5432,
      "sales", Some("alice"), Some("hunter2")))
    val shown = UserCatalog.describe("alice", "warehouse")
    assert(!shown.contains("hunter2"))
    assert(shown.contains("jdbc:postgresql://pg-a:5432/sales"))
  }

  test("re-registration replaces (credential rotation); deregister revokes") {
    UserCatalog.register("alice", PostgresConfig("warehouse", "pg-a", 5432,
      "sales", Some("alice"), Some("old")))
    UserCatalog.register("alice", PostgresConfig("warehouse", "pg-a", 5432,
      "sales", Some("alice"), Some("new")))
    assert(UserCatalog.resolve("alice", "warehouse").password === Some("new"))
    UserCatalog.deregister("alice", "warehouse")
    intercept[NoSuchElementException](UserCatalog.resolve("alice", "warehouse"))
  }

  test("a user-scoped resolution drives a LIVE query end to end (pgwire)") {
    assume(PgLive.available, "no local PostgreSQL server — environmental")
    UserCatalog.register("graft", PostgresConfig("probe", "127.0.0.1",
      PgLive.Port, "postgres", Some("graft"), None))
    val cfg = UserCatalog.resolve("graft", "probe")
    // the resolved config carries everything the wire client needs
    val c = new graft.sources.pgwire.PgWireClient(cfg.host, cfg.port,
      cfg.database, cfg.username.get)
    try {
      val r = c.query("SELECT 41 + 1 AS answer")
      assert(r.rows.map(_.toSeq) === Vector(Seq("42")))
    } finally c.close()
  }
}
