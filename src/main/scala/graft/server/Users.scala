package graft.server

import java.nio.file.{Files, Path}
import java.security.MessageDigest

/** A21 role-based accounts. The reference bootstraps a named user with
  * an encoded password and per-database grants before serving
  * (`ArcadeDBService.java:93-105`, `databases.* = ["admin"]`); the
  * parity here is a `users.json` beside the store holding
  * (name, sha-256 token hash, role), where role `read` may query and
  * role `admin` may also write through `/api/v1/command`. Tokens are
  * never stored in the clear, and comparisons run constant-time
  * (`MessageDigest.isEqual` over fixed-width digests — a straight
  * string compare leaks the matching prefix length). */
final case class ServerUser(name: String, tokenHash: String, role: String) {
  require(role == "read" || role == "admin", s"unknown role: $role")
  def isAdmin: Boolean = role == "admin"
}

object Users {

  def sha256Hex(token: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(token.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def hexDecode(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  /** Constant-time credential check: one digest of the presented
    * token, `MessageDigest.isEqual` against each account. `name`
    * (from HTTP Basic) restricts the match to that account; a bare
    * Bearer token matches any account holding it. */
  def authenticate(users: Seq[ServerUser], name: Option[String],
      token: String): Option[ServerUser] = {
    val digest = MessageDigest.getInstance("SHA-256").digest(token.getBytes("UTF-8"))
    users.filter(u => name.forall(_ == u.name)).find { u =>
      val stored =
        try hexDecode(u.tokenHash)
        catch { case _: NumberFormatException => Array.emptyByteArray }
      MessageDigest.isEqual(stored, digest)
    }
  }

  def save(path: Path, users: Seq[ServerUser]): Unit = {
    def esc(s: String) =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
    val json = users.map(u =>
      s"""{"name":"${esc(u.name)}","tokenHash":"${u.tokenHash}","role":"${u.role}"}""")
      .mkString("[", ",", "]")
    Files.writeString(path, json)
  }

  def load(path: Path): Seq[ServerUser] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    JsonMethods.parse(Files.readString(path)) match {
      case JArray(arr) => arr.map { u =>
        ServerUser((u \ "name").extract[String], (u \ "tokenHash").extract[String],
          (u \ "role").extract[String])
      }
      case other => throw new IllegalArgumentException(s"bad users file: $other")
    }
  }

  /** Load `users.json`, creating it with a fresh-token admin account on
    * first start (the reference's root-user bootstrap). Returns the
    * accounts plus the raw admin token IF one was just generated — the
    * only moment it exists in the clear. */
  def bootstrap(path: Path): (Seq[ServerUser], Option[String]) =
    if (Files.exists(path)) (load(path), None)
    else {
      val token = java.util.UUID.randomUUID().toString.replace("-", "")
      val users = Seq(ServerUser("admin", sha256Hex(token), "admin"))
      save(path, users)
      (users, Some(token))
    }
}
